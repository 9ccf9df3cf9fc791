from .vit import Attention, Block, CrossAttention, DecoderBlock, Mlp, PatchEmbed

__all__ = [
    "Attention",
    "Block",
    "CrossAttention",
    "DecoderBlock",
    "Mlp",
    "PatchEmbed",
]
