from .adapter import (
    map_pdf_to_opacity,
    posed_gaussian_adapter,
    unified_gaussian_adapter,
)
from .croco import CrocoEncBackbone, CrocoVitEncoder, MultiViewCrocoBackbone, TokenStylizer
from .decoder import DecoderOutput, render_gaussians, render_orthographic
from .distiller import Dust3RTeacher
from .dpt import DPTGSHead, DPTGSSHHead, DPTPts3dHead, LinearGSHead, LinearPts3dHead
from .encoder import Styl3rEncoder
from .registry import get_backbone, get_decoder, get_distiller, get_encoder, get_head
from .styl3r import Batch, Styl3rModel, normalize_images
from .vit import Attention, Block, CrossAttention, DecoderBlock, Mlp, PatchEmbed

__all__ = [
    "map_pdf_to_opacity",
    "posed_gaussian_adapter",
    "unified_gaussian_adapter",
    "CrocoEncBackbone",
    "CrocoVitEncoder",
    "MultiViewCrocoBackbone",
    "TokenStylizer",
    "DecoderOutput",
    "render_gaussians",
    "render_orthographic",
    "Dust3RTeacher",
    "DPTGSHead",
    "DPTGSSHHead",
    "DPTPts3dHead",
    "LinearGSHead",
    "LinearPts3dHead",
    "Styl3rEncoder",
    "get_backbone",
    "get_decoder",
    "get_distiller",
    "get_encoder",
    "get_head",
    "Batch",
    "Styl3rModel",
    "normalize_images",
    "Attention",
    "Block",
    "CrossAttention",
    "DecoderBlock",
    "Mlp",
    "PatchEmbed",
]
