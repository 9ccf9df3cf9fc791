from .rope import apply_rope2d
from .attention import dot_product_attention

__all__ = ["apply_rope2d", "dot_product_attention"]
