from .attention import (
    attention_xla,
    flash_attention,
    scaled_dot_product_attention,
)
from .norms import group_norm, layer_norm

__all__ = [
    "attention_xla",
    "flash_attention",
    "group_norm",
    "layer_norm",
    "scaled_dot_product_attention",
]
