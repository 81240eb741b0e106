from .attention import multi_head_attention
from .layernorm import layer_norm

__all__ = ["multi_head_attention", "layer_norm"]
