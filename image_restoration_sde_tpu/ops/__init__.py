from .layernorm import channel_layernorm
from .linear_attention import linear_attention

__all__ = ["channel_layernorm", "linear_attention"]
