from . import modules
from .registry import available, build_network, register
from .unet import ConditionalUNet

__all__ = ["modules", "available", "build_network", "register", "ConditionalUNet"]
