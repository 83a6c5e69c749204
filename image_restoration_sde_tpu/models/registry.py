"""Network factory: YAML ``which_model`` name + setting kwargs -> Flax module.

Replaces the reference's reflection factory ``networks.define_G``
(``codes/config/deraining/models/networks.py:10-15``), which instantiates
``getattr(modules, which_model)(**setting)``.  Same YAML surface: the
``network_G.which_model`` (or ``which_model_G``) string selects the class and
``network_G.setting`` supplies ctor kwargs.
"""

from __future__ import annotations

from typing import Any, Dict

_REGISTRY: Dict[str, Any] = {}


def register(name: str):
    def deco(cls):
        _REGISTRY[name] = cls
        return cls

    return deco


def available() -> list:
    return sorted(_REGISTRY)


def build_network(which_model: str, setting: Dict[str, Any] | None = None, **overrides):
    """Instantiate a registered network by its reference class name."""
    setting = dict(setting or {})
    setting.update(overrides)
    try:
        cls = _REGISTRY[which_model]
    except KeyError:
        raise ValueError(
            f"unknown network {which_model!r}; available: {available()}"
        ) from None
    return cls(**setting)


def _populate():
    from .unet import ConditionalUNet

    _REGISTRY.setdefault("ConditionalUNet", ConditionalUNet)
    try:
        from .nafnet import ConditionalNAFNet

        _REGISTRY.setdefault("ConditionalNAFNet", ConditionalNAFNet)
    except ImportError:
        pass
    try:
        from .latent_unet import UNet

        _REGISTRY.setdefault("UNet", UNet)
    except ImportError:
        pass


_populate()
