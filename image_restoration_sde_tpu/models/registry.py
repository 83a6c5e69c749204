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
    """Instantiate a registered network by its reference class name.

    YAML settings are plain scalars, so dtype-valued kwargs (``dtype``,
    ``param_dtype``) may arrive as strings ("bfloat16") — normalized to
    jnp dtypes here so configs can opt a net into bf16 compute."""
    import jax.numpy as jnp

    setting = dict(setting or {})
    setting.update(overrides)
    for k in ("dtype", "param_dtype"):
        if isinstance(setting.get(k), str):
            setting[k] = jnp.dtype(setting[k]).type
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
    from .stereo_nafnet import StereoConditionalNAFNet
    from .bokeh_nafnet import BokehConditionalNAFNet
    from . import dit

    _REGISTRY.setdefault("StereoConditionalNAFNet", StereoConditionalNAFNet)
    _REGISTRY.setdefault("BokehConditionalNAFNet", BokehConditionalNAFNet)
    _REGISTRY.setdefault("DiT", dit.DiT)
    for size in ("S", "B", "L", "XL"):
        for patch in (2, 4, 8):
            _REGISTRY.setdefault(f"DiT_{size}_{patch}", getattr(dit, f"DiT_{size}_{patch}"))

    def _cnafnet_local(train_size=(1, 3, 128, 128), fast_imp=False, **kw):
        # reference CNAFNetLocal: NAFNet with TLSC stats pinned to the train
        # crop (ref latent-dehazing local_arch.py + DenoisingNAFNet_arch.py:190-201)
        from .nafnet import ConditionalNAFNet

        H, W = train_size[-2], train_size[-1]
        return ConditionalNAFNet(tlsc_train_size=(H, W), **kw)

    _REGISTRY.setdefault("CNAFNetLocal", _cnafnet_local)


_populate()
