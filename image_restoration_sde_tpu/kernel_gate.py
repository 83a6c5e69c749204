"""Trace-time pallas-kernel gate flags, shared by models/* and ops/*.

Lives in its own leaf module because both sides need it (models.modules
imports ops.linear_attention, so ops can't import models back).

Two nestable contexts used by AOT export (``exporting``):

- ``no_pallas()``   — every gate answers False.  Cross-platform artifacts
  must be pure StableHLO, and a symbolic batch dim can't answer the
  batch>=N gates.
- ``force_pallas()`` — backend checks treat the target as TPU.  When
  exporting a TPU-only artifact from a CPU-only host, the *lowering*
  target is TPU but ``jax.default_backend()`` says cpu; Mosaic lowering
  itself runs fine host-side, so the gates must be overridable.

``no_pallas`` wins if both are active (defensive; they are never nested
by the library itself).
"""

from __future__ import annotations

import contextlib

_FORCED_OFF = False
_FORCED_ON = False


@contextlib.contextmanager
def no_pallas():
    """Force every kernel gate off for the enclosed trace."""
    global _FORCED_OFF
    prev = _FORCED_OFF
    _FORCED_OFF = True
    try:
        yield
    finally:
        _FORCED_OFF = prev


@contextlib.contextmanager
def force_pallas():
    """Treat the lowering target as TPU for the enclosed trace."""
    global _FORCED_ON
    prev = _FORCED_ON
    _FORCED_ON = True
    try:
        yield
    finally:
        _FORCED_ON = prev


def forced_off() -> bool:
    return _FORCED_OFF


def forced_on() -> bool:
    return _FORCED_ON and not _FORCED_OFF


def target_is_tpu() -> bool:
    """The backend check kernel ops should use: the real backend, or the
    forced lowering target during a ``force_pallas()`` export trace."""
    import jax

    return forced_on() or jax.default_backend() == "tpu"
