"""Checkpointing with reference-equivalent resume semantics (orbax).

Parity: ref ``base_model.py:80-131`` + ``denoising_model.py:197-199`` —
two-artifact scheme per save point:

- weights:       ``<models>/{iter}_G``  (+ EMA snapshot ``<models>/lastest_EMA``,
  keeping the reference's spelling)
- trainer state: ``<training_state>/{iter}`` (step, epoch, optimizer state,
  EMA counter)

``load_params`` also accepts a reference ``.pth`` (via the torch importer)
so pretrained reference checkpoints drop in.
"""

from __future__ import annotations

import os
from typing import Any, Optional, Tuple

import jax
import numpy as np
import orbax.checkpoint as ocp

from .trainer import TrainState


_CKPTR = None


def _ckptr():
    # Singleton AsyncCheckpointer: saves return as soon as device arrays are
    # copied to host; serialization overlaps training (the reference blocks
    # on torch.save). finalize_checkpoints() drains pending writes at exit.
    # (Also: repeatedly constructing checkpointers tears down their executor
    # on GC and later saves crash with "cannot schedule new futures".)
    global _CKPTR
    if _CKPTR is None:
        _CKPTR = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _CKPTR


def wait_for_checkpoints() -> None:
    """Block until all in-flight async saves are durable."""
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()


def save_params(models_dir: str, params: Any, label: str) -> str:
    path = os.path.abspath(os.path.join(models_dir, label))
    _ckptr().save(path, params, force=True)
    return path


def _abstract(tree, shardings=None):
    """Shape/dtype structs orbax restores against.  With ``shardings`` (a
    matching pytree of ``NamedSharding``), each struct carries its target
    sharding so orbax materializes the restored arrays DIRECTLY in that
    layout — a tp-sharded state restores sharded (each device reads its
    shard), and checkpoints are layout-portable: the on-disk format is the
    global array, so a dp-only save restores into a tp mesh and vice versa."""
    if shardings is None:
        return jax.tree.map(ocp.utils.to_shape_dtype_struct, tree)
    return jax.tree.map(
        lambda a, sh: jax.ShapeDtypeStruct(a.shape, a.dtype, sharding=sh),
        tree, shardings,
    )


def load_params(path: str, abstract_params: Any, torch_rules: Optional[dict] = None,
                shardings: Any = None):
    """Load weights from an orbax dir or a reference ``.pth``."""
    wait_for_checkpoints()  # a just-written checkpoint must be durable
    if path.endswith(".pth"):
        from ..utils.torch_import import apply_rules, load_torch_state_dict

        if torch_rules is None:
            raise ValueError(".pth loading needs torch key rules for this architecture")
        sd = load_torch_state_dict(path)
        return apply_rules(abstract_params, sd, torch_rules)
    return _ckptr().restore(
        os.path.abspath(path), _abstract(abstract_params, shardings)
    )


def save_training_state(
    training_state_dir: str, state: TrainState, epoch: int, iter_step: int
) -> str:
    path = os.path.abspath(os.path.join(training_state_dir, str(iter_step)))
    payload = {"state": state, "epoch": np.asarray(epoch), "iter": np.asarray(iter_step)}
    _ckptr().save(path, payload, force=True)
    return path


def load_training_state(
    path: str, abstract_state: TrainState, shardings: Any = None
) -> Tuple[TrainState, int, int]:
    """Restore a full trainer state (ref base_model.py:107-131 semantics).

    ``shardings``: optional pytree of target ``NamedSharding``s matching
    ``abstract_state`` (e.g. ``shape_based_tp_sharding(state, mesh)``) —
    the restore lands directly in that layout, making checkpoints portable
    across parallelism layouts (dp-only save -> tp restore and vice versa;
    tested in tests/test_parallel.py)."""
    wait_for_checkpoints()
    abstract = {
        "state": _abstract(abstract_state, shardings),
        "epoch": np.asarray(0),
        "iter": np.asarray(0),
    }
    restored = _ckptr().restore(os.path.abspath(path), abstract)
    return restored["state"], int(restored["epoch"]), int(restored["iter"])


def save_checkpoint(
    opt_path: dict, state: TrainState, epoch: int, iter_step: int
) -> None:
    """Full save point (ref train.py:305-309): weights, EMA, trainer state."""
    save_params(opt_path["models"], state.params, f"{iter_step}_G")
    save_params(opt_path["models"], state.ema.params, "lastest_EMA")
    save_training_state(opt_path["training_state"], state, epoch, iter_step)


def finalize_checkpoints() -> None:
    """Drain pending saves and close the singleton checkpointer before
    interpreter shutdown (its background executor otherwise races atexit)."""
    global _CKPTR
    if _CKPTR is not None:
        _CKPTR.wait_until_finished()
        _CKPTR.close()
        _CKPTR = None
