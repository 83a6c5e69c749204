"""Device mesh construction and sharding rules.

Replaces the reference's process-per-GPU DDP stack (torch.distributed +
NCCL allreduce + DistIterSampler, ref train.py:28-40, denoising_model.py:37-42,
data/data_sampler.py) with single-controller JAX: one ``Mesh`` with
``(data, model)`` axes, batch arrays sharded over ``data``, parameters
replicated (or channel-sharded over ``model`` for the tensor-parallel path),
and XLA-inserted collectives over ICI.

No user-level collective code: the jitted train step carries sharding
annotations and GSPMD schedules the gradient all-reduce.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    model_parallel: int = 1,
    axis_names: Tuple[str, str] = (DATA_AXIS, MODEL_AXIS),
) -> Mesh:
    """Mesh over all (or given) devices: (n//model_parallel, model_parallel)."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if n % model_parallel != 0:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    arr = np.asarray(devices).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, axis_names)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """NHWC batches shard over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _put_global(x, sh: NamedSharding):
    """Place one host array under a (possibly multi-process) sharding.

    Single-process: plain ``device_put``.  Multi-process: each host holds
    only its local slice (TrainLoader strides ``process_index ::
    process_count``), so the global array is assembled from process-local
    data — the jax equivalent of the reference's per-rank DDP batches
    (ref data/__init__.py:11-16)."""
    if jax.process_count() > 1:
        return jax.make_array_from_process_local_data(sh, np.asarray(x))
    return jax.device_put(x, sh)


def shard_batch(batch, mesh: Mesh):
    """Place host arrays onto the mesh, batch-dim sharded over ``data``."""
    sh = batch_sharding(mesh)
    return jax.tree.map(lambda x: _put_global(x, sh), batch)


def replicate(tree, mesh: Mesh):
    sh = replicated(mesh)
    return jax.tree.map(lambda x: _put_global(x, sh), tree)


def process_is_primary() -> bool:
    """Rank-0 gating equivalent (ref train.py:95,170,261,305)."""
    return jax.process_index() == 0


def shape_based_tp_sharding(tree, mesh: Mesh, min_last: int = 64):
    """Megatron-style column sharding by shape rule: any leaf whose trailing
    axis is divisible by the ``model`` mesh size and at least ``min_last``
    shards that axis over MODEL_AXIS; everything else replicates.

    Applied uniformly to params / EMA / optimizer moments (moments share
    their param's shape, so the rule keeps them aligned); XLA/GSPMD inserts
    the activation collectives.
    """
    msize = mesh.shape[MODEL_AXIS]

    def rule(x):
        shape = getattr(x, "shape", ())
        if msize > 1 and len(shape) >= 1 and shape[-1] >= min_last and shape[-1] % msize == 0:
            spec = [None] * (len(shape) - 1) + [MODEL_AXIS]
            return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree.map(rule, tree)


def shard_tree(tree, shardings):
    """Place host values under per-leaf shardings (TP state placement).

    Single-process: plain ``device_put``.  Multi-process: each process holds
    the full host value (params are built identically everywhere), so each
    addressable shard is cut out of the local copy via
    ``make_array_from_callback`` — no cross-host transfer."""

    def put(x, sh):
        if jax.process_count() > 1:
            x = np.asarray(x)
            return jax.make_array_from_callback(x.shape, sh, lambda idx: x[idx])
        return jax.device_put(x, sh)

    return jax.tree.map(put, tree, shardings)
