"""Multi-chip dryrun contract test: the full train step compiles and runs
under dp+tp shardings on the virtual 8-device CPU mesh."""

import importlib.util
import os

import jax


def test_dryrun_multichip_8():
    assert len(jax.devices()) == 8
    spec = importlib.util.spec_from_file_location(
        "graft_entry", os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_shape_based_tp_sharding_rule():
    import numpy as np
    from jax.sharding import PartitionSpec as P

    from image_restoration_sde_tpu.parallel import make_mesh
    from image_restoration_sde_tpu.parallel.mesh import shape_based_tp_sharding

    mesh = make_mesh(model_parallel=2)
    tree = {
        "big": np.zeros((3, 3, 32, 128)),   # sharded on last axis
        "small": np.zeros((16,)),            # replicated (< min_last)
        "odd": np.zeros((4, 63)),            # replicated (not divisible)
    }
    sh = shape_based_tp_sharding(tree, mesh, min_last=64)
    assert sh["big"].spec == P(None, None, None, "model")
    assert sh["small"].spec == P()
    assert sh["odd"].spec == P()
