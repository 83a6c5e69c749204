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


def test_dryrun_multichip_bootstraps_from_short_platform():
    """Driver contract: on a platform with fewer than n devices (the real
    environment is a 1-chip TPU), dryrun_multichip must re-exec itself onto
    a virtual n-device CPU platform instead of failing (VERDICT r1 item 1)."""
    import subprocess
    import sys

    repo = os.path.join(os.path.dirname(__file__), "..")
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env.pop("_IRSDE_DRYRUN_CHILD", None)
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        f"import sys; sys.path.insert(0, {os.path.abspath(repo)!r})\n"
        "import __graft_entry__\n"
        "assert len(jax.devices()) == 1\n"
        "__graft_entry__.dryrun_multichip(4)\n"
    )
    res = subprocess.run(
        [sys.executable, "-c", code], env=env, capture_output=True, text=True,
        timeout=600,
    )
    assert res.returncode == 0, res.stderr[-2000:]
    assert "dryrun_multichip OK" in res.stdout
    assert "'data': 2, 'model': 2" in res.stdout


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
