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


def test_tensor_parallel_numeric_equivalence():
    """dp=4 x tp=2 sharding is semantically transparent: the full train step
    (loss + grads + Adam + EMA) gives the same numbers as one device.
    Complements the DP-equivalence test (test_training.py) by column-sharding
    the large conv kernels over the model axis."""
    import jax.numpy as jnp
    import numpy as np

    from image_restoration_sde_tpu.models import ConditionalUNet
    from image_restoration_sde_tpu.parallel import make_mesh
    from image_restoration_sde_tpu.parallel.mesh import (
        batch_sharding,
        shape_based_tp_sharding,
        shard_tree,
    )
    from image_restoration_sde_tpu.sde import IRSDE
    from image_restoration_sde_tpu.training import create_train_state, make_train_step
    from image_restoration_sde_tpu.training.optimizers import build_optimizer

    sde = IRSDE.create(max_sigma=10.0, T=8, schedule="cosine", eps=0.005)
    # nf=64 so the deepest kernels' trailing axis crosses the min_last=64
    # sharding rule and tp actually engages
    net = ConditionalUNet(in_nc=3, out_nc=3, nf=64, depth=2)
    lq = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 3))
    gt = jnp.clip(lq + 0.1, 0, 1)
    key = jax.random.PRNGKey(7)

    params = jax.jit(net.init)(jax.random.PRNGKey(0), lq, lq, jnp.ones((8,)))
    tx = build_optimizer("Adam", 1e-4, 0.9, 0.99)
    step_fn = make_train_step(sde, net.apply, tx)

    s_single, m_single = jax.jit(step_fn)(create_train_state(params, tx), lq, gt, key)

    mesh = make_mesh(model_parallel=2)  # (data=4, model=2)
    sh = shape_based_tp_sharding(create_train_state(params, tx), mesh, min_last=64)
    # the rule must shard at least one leaf or this test is vacuous
    specs = {s.spec for s in jax.tree.leaves(sh)}
    assert any(spec for spec in specs), specs
    state_tp = shard_tree(create_train_state(params, tx), sh)
    bs = batch_sharding(mesh)
    s_tp, m_tp = jax.jit(step_fn)(
        state_tp, jax.device_put(lq, bs), jax.device_put(gt, bs), key
    )

    np.testing.assert_allclose(float(m_single["loss"]), float(m_tp["loss"]), rtol=1e-5)
    for a, b in zip(jax.tree.leaves(s_single.params), jax.tree.leaves(s_tp.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


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


def test_tp_checkpoint_save_restore_interop(tmp_path):
    """TP x checkpointing: (a) a tp2-sharded TrainState saves through orbax
    and restores into the same mesh with shardings intact; (b) checkpoints
    are layout-portable — the same save restores replicated (tp2 -> dp) and
    a dp-only save restores tp2-sharded (dp -> tp), params equal each way;
    (c) each restored state continues training with the uninterrupted run's
    loss.  Ref resume semantics: base_model.py:107-131."""
    import jax.numpy as jnp
    import numpy as np

    from image_restoration_sde_tpu.models import ConditionalUNet
    from image_restoration_sde_tpu.parallel import make_mesh
    from image_restoration_sde_tpu.parallel.mesh import (
        batch_sharding,
        replicated,
        shape_based_tp_sharding,
        shard_tree,
    )
    from image_restoration_sde_tpu.sde import IRSDE
    from image_restoration_sde_tpu.training import create_train_state, make_train_step
    from image_restoration_sde_tpu.training.checkpoint import (
        load_training_state,
        save_training_state,
        wait_for_checkpoints,
    )
    from image_restoration_sde_tpu.training.optimizers import build_optimizer

    sde = IRSDE.create(max_sigma=10.0, T=4, schedule="cosine", eps=0.005)
    # nf=16 -> time-MLP kernels have trailing dim 64: the shape rule
    # column-shards them over 'model', so tp2 is not a no-op
    net = ConditionalUNet(in_nc=3, out_nc=3, nf=16, depth=2)
    lq = jax.random.uniform(jax.random.PRNGKey(1), (8, 8, 8, 3))
    gt = jnp.clip(lq + 0.1, 0, 1)
    key = jax.random.PRNGKey(7)

    params = jax.jit(net.init)(jax.random.PRNGKey(0), lq, lq, jnp.ones((8,)))
    tx = build_optimizer("Adam", 1e-3, 0.9, 0.99)
    jit_step = jax.jit(make_train_step(sde, net.apply, tx))

    # uninterrupted 2-step reference run
    state, _ = jit_step(create_train_state(params, tx), lq, gt, key)
    state_ref2, m_ref2 = jit_step(state, lq, gt, key)
    loss2 = float(m_ref2["loss"])

    mesh = make_mesh(model_parallel=2)  # (data=4, model=2)
    tp_sh = shape_based_tp_sharding(state, mesh)
    assert any(s.spec for s in jax.tree.leaves(tp_sh))  # rule engages
    rep_sh = jax.tree.map(lambda _: replicated(mesh), tp_sh)
    bs = batch_sharding(mesh)
    lq_s, gt_s = jax.device_put(lq, bs), jax.device_put(gt, bs)

    def assert_tree_equal(a, b):
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))

    # (a) save SHARDED, restore into the same tp mesh: shardings intact
    state_tp = shard_tree(state, tp_sh)
    path_tp = save_training_state(str(tmp_path / "tp_save"), state_tp, 0, 1)
    wait_for_checkpoints()
    restored_tp, _, it = load_training_state(
        path_tp, create_train_state(params, tx), shardings=tp_sh
    )
    assert it == 1
    for leaf, sh in zip(jax.tree.leaves(restored_tp), jax.tree.leaves(tp_sh)):
        assert leaf.sharding.is_equivalent_to(sh, leaf.ndim), (leaf.sharding, sh)
    assert_tree_equal(restored_tp, state)
    _, m = jit_step(restored_tp, lq_s, gt_s, key)
    np.testing.assert_allclose(float(m["loss"]), loss2, rtol=2e-3)

    # (b1) tp2 save -> dp-only (replicated) restore
    restored_dp, _, _ = load_training_state(
        path_tp, create_train_state(params, tx), shardings=rep_sh
    )
    for leaf in jax.tree.leaves(restored_dp):
        assert leaf.sharding.is_equivalent_to(replicated(mesh), leaf.ndim)
    assert_tree_equal(restored_dp, state)
    _, m = jit_step(restored_dp, lq_s, gt_s, key)
    np.testing.assert_allclose(float(m["loss"]), loss2, rtol=2e-3)

    # (b2) dp-only save -> tp2 restore
    path_dp = save_training_state(
        str(tmp_path / "dp_save"), jax.device_get(state), 0, 1
    )
    wait_for_checkpoints()
    restored_x, _, _ = load_training_state(
        path_dp, create_train_state(params, tx), shardings=tp_sh
    )
    for leaf, sh in zip(jax.tree.leaves(restored_x), jax.tree.leaves(tp_sh)):
        assert leaf.sharding.is_equivalent_to(sh, leaf.ndim)
    assert_tree_equal(restored_x, state)
    _, m = jit_step(restored_x, lq_s, gt_s, key)
    np.testing.assert_allclose(float(m["loss"]), loss2, rtol=2e-3)
