"""Data-parallel tests on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from mixstage_tpu.parallel.mesh import (make_mesh, replicate_state,
                                        shard_batch)
from mixstage_tpu.train.steps import StepConfig, StepFactory


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_shard_batch_layout():
    mesh = make_mesh()
    batch = {"y": np.zeros((16, 64, 96), np.float32),
             "style": np.zeros((16, 64), np.int32)}
    sharded = shard_batch(batch, mesh)
    shard_shapes = [s.data.shape for s in sharded["y"].addressable_shards]
    assert all(s == (2, 64, 96) for s in shard_shapes)
    # non-divisible batch is replicated, not dropped
    ragged = shard_batch({"y": np.zeros((3, 64, 96), np.float32)}, mesh)
    assert ragged["y"].shape == (3, 64, 96)


@pytest.mark.slow
def test_dp_step_matches_single_device():
    """The same batch must produce identical losses whether sharded over 8
    devices or run on 1 (replica consistency of the GAN G step)."""
    cfg = StepConfig(model="JointLateClusterSoftStyle4_G", gan=True,
                     criterion="L1Loss", num_clusters=4, num_speakers=2)
    factory = StepFactory(cfg, donate=False)
    rng = np.random.default_rng(0)
    B, T = 8, 64
    batch_np = {
        "x": (rng.normal(size=(B, T, 128)).astype(np.float32),),
        "y": rng.normal(size=(B, T, 96)).astype(np.float32),
        "labels": rng.integers(0, 4, size=(B, T)).astype(np.int32),
        "style": np.repeat(rng.integers(0, 2, size=(B, 1)), T, 1).astype(np.int32),
    }
    state = factory.init(jax.random.key(0), batch_np)
    steps = factory.make_steps()

    mesh8 = make_mesh(8)
    s8 = replicate_state(state, mesh8)
    b8 = shard_batch(batch_np, mesh8)
    s8n, losses8, pose8 = steps["g"](s8, b8, jax.random.key(1),
                                     use_pose_input=False)

    mesh1 = make_mesh(1)
    s1 = replicate_state(state, mesh1)
    b1 = shard_batch(batch_np, mesh1)
    s1n, losses1, pose1 = steps["g"](s1, b1, jax.random.key(1),
                                     use_pose_input=False)

    for k in losses8:
        if np.ndim(losses8[k]) > 0:  # per-sample vectors (e.g. W)
            np.testing.assert_allclose(np.asarray(losses8[k]),
                                       np.asarray(losses1[k]),
                                       rtol=2e-4, atol=1e-5)
            continue
        np.testing.assert_allclose(float(losses8[k]), float(losses1[k]),
                                   rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pose8), np.asarray(pose1),
                               rtol=2e-3, atol=2e-4)


@pytest.mark.slow
def test_graft_entry_contract():
    import __graft_entry__ as ge

    fn, (state, batch) = ge.entry()
    pose = jax.jit(fn)(state, batch)
    assert pose.shape == (4, 64, 96)
    ge.dryrun_multichip(8)
