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



@pytest.mark.slow
def test_ep_mixture_decoder_sharding_exact():
    """Expert parallelism of the mixture decoder on a 4x2 (data x model)
    mesh: the M grouped sub-generators sharded over the model axis must give
    the same forward output AND parameter gradients as the replicated run.
    GSPMD inserts the mixture-select psum and its backward collectives.

    Scoped to the decoder subgraph for tight numeric assertions; the FULL
    train step under the same 2-D sharding is exercised by
    __graft_entry__.dryrun_multichip phase 2.  DP is the production layout
    (SURVEY.md §2 — the model is ~16M params, data parallelism is
    perf-optimal).  The decoder must be einsum-lowered under EP: XLA
    mispartitions the k=1 grouped conv (wrong values) and compiles k=3
    feature-sharded grouped-conv grads in ~330 s each; the dot_general form
    is instant and bit-exact."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from mixstage_tpu.parallel.mesh import make_mesh_2d, replicated

    cfg = StepConfig(model="JointLateClusterSoftStyle4_G", gan=True,
                     criterion="L1Loss", num_clusters=4, num_speakers=2)
    factory = StepFactory(cfg, donate=False)
    rng = np.random.default_rng(0)
    B, T, C = 8, 64, 256 + cfg.style_dim
    batch_np = {
        "x": (rng.normal(size=(B, T, 128)).astype(np.float32),),
        "y": rng.normal(size=(B, T, 96)).astype(np.float32),
        "labels": rng.integers(0, 4, size=(B, T)).astype(np.int32),
        "style": np.repeat(rng.integers(0, 2, size=(B, 1)), T, 1).astype(np.int32),
    }
    state = factory.init(jax.random.key(0), batch_np)
    # same params, einsum-lowered decoder (XLA partitions the conv form of a
    # feature-sharded grouped conv pathologically: ~330 s compile per conv
    # and wrong values at k=1; the einsum form is instant and bit-exact)
    gen = factory.gen.clone(decoder_lowering="einsum")
    x = jnp.asarray(rng.normal(size=(B, T, C)).astype(np.float32))
    w = jax.nn.softmax(
        jnp.asarray(rng.normal(size=(B, T, 4)).astype(np.float32)), -1)
    y = jnp.asarray(rng.normal(size=(B, T, 96)).astype(np.float32))

    import flax.linen as nn

    decoder_keys = [f"decoder{i}" for i in range(4)] + ["logits"]

    def decoder_loss(dec_params, x, w):
        variables = {
            "params": {**state.g_params["gen"], **dec_params},
            "batch_stats": state.g_state["gen"]}

        def run(mod):
            xr = jnp.tile(x, (1, 1, mod.num_clusters))
            for layer in mod.decoder:
                xr = layer(xr, train=False)
            xr = mod.logits(xr)
            from mixstage_tpu.ops.mixture import index_select_outputs
            pose = index_select_outputs(xr, w, mod.num_clusters)
            return jnp.abs(pose - y).mean()

        return nn.apply(run, gen)(variables)

    dec_params = {k: state.g_params["gen"][k] for k in decoder_keys}
    grad_fn = jax.jit(jax.value_and_grad(decoder_loss))
    l1, g1 = grad_fn(dec_params, x, w)

    mesh = make_mesh_2d(4, 2)
    repl = replicated(mesh)

    def shard(tree):
        def put(path, leaf):
            shape = getattr(leaf, "shape", ())
            if shape and shape[-1] % 2 == 0:
                return jax.device_put(leaf, NamedSharding(
                    mesh, P(*([None] * (len(shape) - 1) + ["model"]))))
            return jax.device_put(leaf, repl)
        return jax.tree_util.tree_map_with_path(put, tree)

    l2, g2 = grad_fn(shard(dec_params),
                     jax.device_put(x, NamedSharding(mesh, P("data"))),
                     jax.device_put(w, NamedSharding(mesh, P("data"))))
    np.testing.assert_allclose(float(l2), float(l1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g2),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)


def test_dp_serving_matches_single_device():
    """Mesh-sharded serving (build_serving_fn(mesh=...)) must produce the
    same poses as the single-device path: inference is per-sample
    independent, so sharding the batch over the data axis is bitwise-neutral
    (weights replicated, zero collectives in the graph)."""
    from mixstage_tpu.serve import build_serving_fn

    cfg = StepConfig(model="JointLateClusterSoftStyle4_G", gan=True,
                     criterion="L1Loss", num_clusters=4, num_speakers=2)
    factory = StepFactory(cfg, donate=False)
    rng = np.random.default_rng(0)
    B, T = 16, 64
    batch = {
        "x": (rng.normal(size=(B, T, 128)).astype(np.float32),),
        "y": rng.normal(size=(B, T, 96)).astype(np.float32),
        "labels": rng.integers(0, 4, size=(B, T)).astype(np.int32),
        "style": np.repeat(rng.integers(0, 2, size=(B, 1)), T, 1).astype(np.int32),
    }
    state = factory.init(jax.random.key(0), batch)
    audio = np.asarray(batch["x"][0])
    styles = np.zeros((B,), np.int32)

    serve1 = build_serving_fn(factory, state, use_pallas=False)
    serve8 = build_serving_fn(factory, state, use_pallas=False,
                              mesh=make_mesh(8))
    out1 = np.asarray(serve1(audio, styles))
    out8 = np.asarray(serve8(audio, styles))
    assert out8.shape == out1.shape == (B, T, 96)
    np.testing.assert_allclose(out8, out1, rtol=0, atol=1e-6)
    # per-device shards actually cover distinct batch rows
    shards = serve8(audio, styles).addressable_shards
    assert len({s.index[0].start for s in shards}) == 8

    # non-divisible batch rejected loudly, not silently mis-sharded
    with pytest.raises(AssertionError, match="must divide"):
        serve8(audio[:3], styles[:3])


def _serving_fixture(num_clusters=4, B=4, T=128, seed=0):
    """Small trained-shape model + batch for the partitioned-serving tests."""
    from mixstage_tpu.serve import build_serving_fn

    cfg = StepConfig(model="JointLateClusterSoftStyle4_G", gan=True,
                     criterion="L1Loss", num_clusters=num_clusters,
                     num_speakers=2)
    factory = StepFactory(cfg, donate=False)
    rng = np.random.default_rng(seed)
    batch = {
        "x": (rng.normal(size=(B, T, 128)).astype(np.float32),),
        "y": rng.normal(size=(B, T, 96)).astype(np.float32),
        "labels": rng.integers(0, num_clusters, size=(B, T)).astype(np.int32),
        "style": np.repeat(rng.integers(0, 2, size=(B, 1)), T,
                           1).astype(np.int32),
    }
    state = factory.init(jax.random.key(0), batch)
    audio = np.asarray(batch["x"][0])
    styles = np.zeros((B,), np.int32)
    return build_serving_fn, factory, state, audio, styles


def test_time_partitioned_serving_matches_single_device():
    """Sequence-parallel serving (partition='time'): one clip's time axis
    GSPMD-sharded over the mesh — XLA inserts the size-3-conv halo
    exchanges, so the output must match the single-device graph.  This is
    the layout that cuts latency for a single LONG request (B=1) that
    batch sharding cannot split."""
    build_serving_fn, factory, state, audio, styles = _serving_fixture()
    serve1 = build_serving_fn(factory, state, use_pallas=False)
    serve_t = build_serving_fn(factory, state, use_pallas=False,
                               mesh=make_mesh(8), partition="time")
    out1 = np.asarray(serve1(audio, styles))
    out_t_arr = serve_t(audio, styles)
    out_t = np.asarray(out_t_arr)
    assert out_t.shape == out1.shape
    np.testing.assert_allclose(out_t, out1, rtol=0, atol=1e-5)
    # the output really lives time-sharded: 8 distinct time-axis shards
    starts = {s.index[1].start for s in out_t_arr.addressable_shards}
    assert len(starts) == 8

    # the Pallas decoder cannot be partitioned over time — loud, at build
    with pytest.raises(ValueError, match="time partitioning"):
        build_serving_fn(factory, state, use_pallas=True,
                         mesh=make_mesh(8), partition="time")


def test_expert_partitioned_serving_matches_single_device():
    """Expert-parallel serving (partition='expert'): the M mixture experts
    sharded over the mesh axis (the serving twin of training EP /
    shard_state_mixture).  Each device decodes its local experts and ONE
    psum realizes the mixture sum — output must match single-device up to
    f32 reduction order."""
    build_serving_fn, factory, state, audio, styles = _serving_fixture(
        num_clusters=8)
    serve1 = build_serving_fn(factory, state, use_pallas=False)
    for n in (4, 8):  # g_local = 2 and 1
        serve_e = build_serving_fn(factory, state, use_pallas=False,
                                   mesh=make_mesh(n), partition="expert")
        out1 = np.asarray(serve1(audio, styles))
        out_e = np.asarray(serve_e(audio, styles))
        assert out_e.shape == out1.shape
        np.testing.assert_allclose(out_e, out1, rtol=0, atol=1e-5)

    # experts must divide the axis: 8 clusters on a 3-device mesh is an
    # error at build time, not a silent mis-shard
    from mixstage_tpu.parallel.mesh import make_mesh as _mm
    with pytest.raises(ValueError, match="must divide"):
        build_serving_fn(factory, state, use_pallas=False,
                         mesh=_mm(3), partition="expert")
    # the int8 tier's scale layout is not expert-sliced — loud
    with pytest.raises(ValueError, match="batch-partitioned only"):
        build_serving_fn(factory, state, use_pallas=False, mesh=_mm(8),
                         partition="expert", quantize_int8=True,
                         calib=(audio, styles))
    with pytest.raises(ValueError, match="unknown partition"):
        build_serving_fn(factory, state, mesh=_mm(8), partition="pipeline")
