"""Child process for the multi-host tests (tests/test_multihost.py).

Modes (argv[3], default "smoke"):

* ``smoke`` — one of two CPU processes: initializes jax.distributed through
  ``mixstage_tpu.parallel.multihost.setup``, checks host-list sharding, runs
  a cross-process allgather and a device-collective sum over the global mesh.
* ``ganstep`` — one of N processes forming a GLOBAL 8-device data mesh; runs
  the FULL GAN G+D training steps (same init key, same global batch, same
  step keys as ``__graft_entry__.dryrun_multichip`` phase 1) and prints the
  losses, so the parent can assert 1-process×8-device == 2-process×4-device
  loss equality (VERDICT r3 item 7).
"""

import sys


def ganstep(num_processes: int, pid: int, port: str):
    """Full GAN step over the global 8-device mesh; prints G/D losses."""
    import os

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

    import numpy as np

    sys.path.insert(0, os.environ.get("GRAFT_REPO_ROOT", "."))
    if num_processes > 1:
        from mixstage_tpu.parallel import multihost

        multihost.setup(coordinator_address=f"localhost:{port}",
                        num_processes=num_processes, process_id=pid)

    import __graft_entry__ as ge
    from mixstage_tpu.parallel.mesh import make_mesh

    n_global = len(jax.devices())
    assert n_global == 8, f"want a global 8-device mesh, got {n_global}"
    mesh = make_mesh(8)
    factory = ge._factory(donate=False)
    B = 16  # same shapes/seeds as dryrun_multichip phase 1 (n=8)
    batch_np = jax.tree.map(np.asarray, ge._example_batch(B=B))
    # every process holds the identical full batch/state (deterministic from
    # the seed); make_array_from_process_local_data slices out each process's
    # addressable shards against the GLOBAL sharding
    from jax.sharding import NamedSharding, PartitionSpec as P

    def put(tree, spec_fn):
        def one(x):
            x = np.asarray(x)
            sh = NamedSharding(mesh, spec_fn(x))
            return jax.make_array_from_process_local_data(sh, x, x.shape)
        return jax.tree.map(one, tree)

    state = factory.init(jax.random.key(0), ge._example_batch(B=B))
    state = jax.tree.map(np.asarray, state)
    state = put(state, lambda x: P())
    gbatch = put(batch_np,
                 lambda x: P("data") if x.ndim and x.shape[0] % 8 == 0
                 else P())
    steps = factory.make_steps()
    batch2 = jax.tree.map(np.asarray, ge._example_batch(B=B, seed=1))
    gbatch2 = put(batch2,
                  lambda x: P("data") if x.ndim and x.shape[0] % 8 == 0
                  else P())
    # AOT-compile BOTH steps, then meet at a coordination-service barrier
    # before the first execution: Gloo's cross-process context rendezvous
    # has a fixed 30 s deadline counted from the first arriver, and on a
    # 1-core host two children compiling minutes of XLA can skew past it
    # (observed 2026-08-20: child 0 parked at the first collective while
    # child 1 still compiled → DEADLINE_EXCEEDED).  The barrier rides the
    # coordination service, NOT a device collective, so it cannot itself
    # hit the Gloo deadline; executing the pre-compiled executables keeps
    # the two processes' first collective within milliseconds.
    g_c = steps["g"].lower(state, gbatch, jax.random.key(1),
                           use_pose_input=False).compile()
    d_c = steps["d"].lower(state, gbatch2, jax.random.key(2),
                           use_pose_input=False).compile()
    if num_processes > 1:
        from jax._src import distributed

        distributed.global_state.client.wait_at_barrier(
            "ganstep_compiled", 480_000)
    state, losses_g, _ = g_c(state, gbatch, jax.random.key(1))
    state, losses_d, _ = d_c(state, gbatch2, jax.random.key(2))
    g, d = float(losses_g["total"]), float(losses_d["total"])
    assert np.isfinite(g) and np.isfinite(d)
    print(f"MULTIHOST_GANSTEP pid={pid} procs={num_processes} "
          f"devices={n_global} G={g:.9f} D={d:.9f}")


def main():
    port, pid = sys.argv[1], int(sys.argv[2])
    mode = sys.argv[3] if len(sys.argv) > 3 else "smoke"

    if mode.startswith("ganstep"):
        num_processes = int(mode.split(":")[1]) if ":" in mode else 2
        ganstep(num_processes, pid, port)
        return

    import jax

    # this container's sitecustomize pins the TPU platform via jax.config,
    # which beats the env var — override the same way
    jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from mixstage_tpu.parallel import multihost

    multihost.setup(coordinator_address=f"localhost:{port}",
                    num_processes=2, process_id=pid)
    assert multihost.process_count() == 2
    assert multihost.process_index() == pid

    # host work-list sharding: disjoint round-robin halves
    items = multihost.shard_for_process(list(range(10)))
    assert items == list(range(pid, 10, 2))

    # cross-process collective through the distributed runtime
    from jax.experimental import multihost_utils

    got = multihost_utils.process_allgather(np.array([pid]))
    assert sorted(np.asarray(got).ravel().tolist()) == [0, 1]

    # device collective over the global mesh: per-process distinct values,
    # replicated global sum must see both processes' shards
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_local = len(jax.local_devices())
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sh = NamedSharding(mesh, P("data"))
    local = np.ones((n_local, 4), np.float32) * (pid + 1)
    gx = jax.make_array_from_process_local_data(sh, local)
    total = jax.jit(lambda x: x.sum(),
                    out_shardings=NamedSharding(mesh, P()))(gx)
    expected = 4.0 * n_local * (1 + 2)
    assert abs(float(np.asarray(total)) - expected) < 1e-5, \
        f"psum got {float(np.asarray(total))}, want {expected}"
    print(f"MULTIHOST_OK pid={pid} devices={len(jax.devices())} "
          f"local={n_local} total={float(np.asarray(total))}")


if __name__ == "__main__":
    main()
