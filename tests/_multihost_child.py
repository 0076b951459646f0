"""Child process for the multi-host smoke test (tests/test_multihost.py).

Runs as one of two CPU processes: initializes jax.distributed through
``mixstage_tpu.parallel.multihost.setup``, checks host-list sharding, runs a
cross-process allgather and a device-collective sum over the global mesh.
"""

import sys


def main():
    port, pid = sys.argv[1], int(sys.argv[2])

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
