"""Multi-host smoke: 2 CPU processes through jax.distributed (VERDICT
round-1 item 7).  Real pods are unavailable in CI, so this exercises
``parallel/multihost.py`` — setup, shard_for_process, a cross-process
allgather and a device-collective global sum — with two local processes."""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

CHILD = Path(__file__).parent / "_multihost_child.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_distributed_smoke():
    port = _free_port()
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # children import mixstage_tpu from the repo root regardless of how the
    # parent pytest was launched
    repo_root = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo_root + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    env["XLA_FLAGS"] = " ".join(
        flags + ["--xla_force_host_platform_device_count=2"])
    # children must not inherit the parent's persistent-cache config conflicts
    procs = [subprocess.Popen(
        [sys.executable, str(CHILD), str(port), str(pid)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"child {pid} failed (rc={p.returncode}):\n{out}"
        assert f"MULTIHOST_OK pid={pid} devices=4 local=2" in out, out
