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


def _child_env(local_devices: int) -> dict:
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    # the axon sitecustomize would re-register the TPU backend in children
    env.pop("PALLAS_AXON_POOL_IPS", None)
    # children import mixstage_tpu from the repo root regardless of how the
    # parent pytest was launched
    repo_root = str(Path(__file__).resolve().parent.parent)
    env["PYTHONPATH"] = repo_root + (
        os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else "")
    env["GRAFT_REPO_ROOT"] = repo_root
    flags = [f for f in env.get("XLA_FLAGS", "").split()
             if not f.startswith("--xla_force_host_platform_device_count")]
    env["XLA_FLAGS"] = " ".join(
        flags + [f"--xla_force_host_platform_device_count={local_devices}"])
    return env


def test_two_process_distributed_smoke():
    port = _free_port()
    env = _child_env(2)
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


def _parse_ganstep(out: str) -> tuple:
    for line in out.splitlines():
        if line.startswith("MULTIHOST_GANSTEP"):
            parts = dict(kv.split("=") for kv in line.split()[1:])
            return float(parts["G"]), float(parts["D"])
    raise AssertionError(f"no MULTIHOST_GANSTEP line in:\n{out}")


@pytest.mark.slow
def test_multihost_gan_step_matches_single_process():
    """Full GAN G+D training-step loss equality between a 1-process×8-device
    and a 2-process×4-device layout over the SAME global 8-device mesh
    (VERDICT r3 item 7): multi-host changes only where devices live; the
    GSPMD program (gradient psums, global-batch BN stats) must compute the
    same losses.  D is one optimizer update downstream of the G all-reduce,
    so it carries reduction-order f32 drift — bounded at 1e-4 relative,
    same tolerance as the dryrun's cross-layout check."""
    # single process, 8 local devices
    p1 = subprocess.run(
        [sys.executable, str(CHILD), "0", "0", "ganstep:1"],
        env=_child_env(8), stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True, timeout=540)
    assert p1.returncode == 0, f"1-process child failed:\n{p1.stdout}"
    g1, d1 = _parse_ganstep(p1.stdout)

    # two processes, 4 local devices each, same global mesh
    port = _free_port()
    procs = [subprocess.Popen(
        [sys.executable, str(CHILD), str(port), str(pid), "ganstep:2"],
        env=_child_env(4), stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True) for pid in (0, 1)]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=540)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, \
            f"2-process child {pid} failed (rc={p.returncode}):\n{out}"
    g2a, d2a = _parse_ganstep(outs[0])
    g2b, d2b = _parse_ganstep(outs[1])
    assert (g2a, d2a) == (g2b, d2b), "processes disagree on the global loss"
    assert abs(g2a - g1) < 1e-4 * max(abs(g1), 1.0), \
        f"G loss: 1-proc {g1} vs 2-proc {g2a}"
    assert abs(d2a - d1) < 1e-4 * max(abs(d1), 1.0), \
        f"D loss: 1-proc {d1} vs 2-proc {d2a}"
