"""Preemption survival: SIGTERM → live-state checkpoint → exact resume.

TPU-native addition (no reference counterpart — pycasper only greedy-saves
the best dev model, so a preempted reference job loses everything since the
last dev improvement).  Covers the in-process signal path, the snapshot
round-trip (optimizer + counters), the one-shot resume, and the cli.train
exit-75 contract schedulers key on.
"""

import json
import os
import signal
import subprocess
import sys
import time
from pathlib import Path

import numpy as np
import pytest

from mixstage_tpu.config import config_from_dict
from mixstage_tpu.data.synthetic import make_synthetic_dataset
from mixstage_tpu.train.trainer import Trainer, TrainingPreempted


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    path = tmp_path_factory.mktemp("pats_preempt")
    make_synthetic_dataset(str(path), speakers=["oliver"],
                           num_intervals_per_speaker=3)
    return str(path)


def _cfg(synth, save_dir, **overrides):
    d = dict(path2data=synth, speaker=["oliver"],
             modalities=["pose/data", "audio/log_mel_512"],
             fs_new=[15, 15], batch_size=4, num_epochs=3, window_hop=5,
             save_dir=save_dir, exp=1, num_iters=2, debug=2, metrics=0,
             stop_thresh=10, render=0, model="Speech2Gesture_G", gan=0,
             loss="L1Loss")
    d.update(overrides)
    return config_from_dict(d)


@pytest.mark.slow
def test_sigterm_checkpoints_live_state_and_resume_continues(
        synth, tmp_path_factory):
    """A real SIGTERM mid-training snapshots weights+optimizer+counters to
    PREFIX_preempt.p (best weights untouched), and rerunning the same
    experiment consumes the snapshot: counters continue, training finishes,
    the snapshot is cleared."""
    save_dir = str(tmp_path_factory.mktemp("save_preempt"))
    trainer = Trainer(_cfg(synth, save_dir),
                      ["exp", "cpk", "speaker", "model", "note"], {})
    trainer.start_exp()

    # deliver a REAL signal at the end of epoch 0 (print_res is the last
    # host-side call of an epoch) — the handler installed by train() flags,
    # and the epoch-1 boundary check raises after checkpointing
    orig_print = trainer.book.print_res

    def hooked(*a, **k):
        orig_print(*a, **k)
        os.kill(os.getpid(), signal.SIGTERM)

    trainer.book.print_res = hooked
    with pytest.raises(TrainingPreempted):
        trainer.train(exp_num=1)
    trainer.book.print_res = orig_print

    p_state, p_meta = trainer.book._preempt_paths()
    assert os.path.exists(p_state) and os.path.exists(p_meta)
    meta = json.load(open(p_meta))
    assert meta["epoch_next"] == 1 and meta["step"] > 0
    saved_step = meta["step"]
    trainer.finish_exp()

    # fresh process-equivalent: new Trainer, same experiment prefix
    trainer2 = Trainer(_cfg(synth, save_dir),
                       ["exp", "cpk", "speaker", "model", "note"], {})
    assert int(trainer2.state.step) == 0
    # peek the snapshot restore before train() consumes it: exact counters
    st, meta2 = trainer2.book.load_preempt(trainer2.state)
    assert int(st.step) == saved_step == meta2["step"]

    trainer2.start_exp()
    trainer2.train(exp_num=1)  # auto-resumes at epoch 1, runs to completion
    trainer2.finish_exp()
    assert int(trainer2.state.step) > saved_step
    assert not os.path.exists(p_state), "snapshot must be one-shot"
    # full artifact set still lands (res over epochs 1..2 appended)
    files = os.listdir(save_dir)
    assert any(f.endswith("_weights.p") for f in files)
    assert any(f.endswith("_res.json") for f in files)


@pytest.mark.slow
def test_preempt_disabled_flag_ignores_sigterm_flagging(synth,
                                                        tmp_path_factory):
    """-preempt_save 0: the flag is never polled, no snapshot is written,
    training runs to completion even with the preempt flag raised."""
    save_dir = str(tmp_path_factory.mktemp("save_nopreempt"))
    trainer = Trainer(_cfg(synth, save_dir, preempt_save=0, num_epochs=1),
                      ["exp", "cpk", "speaker", "model", "note"], {})
    trainer.start_exp()
    trainer.request_preempt()
    trainer.train(exp_num=1)  # must not raise
    trainer.finish_exp()
    assert not os.path.exists(trainer.book._preempt_paths()[0])


@pytest.mark.slow
def test_train_cli_exits_75_on_sigterm_and_resumes(synth, tmp_path_factory):
    """Scheduler contract: cli.train under SIGTERM exits 75 (EX_TEMPFAIL)
    with the snapshot on disk; the SAME rerun command completes with rc 0."""
    save_dir = str(tmp_path_factory.mktemp("save_cli_preempt"))
    driver = (
        "import jax, sys; jax.config.update('jax_platforms','cpu'); "
        "jax.config.update('jax_compilation_cache_dir','/tmp/jax_test_cache');"
        " from mixstage_tpu.cli.train import main; main()")
    argv = [sys.executable, "-u", "-c", driver,
            "-path2data", synth, "-speaker", '["oliver"]',
            "-model", "Speech2Gesture_G", "-gan", "0", "-loss", "L1Loss",
            "-batch_size", "4", "-num_epochs", "50", "-window_hop", "5",
            "-num_iters", "2", "-debug", "2", "-metrics", "0", "-render", "0",
            "-save_dir", save_dir, "-exp", "7"]
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.Popen(argv, stdout=subprocess.PIPE,
                            stderr=subprocess.STDOUT, text=True, env=env)
    # wait for the first epoch line, then preempt
    deadline = time.time() + 600
    lines = []
    for line in proc.stdout:
        lines.append(line)
        if line.startswith("exp:") or time.time() > deadline:
            break
    assert any(l.startswith("exp:") for l in lines), "".join(lines)[-2000:]
    proc.send_signal(signal.SIGTERM)
    rc = proc.wait(timeout=600)
    tail = "".join(lines) + proc.stdout.read()
    assert rc == 75, tail[-2000:]
    assert "preempted" in tail
    assert list(Path(save_dir).glob("*_preempt.p")), os.listdir(save_dir)

    # rerun the SAME command with a short horizon: resumes and completes
    argv[argv.index("-num_epochs") + 1] = "2"
    done = subprocess.run(argv, capture_output=True, text=True, env=env,
                          timeout=600)
    assert done.returncode == 0, done.stdout[-2000:] + done.stderr[-2000:]
    assert "resuming from preemption checkpoint" in \
        done.stdout + done.stderr
    assert not list(Path(save_dir).glob("*_preempt.p"))
