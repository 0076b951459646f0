"""Streaming inference tests (mixstage_tpu/streaming.py).

Logic properties are pinned with a deterministic fake window-inference fn
(crossfade math, chunk invariance, finalization latency, tail flush), then
the whole path runs over the real serving graph once.
"""

import numpy as np
import pytest

from mixstage_tpu.streaming import StreamingSession, session_over_serving_fn

MEL, F = 8, 3


def fake_infer(window, style):
    """Deterministic, window-content-dependent: frame i of the output mixes
    the mel frame i with the WINDOW MEAN (so output depends on the whole
    window, like the real bottleneck does) + the style id."""
    window = np.asarray(window, np.float32)
    mean = window.mean(axis=0, keepdims=True)
    out = window[:, :F] + mean[:, :F] + np.float32(style)
    return out


def _mel(n, seed=0):
    return np.random.default_rng(seed).normal(size=(n, MEL)).astype(
        np.float32)


def _stream_all(session, frames, chunk):
    pieces = [session.feed(frames[i:i + chunk])
              for i in range(0, len(frames), chunk)]
    pieces.append(session.finish())
    return np.concatenate([p for p in pieces if p.size], axis=0)


def test_single_window_matches_direct_inference():
    x = _mel(64)
    s = StreamingSession(fake_infer, style=1, window=64, hop=32)
    out = _stream_all(s, x, chunk=64)
    np.testing.assert_array_equal(out, fake_infer(x, 1))


def test_crossfade_is_convex_and_matches_manual_stitch():
    x = _mel(160, seed=3)
    s = StreamingSession(fake_infer, style=0, window=64, hop=32)
    out = _stream_all(s, x, chunk=160)
    assert out.shape == (160, F)

    # manual reference: windows at 0,32,64,96 (160 frames = full coverage,
    # so NO padded tail window runs), each fading in linearly over its
    # first 32 overlapped frames
    stitched = np.zeros((160, F), np.float32)
    ramp = np.concatenate([np.arange(1, 33, dtype=np.float32) / 33,
                           np.ones(32, np.float32)])
    for start in range(0, 97, 32):
        w = ramp if start else np.ones(64, np.float32)
        pose = fake_infer(x[start:start + 64], 0)
        stitched[start:start + 64] *= (1 - w)[:, None]
        stitched[start:start + 64] += w[:, None] * pose
    np.testing.assert_allclose(out, stitched, rtol=1e-6, atol=1e-6)

    # convexity: every streamed frame lies within the per-window output
    # envelope (crossfade never extrapolates)
    lo = np.full((160, F), np.inf, np.float32)
    hi = np.full((160, F), -np.inf, np.float32)
    for st in range(0, 97, 32):
        pose = fake_infer(x[st:st + 64], 0)
        lo[st:st + 64] = np.minimum(lo[st:st + 64], pose)
        hi[st:st + 64] = np.maximum(hi[st:st + 64], pose)
    assert (out >= lo - 1e-5).all() and (out <= hi + 1e-5).all()


def test_chunk_size_invariance():
    """Frame-at-a-time == all-at-once, bit-identical."""
    x = _mel(150, seed=7)
    ref = _stream_all(StreamingSession(fake_infer, 2, 64, 32), x, chunk=150)
    for chunk in (1, 5, 64, 97):
        got = _stream_all(StreamingSession(fake_infer, 2, 64, 32), x, chunk)
        np.testing.assert_array_equal(got, ref, err_msg=f"chunk={chunk}")


def test_finalization_latency_bound():
    """A frame is emitted within `window` further input frames."""
    x = _mel(256, seed=9)
    s = StreamingSession(fake_infer, 0, window=64, hop=32)
    emitted = 0
    for i in range(256):
        emitted += len(s.feed(x[i]))
        if i >= 64:  # warmup: first window needs 64 frames
            assert emitted >= i - 64, (i, emitted)
    emitted += len(s.finish())
    assert emitted == 256


def test_tail_flush_and_guards():
    x = _mel(40)  # shorter than one window
    s = StreamingSession(fake_infer, 0, window=64, hop=32)
    assert s.feed(x).size == 0
    out = s.finish()
    assert out.shape == (40, F)
    # padded tail: matches direct inference on the repeat-padded window
    xp = np.concatenate([x, np.repeat(x[-1:], 24, axis=0)])
    np.testing.assert_allclose(out, fake_infer(xp, 0)[:40], rtol=1e-6)
    with pytest.raises(RuntimeError):
        s.feed(x)
    with pytest.raises(ValueError):
        StreamingSession(fake_infer, 0, window=64, hop=0)
    with pytest.raises(ValueError):
        StreamingSession(fake_infer, 0, window=64, hop=65)
    # hop == window: no overlap, plain concatenation
    s2 = StreamingSession(fake_infer, 0, window=64, hop=64)
    out2 = _stream_all(s2, _mel(128, 1), chunk=50)
    direct = np.concatenate([fake_infer(_mel(128, 1)[:64], 0),
                             fake_infer(_mel(128, 1)[64:], 0)])
    np.testing.assert_allclose(out2, direct, rtol=1e-6)


def test_buffers_stay_bounded_for_long_sessions():
    """Self-review r4: a session must hold only the live window suffix —
    hours-long real-time streams previously kept every mel + pose frame
    (linear memory, quadratic stitch cost)."""
    x = _mel(64 * 40, seed=11)
    s = StreamingSession(fake_infer, 0, window=64, hop=32)
    ref = _stream_all(StreamingSession(fake_infer, 0, 64, 32), x, len(x))
    got = []
    for i in range(0, len(x), 32):
        got.append(s.feed(x[i:i + 32]))
        # live buffers never exceed ~2 windows regardless of stream length
        assert len(s._in) <= 2 * 64, len(s._in)
        assert s._out is None or s._out.shape[0] <= 2 * 64, s._out.shape
    got.append(s.finish())
    np.testing.assert_array_equal(np.concatenate([g for g in got if g.size]),
                                  ref)


def test_finish_is_retry_safe_after_transient_failure():
    """Self-review r4: a transient infer failure inside finish() (batcher
    overload / timeout) must not leave padding frames in the buffer — a
    retried finish() previously emitted them as real pose output."""
    calls = {"n": 0, "fail": False}

    def flaky(window, style):
        calls["n"] += 1
        if calls["fail"]:
            calls["fail"] = False
            raise RuntimeError("device overloaded")
        return fake_infer(window, style)

    x = _mel(40, seed=13)
    s = StreamingSession(flaky, 0, window=64, hop=32)
    s.feed(x)
    calls["fail"] = True
    with pytest.raises(RuntimeError, match="overloaded"):
        s.finish()
    out = s.finish()  # retry must succeed AND emit exactly the true frames
    assert out.shape == (40, F)
    xp = np.concatenate([x, np.repeat(x[-1:], 24, axis=0)])
    np.testing.assert_allclose(out, fake_infer(xp, 0)[:40], rtol=1e-6)


def test_session_over_static_batch_artifact_fn():
    """Self-review r4: artifact loaders have a STATIC batch B>1; the session
    wrapper must tile its single window to B instead of submitting batch 1
    (which the loader's static-shape guard rejects)."""
    Bstat = 4

    def batched_fn(audio, style):
        assert audio.shape[0] == Bstat, f"got batch {audio.shape[0]}"
        assert style.shape[0] == Bstat
        return np.stack([fake_infer(audio[i], style[i])
                         for i in range(Bstat)])

    batched_fn.frames = 64
    batched_fn.static_batch = Bstat
    x = _mel(96, seed=17)
    sess = session_over_serving_fn(batched_fn, style=2, hop=32)
    out = _stream_all(sess, x, chunk=40)
    ref = _stream_all(StreamingSession(fake_infer, 2, 64, 32), x, chunk=40)
    np.testing.assert_allclose(out, ref, rtol=1e-6)


def test_streaming_over_real_serving_graph(tiny_exp):
    """End-to-end over the BN-folded serving fn: stream 160 frames, assert
    coverage, determinism, and that non-overlap frames equal the raw
    window inference (crossfade only touches overlaps)."""
    import jax

    from mixstage_tpu.serve import build_serving_fn

    factory, state, _, _ = tiny_exp
    serve = build_serving_fn(factory, state, use_pallas=False)
    sess = session_over_serving_fn(serve, style=1, hop=32)
    x = _mel(160, seed=11)
    # widen mel to the model's 128 bins
    x = np.tile(x, (1, 16))
    out = np.concatenate([p for p in (sess.feed(x[:100]), sess.feed(x[100:]),
                                      sess.finish()) if p.size])
    assert out.shape == (160, 96)
    assert np.isfinite(out).all()

    # window 0's first 32 frames carry no overlap: must equal the raw call
    raw0 = np.asarray(serve(x[None, :64], np.asarray([1])))[0]
    np.testing.assert_allclose(out[:32], raw0[:32], rtol=1e-5, atol=1e-6)

    # determinism
    sess2 = session_over_serving_fn(serve, style=1, hop=32)
    out2 = np.concatenate([p for p in (sess2.feed(x), sess2.finish())
                           if p.size])
    np.testing.assert_array_equal(out, out2)
