"""ops.bucketing is the ONE copy of the padded-batch semantics shared by
serving (PoseService._bucket) and sampling (_flatten_windows) — VERDICT r4
item 7: the two paths must be structurally unable to drift on bucket choice
or pad fill."""

import numpy as np
import pytest

from mixstage_tpu.ops.bucketing import next_pow2, pad_repeat_last, pow2_pad
from mixstage_tpu.serving.server import DynamicBatcher, PoseService
from mixstage_tpu.train import sampling


def test_next_pow2_floor_chain():
    # floor need not be a power of two: buckets are floor * 2^k
    assert next_pow2(1) == 1
    assert next_pow2(5) == 8
    assert next_pow2(8) == 8
    assert next_pow2(1, floor=64) == 64
    assert next_pow2(64, floor=64) == 64
    assert next_pow2(65, floor=64) == 128
    assert next_pow2(300, floor=64) == 512
    with pytest.raises(ValueError):
        next_pow2(0)


def test_pow2_pad_repeat_last_and_true_len():
    a = np.arange(10, dtype=np.float32).reshape(5, 2)
    padded, true_len = pow2_pad(a, floor=4)
    assert padded.shape == (8, 2) and true_len == 5
    np.testing.assert_array_equal(padded[:5], a)
    np.testing.assert_array_equal(padded[5:], np.repeat(a[-1:], 3, axis=0))
    # exact-bucket input: no pad, no trim signal
    same, none = pow2_pad(a[:4], floor=4)
    assert none is None and same.shape == (4, 2)


def test_serving_bucket_is_the_shared_function():
    """PoseService._bucket must agree with ops.bucketing.pow2_pad for every
    length in a sweep — bucket choice AND pad fill."""
    b = DynamicBatcher(lambda a, s: a[..., :1], batch_size=2, max_wait_ms=1.0)
    try:
        service = PoseService(b, backend="test", frames=64, max_frames=4096)
        rng = np.random.default_rng(0)
        for T in (1, 3, 63, 64, 65, 127, 128, 300, 511, 512):
            audio = rng.normal(size=(T, 6)).astype(np.float32)
            got, got_len = service._bucket(audio, waveform=False)
            want, want_len = pow2_pad(audio, floor=64)
            assert got_len == want_len, T
            np.testing.assert_array_equal(got, want)
    finally:
        b.close()


def test_sampling_flatten_uses_the_shared_pad():
    """_flatten_one's window-count padding is pad_repeat_last (by identity
    of output), and sample_loop's bucket choice is next_pow2."""
    v = np.arange(24, dtype=np.float32).reshape(3, 4, 2)
    flat = sampling._flatten_one(v, pad_to=4)
    want = pad_repeat_last(v, 4).reshape(1, -1, 2)
    np.testing.assert_array_equal(flat, want)
    # the symbol sample_loop pads with IS the shared one (no local clone)
    assert sampling.next_pow2 is next_pow2
    assert sampling.pad_repeat_last is pad_repeat_last
    assert not hasattr(sampling, "_next_pow2")


def test_cross_path_bucket_equality():
    """For any work-list length, serving's frame bucket and sampling's
    window bucket land on the same pow-2 chain value given the same floor."""
    for n in range(1, 600, 7):
        assert next_pow2(n, floor=64) == 64 * next_pow2(
            -(-n // 64))  # ceil-div then pow2 of the multiple
