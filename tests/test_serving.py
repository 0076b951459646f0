"""Serving endpoint tests: dynamic batcher + HTTP front door.

TPU-native addition (SURVEY.md north star mentions production serving; the
reference has no online inference surface).  The jitted serving graph has a
static batch — these tests pin the micro-batching semantics (gather window,
padding, scatter, error propagation) and the stdlib HTTP protocol.
"""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from mixstage_tpu.serving import (DynamicBatcher, PoseService,
                                  start_http_server)

T_MEL, MEL, FEATS = 8, 6, 4


def fake_serve(calls):
    """pose[b] = audio[b] summed per row, tiled to FEATS — per-request
    identifiable so scatter order is checkable."""
    def fn(audio, style):
        calls.append((audio.shape, tuple(style.tolist())))
        base = audio.sum(-1, keepdims=True)          # (B, T, 1)
        return base + style[:, None, None] * 1000.0  # broadcast to (B, T, 1)
    return fn


def test_batcher_batches_pads_and_scatters():
    calls = []
    b = DynamicBatcher(fake_serve(calls), batch_size=4, max_wait_ms=50.0)
    try:
        audios = [np.full((T_MEL, MEL), i, np.float32) for i in range(5)]
        futs = [b.submit(a, style=i) for i, a in enumerate(audios)]
        results = [f.result(10) for f in futs]
        for i, r in enumerate(results):
            expect = i * MEL + i * 1000.0
            np.testing.assert_allclose(r[:, 0], expect)
        # every device call used the static batch shape
        assert all(shape == (4, T_MEL, MEL) for shape, _ in calls)
        st = b.stats()
        assert st["requests"] == 5
        assert st["batches"] >= 2          # 5 requests can't fit one batch of 4
        assert st["latency_ms_p50"] is not None
    finally:
        b.close()


def test_batcher_propagates_errors():
    def boom(audio, style):
        raise RuntimeError("device on fire")

    b = DynamicBatcher(boom, batch_size=2, max_wait_ms=1.0)
    try:
        fut = b.submit(np.zeros((T_MEL, MEL), np.float32), 0)
        with pytest.raises(RuntimeError, match="device on fire"):
            fut.result(10)
    finally:
        b.close()


def test_batcher_single_request_latency_bounded():
    calls = []
    b = DynamicBatcher(fake_serve(calls), batch_size=32, max_wait_ms=20.0)
    try:
        t0 = time.perf_counter()
        r = b.submit(np.ones((T_MEL, MEL), np.float32), 0).result(10)
        wall = time.perf_counter() - t0
        assert r.shape[0] == T_MEL
        assert wall < 5.0  # gather window + dispatch, not forever
        assert calls[0][0] == (32, T_MEL, MEL)  # padded to static shape
    finally:
        b.close()


@pytest.fixture
def http_service():
    calls = []
    batcher = DynamicBatcher(fake_serve(calls), batch_size=4, max_wait_ms=2.0)
    service = PoseService(batcher, backend="cpu-test")
    server = start_http_server(service, port=0)
    port = server.server_address[1]
    yield f"http://127.0.0.1:{port}"
    server.shutdown()
    batcher.close()


def test_http_pose_json_and_health(http_service):
    audio = np.ones((T_MEL, MEL)).tolist()
    req = urllib.request.Request(
        http_service + "/v1/pose",
        data=json.dumps({"audio": audio, "style": 2}).encode(),
        headers={"Content-Type": "application/json"})
    out = json.loads(urllib.request.urlopen(req, timeout=10).read())
    np.testing.assert_allclose(np.asarray(out["pose"])[:, 0],
                               MEL + 2 * 1000.0)

    health = json.loads(urllib.request.urlopen(
        http_service + "/healthz", timeout=10).read())
    assert health["ok"] and health["batch_size"] == 4

    stats = json.loads(urllib.request.urlopen(
        http_service + "/stats", timeout=10).read())
    assert stats["requests"] >= 1


def test_http_pose_npz_binary(http_service):
    import io

    buf = io.BytesIO()
    np.savez(buf, audio=np.full((T_MEL, MEL), 3.0, np.float32), style=1)
    req = urllib.request.Request(
        http_service + "/v1/pose", data=buf.getvalue(),
        headers={"Content-Type": "application/octet-stream"})
    body = urllib.request.urlopen(req, timeout=10).read()
    pose = np.load(io.BytesIO(body))
    np.testing.assert_allclose(pose[:, 0], 3.0 * MEL + 1000.0)


def test_pose_client_roundtrip(http_service):
    from mixstage_tpu.serving import PoseClient

    client = PoseClient(http_service)
    assert client.health()["ok"]
    pose = client.pose(np.full((T_MEL, MEL), 2.0, np.float32), style=1)
    np.testing.assert_allclose(pose[:, 0], 2.0 * MEL + 1000.0)
    assert client.stats()["requests"] >= 1


def test_http_bad_request_is_400(http_service):
    req = urllib.request.Request(
        http_service + "/v1/pose", data=b"{not json",
        headers={"Content-Type": "application/json"})
    try:
        urllib.request.urlopen(req, timeout=10)
        raise AssertionError("expected HTTP 400")
    except urllib.error.HTTPError as e:
        assert e.code == 400
        assert "error" in json.loads(e.read())


def test_http_concurrent_requests_batch_together(http_service):
    audio = json.dumps({"audio": np.ones((T_MEL, MEL)).tolist(),
                        "style": 0}).encode()
    results = []

    def hit():
        req = urllib.request.Request(
            http_service + "/v1/pose", data=audio,
            headers={"Content-Type": "application/json"})
        results.append(json.loads(
            urllib.request.urlopen(req, timeout=15).read()))

    threads = [threading.Thread(target=hit) for _ in range(8)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert len(results) == 8
    stats = json.loads(urllib.request.urlopen(
        http_service + "/stats", timeout=10).read())
    # batching actually happened: fewer device calls than requests
    assert stats["batches"] < stats["requests"]


def test_http_soft_style_mixture():
    """With num_styles set, scalar ids one-hot encode and mixture-weight
    lists ride through — both shapes batch together."""
    calls = []

    def soft_serve(audio, style):  # style arrives as (B, S) weights
        calls.append(style.shape)
        return audio.sum(-1, keepdims=True) + style[:, :1, None] * 100.0

    batcher = DynamicBatcher(soft_serve, batch_size=2, max_wait_ms=20.0)
    service = PoseService(batcher, num_styles=3)
    server = start_http_server(service, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        audio = np.zeros((T_MEL, MEL)).tolist()

        def post(style):
            req = urllib.request.Request(
                base + "/v1/pose",
                data=json.dumps({"audio": audio, "style": style}).encode(),
                headers={"Content-Type": "application/json"})
            return np.asarray(json.loads(
                urllib.request.urlopen(req, timeout=15).read())["pose"])

        hard = post(0)                       # id 0 → one-hot [1,0,0]
        soft = post([0.5, 0.5, 0.0])         # mixture weights
        np.testing.assert_allclose(hard[:, 0], 100.0)
        np.testing.assert_allclose(soft[:, 0], 50.0)
        assert all(s == (2, 3) for s in calls)
        # wrong-length mixture → 400
        req = urllib.request.Request(
            base + "/v1/pose",
            data=json.dumps({"audio": audio, "style": [1.0, 0.0]}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=15)
            raise AssertionError("expected HTTP 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()
        batcher.close()


def test_http_waveform_endpoint_routing():
    """/v1/pose_from_waveform routes to the waveform batcher; a server
    without one answers 400 with a clear error."""
    calls_mel, calls_wav = [], []
    mel_b = DynamicBatcher(fake_serve(calls_mel), batch_size=2,
                           max_wait_ms=2.0)
    wav_b = DynamicBatcher(fake_serve(calls_wav), batch_size=2,
                           max_wait_ms=2.0)
    service = PoseService(mel_b, waveform_batcher=wav_b)
    server = start_http_server(service, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        body = json.dumps({"audio": np.ones((T_MEL, MEL)).tolist(),
                           "style": 0}).encode()
        # the waveform endpoint takes raw 1-D samples, not a mel matrix
        wav_body = json.dumps({"audio": np.ones((160,)).tolist(),
                               "style": 0}).encode()
        for path, data in (("/v1/pose", body),
                           ("/v1/pose_from_waveform", wav_body)):
            req = urllib.request.Request(
                base + path, data=data,
                headers={"Content-Type": "application/json"})
            urllib.request.urlopen(req, timeout=15).read()
        assert len(calls_mel) == 1 and len(calls_wav) == 1
    finally:
        server.shutdown()
        mel_b.close()
        wav_b.close()

    # not configured → 404 with the configuration hint
    b2 = DynamicBatcher(fake_serve([]), batch_size=2, max_wait_ms=2.0)
    server2 = start_http_server(PoseService(b2), port=0)
    try:
        req = urllib.request.Request(
            f"http://127.0.0.1:{server2.server_address[1]}"
            "/v1/pose_from_waveform", data=wav_body,
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=15)
            raise AssertionError("expected HTTP 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404
            assert "not configured" in json.loads(e.read())["error"]
    finally:
        server2.shutdown()
        b2.close()


@pytest.mark.slow
def test_batcher_over_real_serving_fn():
    """End to end over the real jitted serving path (CPU): batched-with-
    padding answers match a direct full-batch serve call."""
    import jax
    import jax.numpy as jnp

    from mixstage_tpu.serve import build_serving_fn
    from mixstage_tpu.train.steps import StepConfig, StepFactory

    cfg = StepConfig(model="JointLateClusterSoftStyle4_G", gan=True,
                     criterion="L1Loss", num_clusters=4, num_speakers=2)
    factory = StepFactory(cfg, donate=False)
    rng = np.random.default_rng(0)
    B, T = 4, 64
    batch = {
        "x": (jnp.asarray(rng.normal(size=(B, T, 128)), jnp.float32),),
        "y": jnp.asarray(rng.normal(size=(B, T, 96)), jnp.float32),
        "labels": jnp.asarray(rng.integers(0, 4, size=(B, T))),
        "style": jnp.asarray(np.zeros((B, T)), jnp.int32),
    }
    state = factory.init(jax.random.key(0), batch)
    serve = build_serving_fn(factory, state, use_pallas=False)

    audio = np.asarray(rng.normal(size=(B, T, 128)), np.float32)
    styles = np.asarray([0, 1, 0, 1], np.int32)
    ref = np.asarray(serve(jnp.asarray(audio), jnp.asarray(styles)))

    batcher = DynamicBatcher(
        lambda a, s: serve(jnp.asarray(a), jnp.asarray(s)),
        batch_size=B, max_wait_ms=50.0)
    try:
        futs = [batcher.submit(audio[i], int(styles[i])) for i in range(3)]
        got = [f.result(120) for f in futs]  # 3 requests → padded batch of 4
        for i in range(3):
            np.testing.assert_allclose(got[i], ref[i], rtol=1e-5, atol=1e-5)

        # arbitrary-length request via the service's pow-2 bucketing over
        # the SAME real graph: a 50-frame clip pads to the already-compiled
        # 64-frame bucket and trims back; the prefix matches the direct
        # call on the padded window
        service = PoseService(batcher, num_styles=2, mel_bins=128, frames=T)
        short = audio[0][:50]
        out = np.asarray(service.infer_json(
            {"audio": short.tolist(), "style": int(styles[0])})["pose"])
        assert out.shape[0] == 50
        padded = np.concatenate([short, np.repeat(short[-1:], T - 50, 0)])
        direct = np.asarray(serve(
            jnp.asarray(np.repeat(padded[None], B, 0)),
            jnp.asarray(np.full((B,), styles[0], np.int32))))[0][:50]
        np.testing.assert_allclose(out, direct, rtol=1e-5, atol=1e-5)
    finally:
        batcher.close()

    # soft style weights: one-hot rows == hard ids exactly; a mixture is a
    # distinct, finite output (online -mix semantics)
    onehot = np.eye(2, dtype=np.float32)[styles]
    np.testing.assert_array_equal(
        np.asarray(serve(jnp.asarray(audio), jnp.asarray(onehot))), ref)
    mix = np.full((B, 2), 0.5, np.float32)
    pose_mix = np.asarray(serve(jnp.asarray(audio), jnp.asarray(mix)))
    assert np.isfinite(pose_mix).all()
    assert not np.allclose(pose_mix, ref)


def test_poison_request_cannot_kill_the_server():
    """VERDICT r3 weak #1: a malformed request must answer 400 and leave
    the batcher worker alive — a subsequent valid request still gets 200.
    (Previously np.stack of a wrong-shape batch killed the worker thread
    and every later request hung to its timeout.)"""
    calls = []
    batcher = DynamicBatcher(fake_serve(calls), batch_size=4,
                             max_wait_ms=2.0, input_shape=(None, MEL))
    service = PoseService(batcher, backend="test", mel_bins=MEL)
    server = start_http_server(service, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def post(audio, style=0):
        req = urllib.request.Request(
            base + "/v1/pose",
            data=json.dumps({"audio": audio, "style": style}).encode(),
            headers={"Content-Type": "application/json"})
        return json.loads(urllib.request.urlopen(req, timeout=10).read())

    try:
        bad_payloads = [
            np.ones((T_MEL, MEL + 1)).tolist(),    # wrong mel width
            np.ones((T_MEL,)).tolist(),            # 1-D, not (T, mel)
            [[1.0, 2.0], [3.0]],                   # ragged nesting
            "not audio at all",                    # wrong type
        ]
        for bad in bad_payloads:
            try:
                post(bad)
                raise AssertionError(f"expected 400 for {type(bad)}")
            except urllib.error.HTTPError as e:
                assert e.code == 400, f"{bad!r} → {e.code}"
        # missing audio field is 400 too
        req = urllib.request.Request(
            base + "/v1/pose", data=json.dumps({"style": 0}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected 400")
        except urllib.error.HTTPError as e:
            assert e.code == 400
        # out-of-range / malformed style ids (num_styles-aware service)
        svc2 = PoseService(batcher, num_styles=3)
        for bad_style in (99, -1, [[0.5, 0.5]]):
            with pytest.raises(ValueError):
                svc2._style(bad_style)

        # the worker thread survived: a valid request still answers
        out = post(np.full((T_MEL, MEL), 2.0).tolist(), style=1)
        np.testing.assert_allclose(np.asarray(out["pose"])[:, 0],
                                   2.0 * MEL + 1000.0)
    finally:
        server.shutdown()
        batcher.close()


def test_batcher_sheds_with_429_when_overloaded():
    """Bounded queue: beyond max_queue, submits shed with Overloaded
    (HTTP 429) instead of growing memory; /stats counts the drops."""
    release = threading.Event()
    started = threading.Event()

    def slow_serve(audio, style):
        started.set()
        release.wait(20)
        return audio.sum(-1, keepdims=True)

    batcher = DynamicBatcher(slow_serve, batch_size=2, max_wait_ms=1.0,
                             max_queue=3)
    service = PoseService(batcher, backend="test")
    server = start_http_server(service, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    audio = np.ones((T_MEL, MEL), np.float32)
    try:
        # the worker drains up to batch_size immediately, then blocks in
        # slow_serve; fill the queue past its bound
        futs, shed = [], 0
        from mixstage_tpu.serving import Overloaded
        for _ in range(12):
            try:
                futs.append(batcher.submit(audio, 0))
            except Overloaded:
                shed += 1
        assert shed >= 12 - 3 - batcher.batch_size - 1
        assert batcher.stats()["shed"] == shed
        assert batcher.stats()["queue_depth"] <= 3

        # wait until the worker is parked inside slow_serve, then top the
        # queue back up to its bound so the next submit MUST shed
        assert started.wait(10)
        while True:
            try:
                futs.append(batcher.submit(audio, 0))
            except Overloaded:
                break
        assert batcher.stats()["queue_depth"] == 3

        # over HTTP the shed surfaces as 429
        req = urllib.request.Request(
            base + "/v1/pose",
            data=json.dumps({"audio": audio.tolist(), "style": 0}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected HTTP 429")
        except urllib.error.HTTPError as e:
            assert e.code == 429
    finally:
        release.set()
        server.shutdown()
        batcher.close()


def test_batcher_groups_mismatched_shapes_instead_of_crashing():
    """Requests with different T (or style form) cannot share one np.stack;
    the batcher partitions them into separate device batches and everyone
    still gets a correct answer."""
    calls = []
    b = DynamicBatcher(fake_serve(calls), batch_size=4, max_wait_ms=30.0)
    try:
        a_short = np.full((T_MEL, MEL), 1.0, np.float32)
        a_long = np.full((T_MEL + 4, MEL), 2.0, np.float32)
        futs = [b.submit(a_short, 0), b.submit(a_long, 1),
                b.submit(a_short, 2),
                b.submit(a_short, np.array([0.5, 0.5], np.float32))]
        rs = [f.result(15) for f in futs]
        np.testing.assert_allclose(rs[0][:, 0], 1.0 * MEL)
        np.testing.assert_allclose(rs[1][:, 0], 2.0 * MEL + 1000.0)
        np.testing.assert_allclose(rs[2][:, 0], 1.0 * MEL + 2000.0)
        assert np.isfinite(np.asarray(rs[3])).all()  # soft req got a batch
        # three distinct batch keys → three device calls, all static-B
        assert len(calls) == 3
        assert all(shape[0] == 4 for shape, _ in calls)
    finally:
        b.close()


def test_http_fuzz_never_kills_the_server():
    """Robustness property: arbitrary garbage over HTTP always gets an
    orderly 4xx (never a hang, never a dead worker); a valid request still
    succeeds afterwards."""
    # style-form-agnostic fake: with num_styles set, the service one-hot
    # encodes scalar ids, so the batcher hands the fn (B, S) style vectors
    def fn(audio, style):
        sid = np.asarray(style)
        sid = sid if sid.ndim == 1 else sid.argmax(-1)
        return audio.sum(-1, keepdims=True) + sid[:, None, None] * 1000.0

    b = DynamicBatcher(fn, batch_size=2, max_wait_ms=2.0,
                       input_shape=(None, MEL))
    service = PoseService(b, backend="test", mel_bins=MEL, num_styles=4)
    server = start_http_server(service, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    rng = np.random.default_rng(23)

    bodies = [
        b"",                                   # empty
        b"\x00\xff\xfe garbage",               # binary junk as JSON
        b"[1,2,3]",                            # JSON, wrong type
        b'{"audio": null}',                    # null audio
        b'{"audio": {}}',                      # dict audio
        b'{"audio": [[1e999]]}',               # inf literal
        json.dumps({"audio": [[float("nan")] * MEL] * 4}).encode(),
        rng.bytes(256),                        # random bytes
        json.dumps({"audio": [[1] * MEL] * 4, "style": "oliver"}).encode(),
        json.dumps({"audio": [[1] * MEL] * 4,
                    "style": [[0.5] * 4]}).encode(),
    ]
    paths = ["/v1/pose", "/v1/stream/doesnotexist",
             "/v1/stream/x/finish", "/v1/bogus", "/v1/pose_from_waveform"]
    try:
        for path in paths:
            for body in bodies:
                req = urllib.request.Request(
                    base + path, data=body,
                    headers={"Content-Type": "application/json"})
                try:
                    urllib.request.urlopen(req, timeout=10)
                except urllib.error.HTTPError as e:
                    assert 400 <= e.code < 500, (path, body[:30], e.code)
                # a 200 is acceptable only for well-formed payloads; the
                # invariant under fuzz is: no 5xx, no hang, no thread death
        # server still serves
        req = urllib.request.Request(
            base + "/v1/pose",
            data=json.dumps({"audio": np.ones((T_MEL, MEL)).tolist(),
                             "style": 1}).encode(),
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(req, timeout=10).read())
        pose = np.asarray(out["pose"])
        assert np.isfinite(pose).all()
        assert pose.shape[0] == T_MEL  # pow-2 padding trimmed back off
    finally:
        server.shutdown()
        b.close()


def test_arbitrary_length_requests_bucket_to_pow2():
    """Checkpoint-mode servers pad mel windows to power-of-two frame
    buckets (repeat-last-frame) and trim the pose back: arbitrary T is
    valid (the UNet needs T % 32 == 0), compiles stay bounded, and
    same-bucket requests share device batches."""
    calls = []
    b = DynamicBatcher(fake_serve(calls), batch_size=4, max_wait_ms=2.0)
    service = PoseService(b, backend="test", mel_bins=MEL, frames=64)
    server = start_http_server(service, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"

    def post(n_frames, fill):
        audio = np.full((n_frames, MEL), fill, np.float32)
        req = urllib.request.Request(
            base + "/v1/pose",
            data=json.dumps({"audio": audio.tolist(), "style": 0}).encode(),
            headers={"Content-Type": "application/json"})
        return np.asarray(json.loads(
            urllib.request.urlopen(req, timeout=15).read())["pose"])

    try:
        p50 = post(50, 1.0)     # → bucket 64, trimmed back to 50
        p100 = post(100, 2.0)   # → bucket 128
        p64 = post(64, 3.0)     # exact bucket: no padding
        assert p50.shape[0] == 50 and p100.shape[0] == 100 \
            and p64.shape[0] == 64
        np.testing.assert_allclose(p50[:, 0], 1.0 * MEL)
        np.testing.assert_allclose(p100[:, 0], 2.0 * MEL)
        np.testing.assert_allclose(p64[:, 0], 3.0 * MEL)
        # device calls saw only pow-2 bucket shapes
        assert sorted({shape[1] for shape, _ in calls}) == [64, 128]
        # AOT (static-frames) servers still validate instead of pad
        svc2 = PoseService(b, mel_bins=MEL, static_frames=64)
        with pytest.raises(ValueError, match="compiled for exactly"):
            svc2.infer_json({"audio": np.ones((50, MEL)).tolist()})
    finally:
        server.shutdown()
        b.close()


def test_stream_session_cap_and_float_style_rejection():
    """Self-review r4: a live-session cap bounds abandoned-stream memory
    (429 beyond it), and a non-integer scalar style is a 400, not a silent
    truncation to int."""
    calls = []
    b = DynamicBatcher(fake_serve(calls), batch_size=2, max_wait_ms=2.0)
    service = PoseService(b, backend="test", frames=T_MEL, max_streams=3)
    server = start_http_server(service, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        def open_stream():
            req = urllib.request.Request(
                base + "/v1/stream", data=json.dumps({"style": 0}).encode(),
                headers={"Content-Type": "application/json"})
            return json.loads(urllib.request.urlopen(req, timeout=10).read())

        sids = [open_stream()["session"] for _ in range(3)]
        try:
            open_stream()
            raise AssertionError("expected 429 past the session cap")
        except urllib.error.HTTPError as e:
            assert e.code == 429
        # closing one frees a slot
        req = urllib.request.Request(f"{base}/v1/stream/{sids[0]}",
                                     method="DELETE")
        urllib.request.urlopen(req, timeout=10)
        assert open_stream()["session"]

        # float style id → 400 (was silently truncated to int before)
        req = urllib.request.Request(
            base + "/v1/pose",
            data=json.dumps({"audio": np.ones((T_MEL, MEL)).tolist(),
                             "style": 1.9}).encode(),
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=10)
            raise AssertionError("expected 400 for float style")
        except urllib.error.HTTPError as e:
            assert e.code == 400
            assert "integer id" in json.loads(e.read())["error"]
    finally:
        server.shutdown()
        b.close()


def test_http_streaming_sessions_end_to_end():
    """Open → feed → finish over HTTP matches a local StreamingSession on
    the same fake model; sessions ride the shared batcher and are dropped
    after finish/DELETE; unknown ids surface as client errors."""
    from mixstage_tpu.serving import PoseClient
    from mixstage_tpu.streaming import StreamingSession

    calls = []
    b = DynamicBatcher(fake_serve(calls), batch_size=4, max_wait_ms=2.0)
    service = PoseService(b, backend="test", frames=T_MEL)
    server = start_http_server(service, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    client = PoseClient(base)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(12, MEL)).astype(np.float32)
    try:
        stream = client.stream(style=3, hop=4)
        assert stream.window == T_MEL and stream.hop == 4

        got = [stream.feed(x[:8]), stream.feed(x[8:]), stream.finish()]
        out = np.concatenate([g for g in got if g.size])

        ref_sess = StreamingSession(
            lambda w, s: np.asarray(fake_serve([])(w[None],
                                                   np.asarray([s]))[0]),
            style=3, window=T_MEL, hop=4)
        ref = np.concatenate([p for p in (ref_sess.feed(x),
                                          ref_sess.finish()) if p.size])
        np.testing.assert_allclose(out, ref, rtol=1e-6)
        assert out.shape[0] == 12

        # session is gone after finish
        stats = json.loads(urllib.request.urlopen(base + "/stats").read())
        assert stats["streams"] == 0
        try:
            stream.feed(x[:1])
            assert False, "expected 404 for finished session"
        except urllib.error.HTTPError as e:
            assert e.code == 404
            assert "unknown or expired" in json.loads(e.read())["error"]

        # DELETE aborts an open session
        s2 = client.stream(style=1)
        stats = json.loads(urllib.request.urlopen(base + "/stats").read())
        assert stats["streams"] == 1
        req = urllib.request.Request(f"{base}/v1/stream/{s2.session}",
                                     method="DELETE")
        assert json.loads(urllib.request.urlopen(req).read())["closed"]
    finally:
        server.shutdown()
        b.close()


def test_http_concurrent_streams_share_device_batches():
    """Two streams fed in lockstep from two threads produce per-stream
    correct output; the shared batcher coalesces their windows (total
    device calls < total windows)."""
    from mixstage_tpu.serving import PoseClient

    calls = []
    b = DynamicBatcher(fake_serve(calls), batch_size=4, max_wait_ms=30.0)
    service = PoseService(b, backend="test", frames=T_MEL)
    server = start_http_server(service, port=0)
    client = PoseClient(f"http://127.0.0.1:{server.server_address[1]}")
    rng = np.random.default_rng(6)
    xs = [rng.normal(size=(16, MEL)).astype(np.float32) for _ in range(2)]
    outs = [None, None]

    def run(i):
        st = client.stream(style=i, hop=4)
        pieces = [st.feed(xs[i][j:j + 4]) for j in range(0, 16, 4)]
        pieces.append(st.finish())
        outs[i] = np.concatenate([p for p in pieces if p.size])

    threads = [threading.Thread(target=run, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    for i in range(2):
        assert outs[i] is not None and outs[i].shape[0] == 16
        # style offset identifies the stream: fake pose = rowsum + 1000*style
        expect_first = xs[i][0].sum() + 1000.0 * i
        np.testing.assert_allclose(outs[i][0, 0], expect_first, rtol=1e-5)
    server.shutdown()
    b.close()


def test_request_size_bounds_cap_frames_and_body():
    """Availability bounds: a WELL-FORMED but huge request must be refused
    up front (HTTP 400/413), not padded to a fresh pow-2 bucket whose remote
    compile stalls the single batcher worker for everyone (self-review r4).
    The server stays alive for the next valid request."""
    calls = []
    b = DynamicBatcher(fake_serve(calls), batch_size=4, max_wait_ms=2.0)
    # max_body_bytes is GENEROUS (1 MB) so the frame-cap case below exercises
    # the frame cap alone — a 413 from an accidentally-small body cap would
    # pass case 1 for the wrong reason (ADVICE r4)
    service = PoseService(b, backend="test", mel_bins=MEL, frames=T_MEL,
                          max_frames=32, max_body_bytes=2 ** 20)
    server = start_http_server(service, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        # 1) over the frame cap → 400 naming the cap, nothing reaches device
        big = np.zeros((64, MEL), np.float32).tolist()
        req = urllib.request.Request(
            base + "/v1/pose",
            data=json.dumps({"audio": big, "style": 0}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 400
        assert "cap" in json.loads(e.value.read())["error"]
        assert not calls  # never dispatched

        # 2) over the byte cap → 413 BEFORE the body is parsed
        req = urllib.request.Request(
            base + "/v1/pose", data=b"x" * (2 ** 20 + 1),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as e:
            urllib.request.urlopen(req, timeout=10)
        assert e.value.code == 413

        # 2b) malformed Content-Length is a client SYNTAX error → 400, not
        # a 413 claiming a "-1 byte body exceeds the cap" (ADVICE r4)
        import http.client

        conn = http.client.HTTPConnection("127.0.0.1",
                                          server.server_address[1],
                                          timeout=10)
        conn.putrequest("POST", "/v1/pose", skip_accept_encoding=True)
        conn.putheader("Content-Type", "application/json")
        conn.putheader("Content-Length", "banana")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert "Content-Length" in json.loads(resp.read())["error"]
        conn.close()

        # 3) the server is still healthy: a valid request succeeds
        ok = urllib.request.Request(
            base + "/v1/pose",
            data=json.dumps({"audio": np.ones((T_MEL, MEL)).tolist(),
                             "style": 1}).encode(),
            headers={"Content-Type": "application/json"})
        out = json.loads(urllib.request.urlopen(ok, timeout=10).read())
        np.testing.assert_allclose(np.asarray(out["pose"])[:, 0],
                                   MEL + 1000.0)

        # waveform endpoint cap = frames * the log_mel_400 160-sample hop
        with pytest.raises(ValueError, match="cap"):
            service._audio(np.zeros(32 * 160 + 1, np.float32), waveform=True)
    finally:
        server.shutdown()
        b.close()


def test_style_contract_is_one_copy():
    """The batcher's submit-time style contract and PoseService._style go
    through the same _style_form — both reject a float scalar with the same
    message (self-review r4: duplicated validators drift)."""
    calls = []
    b = DynamicBatcher(fake_serve(calls), batch_size=2, max_wait_ms=1.0)
    service = PoseService(b, backend="test")
    try:
        with pytest.raises(ValueError, match="integer id") as e1:
            b.submit(np.zeros((T_MEL, MEL), np.float32), 0.5)
        with pytest.raises(ValueError, match="integer id") as e2:
            service._style(0.5)
        assert str(e1.value) == str(e2.value)
        with pytest.raises(ValueError, match="1-D"):
            service._style(np.zeros((2, 2)))
    finally:
        b.close()


# ---------------------------------------------------------------------------
# sustained-load soak (VERDICT r4 item 3): the class of slow leak the
# one-shot fuzz/overload/bounds pins structurally cannot catch
# ---------------------------------------------------------------------------

def _proc_stat():
    """(rss_bytes, os_thread_count) of this process from /proc."""
    rss = threads = 0
    for line in open("/proc/self/status"):
        if line.startswith("VmRSS:"):
            rss = int(line.split()[1]) * 1024
        elif line.startswith("Threads:"):
            threads = int(line.split()[1])
    return rss, threads


@pytest.mark.slow
def test_soak_mixed_load_stability():
    """~60 s of mixed traffic against the REAL HTTP server over a real
    jitted CPU graph: concurrent pose JSON + npz clients, streaming sessions
    opening/closing every few seconds (some abandoned), periodic poison and
    oversized requests.  Asserts the things a server meant to run
    indefinitely must hold: bounded RSS growth after warm-up, constant OS
    thread count, stream-session table swept to <= cap, p99 stable between
    the first and last quarter of the run, and the shed counter moving ONLY
    under induced overload (VERDICT r4 item 3)."""
    import gc
    import io
    import os
    import urllib.error

    import jax
    import jax.numpy as jnp

    @jax.jit
    def _kernel(a, s):
        return a.sum(-1, keepdims=True) + s[:, None, None] * 1000.0

    # slow-mode lets the overload phase reliably back the queue up: a fast
    # CPU kernel otherwise drains 64 requests before the queue of 8 fills
    slow = threading.Event()

    def run(audio, style):
        if slow.is_set():
            time.sleep(0.05)
        return np.asarray(_kernel(jnp.asarray(audio), jnp.asarray(style)))

    b = DynamicBatcher(run, batch_size=4, max_wait_ms=2.0, max_queue=8)
    service = PoseService(b, backend=jax.default_backend(), mel_bins=MEL,
                          frames=T_MEL, max_frames=64, stream_idle_s=3.0,
                          max_streams=8, max_body_bytes=2 ** 20)
    server = start_http_server(service, port=0)
    base = f"http://127.0.0.1:{server.server_address[1]}"
    stop = threading.Event()
    errors: list = []
    lat: list = []           # (t_monotonic, seconds) of valid pose requests
    t_start = time.monotonic()

    def post(path, data, headers=None, timeout=15):
        req = urllib.request.Request(
            base + path, data=data,
            headers=headers or {"Content-Type": "application/json"})
        return urllib.request.urlopen(req, timeout=timeout)

    def pose_json_client(i):
        lens = (T_MEL, T_MEL + 3, 2 * T_MEL)  # two buckets, padded + exact
        k = 0
        while not stop.is_set():
            body = json.dumps({
                "audio": np.ones((lens[k % 3], MEL), np.float32).tolist(),
                "style": k % 3}).encode()
            t0 = time.monotonic()
            try:
                out = json.loads(post("/v1/pose", body).read())
                lat.append((t0 - t_start, time.monotonic() - t0))
                assert len(out["pose"]) == lens[k % 3]
            except Exception as e:  # noqa: BLE001
                errors.append(("pose_json", repr(e)))
            k += 1

    def pose_npz_client():
        while not stop.is_set():
            buf = io.BytesIO()
            np.savez(buf, audio=np.ones((T_MEL, MEL), np.float32),
                     style=np.asarray(1))
            try:
                raw = post("/v1/pose", buf.getvalue(),
                           {"Content-Type": "application/octet-stream"}
                           ).read()
                assert np.load(io.BytesIO(raw)).shape[0] == T_MEL
            except Exception as e:  # noqa: BLE001
                errors.append(("pose_npz", repr(e)))
            time.sleep(0.05)

    def stream_churn_client():
        """Open a session, feed a couple of chunks, then finish it — except
        every 3rd session is ABANDONED so the idle sweep must collect it."""
        n = 0
        while not stop.is_set():
            try:
                sid = json.loads(post("/v1/stream", json.dumps(
                    {"style": 0}).encode()).read())["session"]
                for _ in range(2):
                    post(f"/v1/stream/{sid}", json.dumps({
                        "audio": np.ones((T_MEL, MEL),
                                         np.float32).tolist()}).encode())
                if n % 3 != 0:
                    post(f"/v1/stream/{sid}/finish", b"{}")
            except Exception as e:  # noqa: BLE001
                errors.append(("stream", repr(e)))
            n += 1
            time.sleep(0.4)

    def poison_client():
        """Garbage + oversized every few hundred ms; every answer must be a
        clean 4xx — never a 5xx or a hang."""
        cases = [
            (b"\xde\xad\xbe\xef not json", None),
            (json.dumps({"audio": [[1.0] * (MEL + 2)] * T_MEL,
                         "style": 0}).encode(), None),   # wrong mel width
            (json.dumps({"audio": np.ones((T_MEL, MEL)).tolist(),
                         "style": 2.5}).encode(), None),  # float style
            (b"x" * (2 ** 20 + 1), None),                 # over body cap
        ]
        k = 0
        while not stop.is_set():
            body, hdr = cases[k % len(cases)]
            try:
                post("/v1/pose", body, hdr, timeout=15)
                errors.append(("poison", "2xx for garbage"))
            except urllib.error.HTTPError as e:
                if not 400 <= e.code < 500:
                    errors.append(("poison", f"HTTP {e.code}"))
            except Exception as e:  # noqa: BLE001
                errors.append(("poison", repr(e)))
            k += 1
            time.sleep(0.25)

    threads = [threading.Thread(target=pose_json_client, args=(i,))
               for i in range(3)]
    threads += [threading.Thread(target=pose_npz_client),
                threading.Thread(target=stream_churn_client),
                threading.Thread(target=poison_client)]
    soak_s = float(os.environ.get("MIXSTAGE_SOAK_SECONDS", "60"))
    try:
        for t in threads:
            t.start()
        time.sleep(min(10.0, soak_s / 4))  # warm-up: compiles, pools, caches
        gc.collect()
        rss0, threads0 = _proc_stat()
        warm_cut = time.monotonic() - t_start
        time.sleep(soak_s)
        stop.set()
        for t in threads:
            t.join(30)
        assert not any(t.is_alive() for t in threads)
        time.sleep(1.0)  # let per-connection HTTP handler threads exit
        gc.collect()
        rss1, threads1 = _proc_stat()

        # no client ever saw a transport error, 5xx, or wrong-shaped answer
        assert not errors, errors[:10]

        # RSS bounded: a leak of even 1 KB/request would show up here
        # (thousands of requests in the window)
        growth = rss1 - rss0
        print(f"soak: RSS {rss0 / 1e6:.1f} -> {rss1 / 1e6:.1f} MB "
              f"(growth {growth / 1e6:.2f} MB), OS threads "
              f"{threads0} -> {threads1}, {len(lat)} pose requests")
        assert growth < 16 * 2 ** 20, f"RSS grew {growth / 1e6:.1f} MB"

        # OS thread count must not GROW (handler threads are per-connection
        # and must all have exited; batcher worker + http accept thread
        # remain).  It may shrink: the warm-up snapshot is taken mid-traffic
        # with live handler threads.
        assert threads1 <= threads0 + 2, (threads0, threads1)

        # stream table swept: churn abandoned every 3rd session, yet the
        # table must sit at <= cap now and drain to 0 once idle passes
        assert service.stream_count() <= 8
        time.sleep(3.5)
        assert service.stream_count() == 0

        # p99 stable: last quarter of the post-warm-up run vs first quarter
        stable = [(ts, s) for ts, s in lat if ts >= warm_cut]
        assert len(stable) > 200, f"only {len(stable)} requests — too idle"
        span = stable[-1][0] - stable[0][0]
        q1 = [s for ts, s in stable if ts < stable[0][0] + span / 4]
        q4 = [s for ts, s in stable if ts >= stable[0][0] + 3 * span / 4]
        p99_1 = float(np.percentile(q1, 99))
        p99_4 = float(np.percentile(q4, 99))
        print(f"soak: p99 first quarter {p99_1 * 1e3:.1f} ms, "
              f"last quarter {p99_4 * 1e3:.1f} ms")
        assert p99_4 <= max(3 * p99_1, p99_1 + 0.05), (p99_1, p99_4)

        # shed moved ONLY under induced overload
        assert b.stats()["shed"] == 0, "shed during normal mixed load"
        burst_errs = []

        def burst(i):
            body = json.dumps({"audio": np.ones((T_MEL, MEL)).tolist(),
                               "style": 0}).encode()
            try:
                post("/v1/pose", body, timeout=30)
            except urllib.error.HTTPError as e:
                burst_errs.append(e.code)
            except Exception as e:  # noqa: BLE001
                burst_errs.append(repr(e))

        bts = [threading.Thread(target=burst, args=(i,)) for i in range(64)]
        slow.set()  # 50 ms/batch so the 64-deep burst outruns the drain
        try:
            for t in bts:
                t.start()
            for t in bts:
                t.join(60)
        finally:
            slow.clear()
        assert b.stats()["shed"] > 0, "64-deep burst over a queue of 8 " \
                                      "never shed"
        assert all(c == 429 for c in burst_errs), set(burst_errs)

        # and the server still serves after the overload
        out = json.loads(post("/v1/pose", json.dumps(
            {"audio": np.ones((T_MEL, MEL)).tolist(),
             "style": 0}).encode()).read())
        assert len(out["pose"]) == T_MEL
    finally:
        stop.set()
        server.shutdown()
        b.close()


def test_cli_partition_resolution():
    """-serve_partition layout resolution (cli/serve.py): batch DP engages
    only when the batch divides the device count; time/expert take the mesh
    regardless (their sharding is batch-independent); one device collapses
    every mode to the single-chip path."""
    from mixstage_tpu.cli.serve import resolve_partition

    assert resolve_partition(None, 8, 32) == ("batch", True)
    assert resolve_partition("batch", 8, 30) == ("batch", False)
    assert resolve_partition("time", 8, 30) == ("time", True)
    assert resolve_partition("expert", 8, 30) == ("expert", True)
    assert resolve_partition("time", 1, 32) == ("batch", False)
    assert resolve_partition("", 8, 32) == ("batch", True)
    # a typo'd flag raises on ANY device count — it must not silently run
    # batch mode on the 1-device box and then crash on the pod
    for n_dev in (1, 8):
        with pytest.raises(ValueError, match="unknown -serve_partition"):
            resolve_partition("exprt", n_dev, 32)
