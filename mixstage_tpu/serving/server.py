"""Production serving endpoint: dynamic batching + HTTP front door.

TPU-native addition with no reference counterpart (the reference's only
inference surface is the offline ``sample.py`` loop, trainer.py:705-849).
The jitted serving graph (``serve.build_serving_fn``) has a *static* batch
size — the natural production shape is therefore a micro-batcher: requests
queue up, a worker drains up to ``batch_size`` of them (or whatever arrived
within ``max_wait_ms``), pads to the static shape, runs ONE device call and
scatters the results.  Padding rides along for free on the MXU; per-request
latency is bounded by ``max_wait_ms`` + one device step.

The HTTP layer is stdlib (`ThreadingHTTPServer`) so the framework stays
dependency-free:

* ``POST /v1/pose``   — JSON ``{"audio": [[...T×mel...]], "style": int}`` →
  ``{"pose": [[...T×feats...]]}``; or ``application/octet-stream`` carrying
  an ``.npz`` with ``audio``/``style`` → raw ``.npy`` pose bytes.
* ``POST /v1/stream``            — open a streaming session
  (``{"style": ..., "hop": ...}`` → ``{"session": id}``); then
  ``POST /v1/stream/<id>`` feeds mel frames and returns newly FINALIZED
  pose frames, ``POST /v1/stream/<id>/finish`` flushes + closes, and
  ``DELETE /v1/stream/<id>`` aborts.  Sessions run overlapped-window
  inference with crossfade (``mixstage_tpu/streaming.py``) and submit
  their windows through the same batcher — concurrent streams share
  device batches.
* ``GET /healthz``    — liveness + backend + static batch size.
* ``GET /stats``      — request/batch counters, mean occupancy, latency
  percentiles, active streaming sessions.
"""

from __future__ import annotations

import collections
import io
import json
import queue
import threading
import time
from concurrent.futures import Future
from concurrent.futures import TimeoutError as FuturesTimeout
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Callable, Optional, Sequence

import numpy as np

from mixstage_tpu.ops.bucketing import pow2_pad


class Overloaded(RuntimeError):
    """Raised by ``DynamicBatcher.submit`` when the request queue is full
    (load shedding — the HTTP layer maps this to 429)."""


def _style_form(style):
    """Normalize a request's style into one of the two legal forms: a scalar
    integer id (``int``) or a 1-D float32 mixture-weight vector.  The SINGLE
    copy of this contract — both ``DynamicBatcher.submit`` (defense in depth
    for library users) and ``PoseService._style`` (which layers the
    ``num_styles`` range/one-hot logic on top) call it, so the two can never
    drift.  Raises ``ValueError`` (→ HTTP 400) on anything else."""
    arr = np.asarray(style)
    if arr.ndim == 0:
        if float(arr) != int(arr):
            raise ValueError(
                f"scalar style must be an integer id, got {float(arr)} "
                f"(send a weight VECTOR for soft mixtures)")
        return int(arr)
    if arr.ndim != 1:
        raise ValueError(f"style must be a scalar id or a 1-D mixture "
                         f"weight vector, got shape {arr.shape}")
    return arr.astype(np.float32)


class DynamicBatcher:
    """Gather single requests into static-shape device batches.

    ``serve_fn``: ``(audio (B, T, mel), style (B,) int32) -> pose (B, T, F)``
    with a fixed ``B = batch_size`` (the jitted serving graph's shape).

    ``input_shape``: optional per-request shape contract, e.g. ``(None, 64)``
    for any-length 64-mel windows or ``(64, 64)`` for a static-T graph.
    ``None`` entries match any extent.  Violations raise ``ValueError`` in
    the *caller's* thread at submit time — nothing malformed ever reaches
    the worker.

    ``max_queue``: backpressure bound (default ``4 * batch_size``); beyond
    it ``submit`` sheds with :class:`Overloaded` instead of growing memory.

    Requests whose audio shape / style form differ are batched separately
    (one device batch must ``np.stack``); stragglers wait for the next
    drain rather than poisoning a mixed batch.
    """

    def __init__(self, serve_fn: Callable, batch_size: int,
                 max_wait_ms: float = 5.0,
                 input_shape: Optional[Sequence[Optional[int]]] = None,
                 max_queue: Optional[int] = None):
        self.serve_fn = serve_fn
        self.batch_size = int(batch_size)
        self.max_wait_s = max_wait_ms / 1e3
        self.input_shape = None if input_shape is None else tuple(input_shape)
        self.max_queue = int(max_queue or 4 * self.batch_size)
        self._queue: "queue.Queue" = queue.Queue(maxsize=self.max_queue)
        self._pending: "collections.deque" = collections.deque()
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._run, daemon=True,
                                        name="pose-batcher")
        # stats
        self.requests = 0
        self.batches = 0
        self.occupancy_sum = 0
        self.shed = 0
        self.latencies_ms: list = []
        self._stats_lock = threading.Lock()
        self._worker.start()

    # ------------------------------------------------------------------ API
    def submit(self, audio: np.ndarray, style) -> Future:
        """Enqueue one (T, mel) window; resolves to a (T, feats) pose.

        ``style``: a scalar id, or a (num_styles,) float vector of mixture
        weights.  Raises ``ValueError`` on a shape-contract violation and
        :class:`Overloaded` when the queue is full."""
        fut: Future = Future()
        audio = np.asarray(audio, np.float32)  # ragged input raises here
        if self.input_shape is not None:
            ok = audio.ndim == len(self.input_shape) and all(
                want is None or have == want
                for have, want in zip(audio.shape, self.input_shape))
            if not ok:
                raise ValueError(
                    f"audio shape {audio.shape} does not match the serving "
                    f"graph's expected {self.input_shape} (None = any)")
        style = _style_form(style)
        # backpressure covers BOTH buffers: the queue proper and the
        # stragglers parked in _pending by shape-grouped drains — otherwise
        # mixed-shape floods would grow _pending without ever shedding
        if self._queue.qsize() + len(self._pending) >= self.max_queue:
            with self._stats_lock:
                self.shed += 1
            raise Overloaded(
                f"serving queue full ({self.max_queue} waiting); retry later")
        try:
            self._queue.put_nowait((audio, style, fut, time.perf_counter()))
        except queue.Full:
            with self._stats_lock:
                self.shed += 1
            raise Overloaded(
                f"serving queue full ({self.max_queue} waiting); retry later"
            ) from None
        return fut

    def close(self):
        self._stop.set()
        self._worker.join(timeout=5)

    def stats(self) -> dict:
        with self._stats_lock:
            lats = sorted(self.latencies_ms[-4096:])
            pct = (lambda q: round(lats[int(q * (len(lats) - 1))], 2)) \
                if lats else (lambda q: None)
            return {
                "requests": self.requests,
                "batches": self.batches,
                "mean_occupancy": round(self.occupancy_sum
                                        / max(1, self.batches), 2),
                "batch_size": self.batch_size,
                "shed": self.shed,
                "queue_depth": self._queue.qsize() + len(self._pending),
                "latency_ms_p50": pct(0.50),
                "latency_ms_p99": pct(0.99),
            }

    # --------------------------------------------------------------- worker
    @staticmethod
    def _batch_key(item):
        """Requests must share audio shape + style form to stack into one
        device batch; the key partitions them."""
        audio, style = item[0], item[1]
        return (audio.shape,
                "id" if isinstance(style, int) else np.shape(style))

    def _drain(self):
        """Block for one request, then take whatever else arrives within the
        wait budget, up to the static batch size.  Only requests matching the
        first one's batch key join; the rest wait in ``_pending`` and lead
        the next drain (FIFO per shape class)."""
        if self._pending:
            first = self._pending.popleft()
        else:
            try:
                first = self._queue.get(timeout=0.1)
            except queue.Empty:
                return None
        key = self._batch_key(first)
        items = [first]
        # matching stragglers from previous drains go first
        keep = collections.deque()
        while self._pending and len(items) < self.batch_size:
            it = self._pending.popleft()
            (items if self._batch_key(it) == key else keep).append(it)
        keep.extend(self._pending)
        self._pending = keep
        deadline = time.perf_counter() + self.max_wait_s
        while len(items) < self.batch_size:
            remaining = deadline - time.perf_counter()
            if remaining <= 0:
                break
            try:
                it = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if self._batch_key(it) == key:
                items.append(it)
            else:
                self._pending.append(it)
        return items

    def _run(self):
        while not self._stop.is_set():
            items = self._drain()
            if not items:
                continue
            n = len(items)
            try:  # nothing in here may kill the worker thread
                audio = np.stack([it[0] for it in items])
                styles = [it[1] for it in items]
                style = (np.asarray(styles, np.int32)
                         if all(np.ndim(s) == 0 for s in styles)
                         else np.stack([np.asarray(s, np.float32)
                                        for s in styles]))
                if n < self.batch_size:  # pad to the jitted static shape
                    pad = self.batch_size - n
                    audio = np.concatenate(
                        [audio, np.repeat(audio[:1], pad, axis=0)])
                    style = np.concatenate(
                        [style, np.repeat(style[:1], pad, axis=0)])
                pose = np.asarray(self.serve_fn(audio, style))
            except Exception as exc:  # propagate to every waiter
                for _, _, fut, _ in items:
                    fut.set_exception(exc)
                continue
            now = time.perf_counter()
            with self._stats_lock:
                self.requests += n
                self.batches += 1
                self.occupancy_sum += n
                self.latencies_ms.extend(
                    (now - it[3]) * 1e3 for it in items)
                del self.latencies_ms[:-8192]
            for i, (_, _, fut, _) in enumerate(items):
                fut.set_result(pose[i])


class PoseService:
    """The request-level protocol over a DynamicBatcher."""

    def __init__(self, batcher: DynamicBatcher, backend: str = "unknown",
                 timeout_s: float = 30.0, num_styles: Optional[int] = None,
                 waveform_batcher: Optional[DynamicBatcher] = None,
                 frames: int = 64, stream_idle_s: float = 300.0,
                 mel_bins: Optional[int] = None,
                 static_frames: Optional[int] = None,
                 max_streams: int = 64,
                 max_frames: int = 4096,
                 max_body_bytes: int = 64 * 2 ** 20):
        self.batcher = batcher
        self.backend = backend
        self.timeout_s = timeout_s
        # when known, scalar style ids are one-hot encoded so hard ids and
        # soft mixture weights can share one server (uniform batch shapes)
        self.num_styles = num_styles
        # audio contract of the mel endpoint, validated pre-submit when known:
        # (T, mel_bins); static_frames pins T for static-shape (AOT) graphs
        self.mel_bins = mel_bins
        self.static_frames = static_frames
        # optional raw-16kHz endpoint over serve.build_waveform_serving_fn
        self.waveform_batcher = waveform_batcher
        # streaming sessions: id -> [StreamingSession, last_used, lock]
        self.frames = int(frames)
        self.stream_idle_s = stream_idle_s
        self.max_streams = int(max_streams)  # abandoned-session memory bound
        # availability bounds: _bucket pads ANY length to the next power of
        # two and every new bucket is a fresh (20-60 s remote) compile, so an
        # uncapped well-formed request could stall the single batcher worker
        # behind a million-frame graph.  max_frames caps the request length
        # (→ a handful of buckets total); the waveform cap is its sample
        # equivalent at the log_mel_400 frontend's 160-sample hop.
        self.max_frames = int(max_frames)
        self.max_wave_samples = self.max_frames * 160
        # HTTP body cap, enforced BEFORE the body is read (→ 413)
        self.max_body_bytes = int(max_body_bytes)
        self._streams: dict = {}
        self._streams_lock = threading.Lock()

    def _pick(self, waveform: bool) -> DynamicBatcher:
        if waveform:
            if self.waveform_batcher is None:
                raise LookupError("waveform endpoint not configured "
                                  "(model must use audio/log_mel_400)")
            return self.waveform_batcher
        return self.batcher

    def _style(self, style):
        sty = _style_form(style)
        if isinstance(sty, int):
            if self.num_styles is None:
                return sty
            if not 0 <= sty < self.num_styles:
                raise ValueError(f"style id {sty} out of range "
                                 f"[0, {self.num_styles})")
            return np.eye(self.num_styles, dtype=np.float32)[sty]
        if self.num_styles is not None and sty.shape != (self.num_styles,):
            raise ValueError(f"style mixture must have {self.num_styles} "
                             f"weights, got shape {sty.shape}")
        return sty

    def _audio(self, audio, waveform: bool = False) -> np.ndarray:
        """Validate a request's audio against the endpoint contract; raises
        ValueError (→ HTTP 400) instead of letting a malformed array reach
        the batcher worker."""
        arr = np.asarray(audio, np.float32)  # ragged nesting raises here
        if waveform:
            if arr.ndim != 1:
                raise ValueError(f"waveform endpoint expects a 1-D 16kHz "
                                 f"sample array, got shape {arr.shape}")
            if arr.shape[0] > self.max_wave_samples:
                raise ValueError(
                    f"waveform has {arr.shape[0]} samples, over this "
                    f"server's cap of {self.max_wave_samples} "
                    f"(~{self.max_frames} frames); split the request or "
                    f"use the streaming endpoint")
            return arr
        if arr.ndim != 2:
            raise ValueError(f"audio must be a (frames, mel) matrix, got "
                             f"shape {arr.shape}")
        if arr.shape[0] > self.max_frames:
            raise ValueError(
                f"audio has {arr.shape[0]} frames, over this server's cap "
                f"of {self.max_frames}; split the request or use the "
                f"streaming endpoint")
        if self.mel_bins is not None and arr.shape[1] != self.mel_bins:
            raise ValueError(f"audio has {arr.shape[1]} mel bins, the model "
                             f"expects {self.mel_bins}")
        if self.static_frames is not None and \
                arr.shape[0] != self.static_frames:
            raise ValueError(f"this server's graph is compiled for exactly "
                             f"{self.static_frames} frames, got "
                             f"{arr.shape[0]}")
        return arr

    def _bucket(self, audio: np.ndarray, waveform: bool):
        """Pad mel windows up to a power-of-two frame bucket (repeat-last-
        frame, the streaming edge treatment) and return the true length.

        The convolutional graph needs T divisible by the UNet's 2^5 and
        every distinct T is a separate (expensive) remote compile — pow-2
        bucketing makes arbitrary-length requests both valid and cheap
        (≤ a handful of compiled shapes), and same-bucket requests batch
        together.  Static-frame (AOT) servers validate instead of pad.
        The bucket choice + pad fill are ops.bucketing.pow2_pad — the SAME
        function the sampling path uses (VERDICT r4 item 7: one copy)."""
        if waveform or self.static_frames is not None:
            return audio, None
        if audio.shape[0] < 1:
            raise ValueError("audio must have at least 1 frame")
        return pow2_pad(audio, floor=self.frames)

    def infer_json(self, payload: dict, waveform: bool = False) -> dict:
        if "audio" not in payload:
            raise ValueError("payload must carry an 'audio' field")
        audio = self._audio(payload["audio"], waveform=waveform)
        audio, true_len = self._bucket(audio, waveform)
        style = self._style(payload.get("style", 0))
        pose = self._pick(waveform).submit(audio, style).result(
            self.timeout_s)
        if true_len is not None:
            pose = pose[:true_len]
        return {"pose": pose.tolist()}

    def infer_npz(self, body: bytes, waveform: bool = False) -> bytes:
        with np.load(io.BytesIO(body)) as z:
            if "audio" not in z:
                raise ValueError("npz must carry an 'audio' array")
            audio = self._audio(z["audio"], waveform=waveform)
            style = self._style(z["style"]) if "style" in z else \
                self._style(0)
        audio, true_len = self._bucket(audio, waveform)
        pose = self._pick(waveform).submit(audio, style).result(
            self.timeout_s)
        if true_len is not None:
            pose = pose[:true_len]
        buf = io.BytesIO()
        np.save(buf, pose)
        return buf.getvalue()

    # ------------------------------------------------------ streaming sessions
    def _sweep_streams(self):
        """Drop sessions idle past the budget (caller holds _streams_lock)."""
        now = time.time()
        for sid in [s for s, v in self._streams.items()
                    if now - v[1] > self.stream_idle_s]:
            del self._streams[sid]

    def _stream(self, sid: str):
        with self._streams_lock:
            # sweep on every access, not only stream_open — abandoned
            # sessions must expire even when no new streams are opened
            self._sweep_streams()
            entry = self._streams.get(sid)
        if entry is None:
            raise LookupError(f"unknown or expired session {sid!r}")
        return entry

    def stream_open(self, payload: dict) -> dict:
        """Create a streaming session; its window inferences go through the
        shared batcher, so concurrent streams batch together on device."""
        import uuid

        from mixstage_tpu.streaming import StreamingSession

        style = self._style(payload.get("style", 0))
        hop = payload.get("hop")

        def infer(window, sty):
            return np.asarray(
                self.batcher.submit(window, sty).result(self.timeout_s))

        sess = StreamingSession(infer, style, window=self.frames,
                                hop=None if hop is None else int(hop))
        sid = uuid.uuid4().hex[:16]
        with self._streams_lock:
            self._sweep_streams()
            if len(self._streams) >= self.max_streams:
                raise Overloaded(
                    f"too many live streaming sessions "
                    f"({self.max_streams}); close or finish some first")
            self._streams[sid] = [sess, time.time(), threading.Lock()]
        return {"session": sid, "window": sess.window, "hop": sess.hop}

    def stream_feed(self, sid: str, payload: dict) -> dict:
        entry = self._stream(sid)
        if "audio" not in payload:
            raise ValueError("payload must carry an 'audio' field")
        audio = np.asarray(payload["audio"], np.float32)
        if audio.ndim != 2:
            raise ValueError(f"stream feed expects (n, mel) mel-frame "
                             f"chunks, got shape {audio.shape}")
        if self.mel_bins is not None and audio.shape[1] != self.mel_bins:
            raise ValueError(f"audio has {audio.shape[1]} mel bins, the "
                             f"model expects {self.mel_bins}")
        with entry[2]:  # serialize feeds per session
            out = entry[0].feed(audio)
            entry[1] = time.time()
            buffered = entry[0].frames_buffered
        return {"pose": out.tolist(), "frames_buffered": buffered}

    def stream_finish(self, sid: str) -> dict:
        entry = self._stream(sid)
        with entry[2]:
            out = entry[0].finish()
        with self._streams_lock:
            self._streams.pop(sid, None)
        return {"pose": out.tolist()}

    def stream_close(self, sid: str) -> dict:
        with self._streams_lock:
            dropped = self._streams.pop(sid, None) is not None
        return {"closed": dropped}

    def stream_count(self) -> int:
        with self._streams_lock:
            self._sweep_streams()
            return len(self._streams)

    def healthz(self) -> dict:
        return {"ok": True, "backend": self.backend,
                "batch_size": self.batcher.batch_size}


def _make_handler(service: PoseService):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _send_json(self, code: int, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._send_json(200, service.healthz())
            elif self.path == "/stats":
                stats = service.batcher.stats()
                stats["streams"] = service.stream_count()
                self._send_json(200, stats)
            else:
                self._send_json(404, {"error": f"unknown path {self.path}"})

        def do_DELETE(self):
            parts = self.path.strip("/").split("/")
            if len(parts) == 3 and parts[:2] == ["v1", "stream"]:
                self._send_json(200, service.stream_close(parts[2]))
            else:
                self._send_json(404, {"error": f"unknown path {self.path}"})

        def _drain(self, length: int):
            """Discard a refused request body in bounded chunks so the
            client's upload completes and it can read the error response
            (an early close mid-upload surfaces as EPIPE client-side, not
            the 413).  Bounded: a body declared over 4x the cap is not
            worth the bandwidth — close instead.  Either way keep-alive is
            off when bytes may remain unread (they would be parsed as the
            next request's start otherwise)."""
            drain_cap = 4 * service.max_body_bytes
            if length > drain_cap:
                self.close_connection = True
                return
            left = length
            try:
                while left > 0:
                    chunk = self.rfile.read(min(left, 64 * 1024))
                    if not chunk:
                        break
                    left -= len(chunk)
            except OSError:
                pass
            if left:
                self.close_connection = True

        def do_POST(self):
            raw_length = self.headers.get("Content-Length", 0)
            try:
                length = int(raw_length)
            except ValueError:
                length = -1
            if length < 0:
                # a malformed/negative Content-Length is a client syntax
                # error (400), not an oversize body (413) — ADVICE r4; no
                # trustworthy length to drain by, so the connection closes
                self.close_connection = True
                self._send_json(400, {
                    "error": f"malformed Content-Length header "
                             f"{raw_length!r}"})
                return
            if length > service.max_body_bytes:
                # refuse BEFORE reading into memory: an uncapped body could
                # exhaust the host regardless of later payload validators —
                # but DRAIN (bounded, discarded) after responding so the
                # client reliably sees the 413 rather than a broken pipe
                self._send_json(413, {
                    "error": f"request body of {length} bytes exceeds the "
                             f"{service.max_body_bytes}-byte cap"})
                self._drain(length)
                return
            body = self.rfile.read(length)
            parts = self.path.strip("/").split("/")
            try:
                if parts[:2] == ["v1", "stream"]:
                    payload = json.loads(body.decode()) if body else {}
                    if len(parts) == 2:
                        self._send_json(200, service.stream_open(payload))
                    elif len(parts) == 3:
                        self._send_json(200, service.stream_feed(parts[2],
                                                                 payload))
                    elif len(parts) == 4 and parts[3] == "finish":
                        self._send_json(200, service.stream_finish(parts[2]))
                    else:
                        self._send_json(404, {"error": f"unknown path "
                                                       f"{self.path}"})
                    return
                if self.path not in ("/v1/pose", "/v1/pose_from_waveform"):
                    self._send_json(404,
                                    {"error": f"unknown path {self.path}"})
                    return
                waveform = self.path.endswith("waveform")
                if self.headers.get("Content-Type", "").startswith(
                        "application/octet-stream"):
                    out = service.infer_npz(body, waveform=waveform)
                    self._send(200, out, "application/octet-stream")
                else:
                    self._send_json(200, service.infer_json(
                        json.loads(body.decode()), waveform=waveform))
            except Overloaded as exc:       # queue full → shed, retryable
                self._send_json(429, {"error": str(exc)})
            except LookupError as exc:      # unknown session / endpoint
                self._send_json(404, {"error": f"{type(exc).__name__}: "
                                               f"{exc}"})
            except FuturesTimeout:          # device stuck / overloaded
                self._send_json(
                    503, {"error": "inference timed out; server overloaded "
                                   "or backend unavailable"})
            except Exception as exc:  # noqa: BLE001 — surface to the client
                self._send_json(400, {"error": f"{type(exc).__name__}: {exc}"})

    return Handler


class PoseHTTPServer(ThreadingHTTPServer):
    """ThreadingHTTPServer with the TCP accept backlog raised from
    socketserver's default of 5: a burst of concurrent clients beyond the
    backlog gets kernel-level RSTs before the application can answer 429 —
    overload must surface as the batcher's explicit shed, not as
    connection resets."""

    request_queue_size = 128


def start_http_server(service: PoseService, port: int = 0,
                      host: str = "127.0.0.1"):
    """Start the HTTP front door on a daemon thread; returns the server
    (``server.server_address[1]`` is the bound port — pass ``port=0`` for an
    ephemeral one)."""
    server = PoseHTTPServer((host, port), _make_handler(service))
    thread = threading.Thread(target=server.serve_forever, daemon=True,
                              name="pose-http")
    thread.start()
    return server
