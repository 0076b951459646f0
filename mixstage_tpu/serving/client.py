"""Minimal client for the pose-serving endpoint (stdlib urllib + numpy).

Uses the binary npz transport (no float→JSON→float round-trip); styles may
be scalar ids or mixture-weight vectors (see serving/server.py).
"""

from __future__ import annotations

import io
import json
import urllib.request

import numpy as np


class PoseClient:
    def __init__(self, base_url: str, timeout_s: float = 30.0):
        self.base_url = base_url.rstrip("/")
        self.timeout_s = timeout_s

    def _get(self, path: str) -> dict:
        return json.loads(urllib.request.urlopen(
            self.base_url + path, timeout=self.timeout_s).read())

    def health(self) -> dict:
        return self._get("/healthz")

    def stats(self) -> dict:
        return self._get("/stats")

    def _post(self, path: str, audio: np.ndarray, style) -> np.ndarray:
        buf = io.BytesIO()
        np.savez(buf, audio=np.asarray(audio, np.float32),
                 style=np.asarray(style))
        req = urllib.request.Request(
            self.base_url + path, data=buf.getvalue(),
            headers={"Content-Type": "application/octet-stream"})
        body = urllib.request.urlopen(req, timeout=self.timeout_s).read()
        return np.load(io.BytesIO(body))

    def pose(self, audio: np.ndarray, style=0) -> np.ndarray:
        """One (T, mel) log-mel window → (T, feats) pose."""
        return self._post("/v1/pose", audio, style)

    def pose_from_waveform(self, waveform: np.ndarray,
                           style=0) -> np.ndarray:
        """Raw 16 kHz samples → pose (servers with the log_mel_400
        frontend)."""
        return self._post("/v1/pose_from_waveform", waveform, style)

    def _post_json(self, path: str, payload: dict) -> dict:
        req = urllib.request.Request(
            self.base_url + path, data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"})
        return json.loads(urllib.request.urlopen(
            req, timeout=self.timeout_s).read())

    def stream(self, style=0, hop=None) -> "PoseStream":
        """Open a streaming session (overlapped-window real-time path)."""
        payload = {"style": np.asarray(style).tolist()}
        if hop is not None:
            payload["hop"] = int(hop)
        info = self._post_json("/v1/stream", payload)
        return PoseStream(self, info)


class PoseStream:
    """Client handle for one streaming session: feed mel frames, receive
    newly finalized pose frames."""

    def __init__(self, client: PoseClient, info: dict):
        self._client = client
        self.session = info["session"]
        self.window = info["window"]
        self.hop = info["hop"]

    def feed(self, mel_frames: np.ndarray) -> np.ndarray:
        out = self._client._post_json(
            f"/v1/stream/{self.session}",
            {"audio": np.asarray(mel_frames, np.float32).tolist()})
        return np.asarray(out["pose"], np.float32)

    def finish(self) -> np.ndarray:
        out = self._client._post_json(
            f"/v1/stream/{self.session}/finish", {})
        return np.asarray(out["pose"], np.float32)
