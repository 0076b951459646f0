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
