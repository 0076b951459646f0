"""Native skeleton rasterizer: pose tensors → RGB frame stacks → GIF/mp4.

Fast path for the render subsystem (reference
``/root/reference/src/animation/animation.py:101-249`` renders through
matplotlib FuncAnimation + Agg, which costs seconds *per frame* on a 1-core
host).  The visual primitive is identical — per bone, an anti-aliased
capsule whose linewidth ramps min→peak→min along the bone, the same tapered
width profile the reference builds via ``lwidths`` (animation.py:44-76) and
a 100-segment LineCollection — but rasterized directly into a ``(T, H, W,
3)`` uint8 buffer by ``native/raster.cpp`` (ctypes, threads across frames,
numpy fallback with identical math).

Captions reproduce the reference's word-highlight semantics
(animation.py:179-231): the caption line advances when the frame passes the
line's last ``end_frame``; the first word whose ``end_frame`` is still ahead
is highlighted.  Drawn with PIL on a strip below the panels (monospace,
active word red) instead of matplotlib text artists.

Writers: animated GIF via PIL (this container has no ffmpeg) or mp4 via an
ffmpeg rawvideo pipe when the binary exists; audio mux reuses
``animation.add_audio``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libraster.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False
_lib_lock = threading.Lock()  # save_animation fans out via joblib threads

# matplotlib's default prop cycle (tab10) — the reference assigns bone i the
# cycle color i % 10 via repeated ax.plot (animation.py / our animation.py
# colors list).  Hardcoded so the rasterizer needs no matplotlib import.
_TAB10_HEX = ["#1f77b4", "#ff7f0e", "#2ca02c", "#d62728", "#9467bd",
              "#8c564b", "#e377c2", "#7f7f7f", "#bcbd22", "#17becf"]
TAB10_RGB = np.array([[int(h[1:3], 16), int(h[3:5], 16), int(h[5:7], 16)]
                      for h in _TAB10_HEX], np.uint8)

# matplotlib linewidths are in points at the figure dpi (default 100):
# 1 pt = dpi/72 px.  Body bones (first 9) taper 1→3→1 pt, fingers stay 1 pt
# (animation.py lwidths1/lwidths2 split at bone index 8).
_DPI = 100.0
_PT = _DPI / 72.0
MIN_W_PX = 1.0 * _PT
PEAK_W_PX = 3.0 * _PT
N_BODY_BONES = 9


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", str(_NATIVE_DIR), "-s"], check=True,
                       capture_output=True)
        return _LIB_PATH.exists()
    except Exception:
        return False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lib_lock:
        return _load_lib_locked()


def _load_lib_locked() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:  # another thread won the race
        return _lib
    _tried = True
    if not _LIB_PATH.exists() and not _build():
        return None
    try:
        lib = ctypes.CDLL(str(_LIB_PATH))
        f32p = np.ctypeslib.ndpointer(np.float32, flags="C_CONTIGUOUS")
        i32p = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
        u8p = np.ctypeslib.ndpointer(np.uint8, flags="C_CONTIGUOUS")
        lib.rasterize_poses.argtypes = [
            f32p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, i32p, u8p,
            f32p, ctypes.c_float, ctypes.c_int64, ctypes.c_float,
            ctypes.c_int64, u8p]
        lib.encode_gif.argtypes = [
            u8p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, u8p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            u8p, u8p, ctypes.c_int64]
        lib.encode_gif.restype = ctypes.c_int64
        _lib = lib
    except OSError:
        _lib = None
    return _lib


def available() -> bool:
    return get_lib() is not None


def bone_colors(n_bones: int) -> np.ndarray:
    return TAB10_RGB[np.arange(n_bones) % len(TAB10_RGB)]


def bone_peak_widths(n_bones: int, scale: float = 1.0) -> np.ndarray:
    w = np.full(n_bones, MIN_W_PX * scale, np.float32)
    w[:N_BODY_BONES] = PEAK_W_PX * scale
    return w


def _rasterize_numpy(ys: np.ndarray, parents: np.ndarray, colors: np.ndarray,
                     peak_w: np.ndarray, min_w: float, panel: int,
                     world_half: float) -> np.ndarray:
    """Pure-numpy reference implementation (same math as raster.cpp)."""
    P, T, _, J = ys.shape
    scale = panel / (2.0 * world_half)
    out = np.full((T, panel, P * panel, 3), 255, np.uint8)
    for p in range(P):
        for t in range(T):
            img = out[t]
            for j in range(1, J):
                par = int(parents[j])
                if par < 0:
                    continue
                if not np.isfinite(ys[p, t, :, [par, j]]).all():
                    continue  # same guard as raster.cpp (diverged nets)
                x0 = (ys[p, t, 0, par] + world_half) * scale
                y0 = (ys[p, t, 1, par] + world_half) * scale
                x1 = (ys[p, t, 0, j] + world_half) * scale
                y1 = (ys[p, t, 1, j] + world_half) * scale
                half_min = 0.5 * min_w
                half_peak = 0.5 * max(peak_w[j - 1], min_w)
                rmax = half_peak + 1.0
                c0 = max(int(np.floor(min(x0, x1) - rmax)), 0)
                c1 = min(int(np.ceil(max(x0, x1) + rmax)), panel - 1)
                r0 = max(int(np.floor(min(y0, y1) - rmax)), 0)
                r1 = min(int(np.ceil(max(y0, y1) + rmax)), panel - 1)
                if c1 < c0 or r1 < r0:
                    continue
                cc, rr = np.meshgrid(np.arange(c0, c1 + 1, dtype=np.float32),
                                     np.arange(r0, r1 + 1, dtype=np.float32))
                px, py = cc + 0.5, rr + 0.5
                dx, dy = x1 - x0, y1 - y0
                len2 = dx * dx + dy * dy
                tt = (((px - x0) * dx + (py - y0) * dy) / len2
                      if len2 > 0 else np.zeros_like(px))
                tt = np.clip(tt, 0.0, 1.0)
                d = np.hypot(x0 + tt * dx - px, y0 + tt * dy - py)
                radius = half_min + (half_peak - half_min) * \
                    (1.0 - np.abs(2.0 * tt - 1.0))
                a = np.clip(radius - d + 0.5, 0.0, 1.0)[..., None]
                rgb = colors[j - 1].astype(np.float32)
                col_off = p * panel
                region = img[r0:r1 + 1, col_off + c0:col_off + c1 + 1]
                # quantize per bone, like the uint8 blend in raster.cpp
                region[:] = np.floor(
                    region.astype(np.float32) * (1.0 - a) + rgb * a + 0.5
                ).astype(np.uint8)
    return out


def rasterize(ys, parents, panel: int = 480, world_half: float = 500.0,
              n_threads: Optional[int] = None) -> np.ndarray:
    """Render pose sequence(s) to an RGB frame stack.

    ys: (T, 2, J) array or list of them (side-by-side panels).
    Returns (T, panel, P*panel, 3) uint8.
    """
    if not isinstance(ys, (list, tuple)):
        ys = [ys]
    T = min(int(y.shape[0]) for y in ys)
    stack = np.ascontiguousarray(
        np.stack([np.asarray(y)[:T] for y in ys]), np.float32)
    P, _, _, J = stack.shape
    parents = np.ascontiguousarray(parents, np.int32)
    assert parents.shape == (J,), (
        f"parents has {parents.shape[0]} entries for {J}-joint poses")
    colors = np.ascontiguousarray(bone_colors(J - 1))
    peak_w = np.ascontiguousarray(bone_peak_widths(J - 1), np.float32)
    lib = get_lib()
    if lib is None:
        return _rasterize_numpy(stack, parents, colors, peak_w,
                                float(MIN_W_PX), panel, world_half)
    out = np.empty((T, panel, P * panel, 3), np.uint8)
    nt = n_threads if n_threads is not None else (os.cpu_count() or 1)
    lib.rasterize_poses(stack, P, T, J, parents, colors, peak_w,
                        ctypes.c_float(MIN_W_PX), panel,
                        ctypes.c_float(world_half), nt, out)
    return out


# ---------------------------------------------------------------- captions

CAPTION_H = 28


class CaptionOverlay:
    """Stateful caption-strip renderer reproducing the reference's
    word-highlight state machine (animation.py:179-231: the caption line
    advances — at most one line per frame, like the reference — when the
    frame passes the line's last ``end_frame``; the first word whose
    ``end_frame`` is still ahead is highlighted).  Statefulness lets long
    clips stream through in chunks: call ``apply`` with consecutive frame
    ranges."""

    def __init__(self, text, max_length: int = 27):
        from PIL import ImageFont

        from mixstage_tpu.animation.animation import split_text

        self.subs = split_text(text, max_length=max_length)
        self.idx = 0
        self.end_frame = (float(self.subs[0].iloc[-1].end_frame)
                          if self.subs else 0.0)
        try:
            self.font = ImageFont.load_default(size=16)
        except TypeError:  # older Pillow: fixed-size bitmap font
            self.font = ImageFont.load_default()
        self.char_w = (max(1, int(self.font.getbbox("M")[2]
                                  - self.font.getbbox("M")[0]))
                       if hasattr(self.font, "getbbox") else 8)

    def apply(self, frames: np.ndarray, frame_offset: int = 0) -> np.ndarray:
        from PIL import Image, ImageDraw

        T, H, W, _ = frames.shape
        out = np.full((T, H + CAPTION_H, W, 3), 255, np.uint8)
        out[:, :H] = frames
        if not self.subs:
            return out
        for i in range(T):
            frame = frame_offset + i
            if frame >= self.end_frame and self.idx + 1 < len(self.subs):
                self.idx += 1
                self.end_frame = float(self.subs[self.idx].iloc[-1].end_frame)
            sub = self.subs[self.idx]
            words = [str(w) for w in sub.Word.values]
            active = sub[frame < sub["end_frame"]]
            current = (int(active.index[0] - sub.index[0])
                       if len(active) else 0)
            strip = Image.fromarray(out[i, H:])
            draw = ImageDraw.Draw(strip)
            x0 = 4
            for wi, word in enumerate(words):
                color = (214, 39, 40) if wi == current else (0, 0, 0)
                draw.text((x0, 4), word, fill=color, font=self.font)
                x0 += (len(word) + 1) * self.char_w
            out[i, H:] = np.asarray(strip)
        return out


def overlay_captions(frames: np.ndarray, text, max_length: int = 27
                     ) -> np.ndarray:
    """One-shot caption strip (see CaptionOverlay for the streaming form)."""
    overlay = CaptionOverlay(text, max_length=max_length)
    return overlay.apply(frames) if overlay.subs else frames


# ----------------------------------------------------------------- writers

def gif_palette() -> np.ndarray:
    """The color universe the rasterizer draws from: white background,
    each tab10 bone color at 16 alpha levels over white (the AA ramp), and
    16 black levels (caption text AA).  (177, 3) uint8, index 0 = white."""
    levels = np.arange(1, 17, dtype=np.float32)[:, None] / 16.0
    ramps = [np.array([[255, 255, 255]], np.float32)]
    for rgb in np.concatenate([TAB10_RGB, [[0, 0, 0]]]).astype(np.float32):
        ramps.append(255.0 * (1.0 - levels) + rgb[None, :] * levels)
    return np.ascontiguousarray(
        np.floor(np.concatenate(ramps) + 0.5).astype(np.uint8))


class GifWriter:
    """Streaming GIF writer over the native encoder: each ``add`` chunk is
    encoded and flushed to disk, so memory stays bounded by the chunk.
    Without the native lib, frames buffer and PIL writes at ``close``."""

    def __init__(self, path: str, fps: int):
        self.path = path
        self.fps = fps
        self.delay_cs = max(2, int(round(100.0 / fps)))
        self.lib = get_lib()
        self._pal = gif_palette()
        self._file = open(path, "wb") if self.lib is not None else None
        self._header_written = False
        self._prev: Optional[np.ndarray] = None  # delta-encode across chunks
        self._pil_frames: List = []

    def add(self, frames: np.ndarray) -> None:
        frames = np.ascontiguousarray(frames, np.uint8)
        if self.lib is None:
            from PIL import Image

            self._pil_frames.extend(Image.fromarray(f) for f in frames)
            return
        T, H, W, _ = frames.shape
        prev = self._prev if self._prev is not None else frames[0]
        cap = T * H * W // 2 + T * 4096 + (1 << 14)
        while True:
            out = np.empty(cap, np.uint8)
            n = self.lib.encode_gif(frames, T, H, W, self._pal,
                                    len(self._pal), self.delay_cs,
                                    int(not self._header_written),
                                    int(self._prev is not None),
                                    np.ascontiguousarray(prev), out, cap)
            if n >= 0:
                break
            if cap >= 2 * T * H * W + (1 << 16):
                raise RuntimeError("gif encode buffer overflow")
            cap *= 2
        self._header_written = True
        self._prev = frames[-1].copy()
        self._file.write(out[:n].tobytes())

    def close(self) -> None:
        if self.lib is None:
            if self._pil_frames:
                self._pil_frames[0].save(
                    self.path, save_all=True,
                    append_images=self._pil_frames[1:],
                    duration=max(1, int(round(1000.0 / self.fps))), loop=0)
            return
        self._file.write(b"\x3B")  # GIF trailer
        self._file.close()


class Mp4Writer:
    """Streaming rawvideo pipe into ffmpeg (no intermediate PNGs)."""

    def __init__(self, path: str, fps: int, bitrate: int = 1000):
        self.path = path
        self.fps = fps
        self.bitrate = bitrate
        self.proc = None

    def add(self, frames: np.ndarray) -> None:
        frames = np.ascontiguousarray(frames, np.uint8)
        if self.proc is None:
            _, H, W, _ = frames.shape
            cmd = ["ffmpeg", "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
                   "-s", f"{W}x{H}", "-r", str(self.fps), "-i", "-",
                   "-pix_fmt", "yuv420p", "-b:v", f"{self.bitrate}k",
                   self.path]
            self.proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                                         stdout=subprocess.DEVNULL,
                                         stderr=subprocess.DEVNULL)
        self.proc.stdin.write(frames.tobytes())

    def close(self) -> None:
        if self.proc is None:
            return
        self.proc.stdin.close()
        if self.proc.wait() != 0:
            raise RuntimeError(f"ffmpeg rawvideo encode failed for {self.path}")


def write_gif(frames: np.ndarray, path: str, fps: int) -> None:
    writer = GifWriter(path, fps)
    writer.add(frames)
    writer.close()


def write_mp4(frames: np.ndarray, path: str, fps: int,
              bitrate: int = 1000) -> None:
    writer = Mp4Writer(path, fps, bitrate)
    writer.add(frames)
    writer.close()


def render_to_file(ys, parents, filename: str, text=None, fps: int = 15,
                   bitrate: int = 1000, panel: int = 480,
                   world_half: float = 500.0, chunk_frames: int = 64,
                   audio=None) -> str:
    """Rasterize + caption + encode one clip (GIF, mp4, or MJPEG avi by
    extension), streaming ``chunk_frames`` at a time — a 375-frame pred+GT
    pair at 480 px would be ~0.5 GB as a single stack.  ``audio`` is an
    optional ``(int16_pcm, sample_rate)`` pair muxed into ``.avi`` output
    (the ffmpeg-free audio path; see animation/aviwriter.py)."""
    if not isinstance(ys, (list, tuple)):
        ys = [ys]
    T = min(int(y.shape[0]) for y in ys)
    captions = (CaptionOverlay(text)
                if text is not None and len(text) else None)
    if filename.endswith(".mp4"):
        writer = Mp4Writer(filename, fps, bitrate)
    elif filename.endswith(".avi"):
        from mixstage_tpu.animation.aviwriter import AviWriter

        writer = AviWriter(filename, fps)
        if audio is not None:
            writer.set_audio(audio[0], audio[1])
    else:
        writer = GifWriter(filename, fps)
    for t0 in range(0, T, chunk_frames):
        t1 = min(T, t0 + chunk_frames)
        frames = rasterize([np.asarray(y)[t0:t1] for y in ys], parents,
                           panel=panel, world_half=world_half)
        if captions is not None:
            frames = captions.apply(frames, frame_offset=t0)
        writer.add(frames)
    writer.close()
    return filename
