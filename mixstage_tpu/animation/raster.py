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
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

_NATIVE_DIR = Path(__file__).parent.parent / "native"
_LIB_PATH = _NATIVE_DIR / "libraster.so"
_lib: Optional[ctypes.CDLL] = None
_tried = False

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
            ctypes.c_int64, ctypes.c_int64, u8p, ctypes.c_int64]
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


def overlay_captions(frames: np.ndarray, text, max_length: int = 27
                     ) -> np.ndarray:
    """Append a caption strip below the frames, reproducing the reference's
    word-highlight state machine (animation.py:179-231)."""
    from PIL import Image, ImageDraw, ImageFont

    from mixstage_tpu.animation.animation import split_text

    subs = split_text(text, max_length=max_length)
    if not subs:
        return frames
    T, H, W, _ = frames.shape
    try:
        font = ImageFont.load_default(size=16)
    except TypeError:  # older Pillow: fixed-size bitmap font
        font = ImageFont.load_default()
    char_w = max(1, int(font.getbbox("M")[2] - font.getbbox("M")[0])) \
        if hasattr(font, "getbbox") else 8
    out = np.full((T, H + CAPTION_H, W, 3), 255, np.uint8)
    out[:, :H] = frames
    idx, end_frame = 0, float(subs[0].iloc[-1].end_frame)
    for frame in range(T):
        if frame >= end_frame and idx + 1 < len(subs):
            idx += 1
            end_frame = float(subs[idx].iloc[-1].end_frame)
        sub = subs[idx]
        words = [str(w) for w in sub.Word.values]
        active = sub[frame < sub["end_frame"]]
        current = int(active.index[0] - sub.index[0]) if len(active) else 0
        strip = Image.fromarray(out[frame, H:])
        draw = ImageDraw.Draw(strip)
        x0 = 4
        for i, word in enumerate(words):
            color = (214, 39, 40) if i == current else (0, 0, 0)
            draw.text((x0, 4), word, fill=color, font=font)
            x0 += (len(word) + 1) * char_w
        out[frame, H:] = np.asarray(strip)
    return out


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


def write_gif(frames: np.ndarray, path: str, fps: int) -> None:
    frames = np.ascontiguousarray(frames, np.uint8)
    delay_cs = max(2, int(round(100.0 / fps)))
    lib = get_lib()
    if lib is not None:
        T, H, W, _ = frames.shape
        pal = gif_palette()
        cap = T * H * W // 2 + T * 4096 + (1 << 14)
        while True:
            out = np.empty(cap, np.uint8)
            n = lib.encode_gif(frames, T, H, W, pal, len(pal), delay_cs,
                               out, cap)
            if n >= 0:
                with open(path, "wb") as f:
                    f.write(out[:n].tobytes())
                return
            if cap >= 2 * T * H * W:  # LZW can't legitimately need more
                break
            cap *= 2
    from PIL import Image

    imgs = [Image.fromarray(f) for f in frames]
    imgs[0].save(path, save_all=True, append_images=imgs[1:],
                 duration=max(1, int(round(1000.0 / fps))), loop=0)


def write_mp4(frames: np.ndarray, path: str, fps: int,
              bitrate: int = 1000) -> None:
    """Pipe raw RGB frames into ffmpeg (no intermediate PNGs)."""
    T, H, W, _ = frames.shape
    cmd = ["ffmpeg", "-y", "-f", "rawvideo", "-pix_fmt", "rgb24",
           "-s", f"{W}x{H}", "-r", str(fps), "-i", "-",
           "-pix_fmt", "yuv420p", "-b:v", f"{bitrate}k", path]
    proc = subprocess.Popen(cmd, stdin=subprocess.PIPE,
                            stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL)
    proc.communicate(frames.tobytes())
    if proc.returncode != 0:
        raise RuntimeError(f"ffmpeg rawvideo encode failed for {path}")


def render_to_file(ys, parents, filename: str, text=None, fps: int = 15,
                   bitrate: int = 1000, panel: int = 480,
                   world_half: float = 500.0) -> str:
    """Rasterize + caption + encode one clip (GIF or mp4 by extension)."""
    frames = rasterize(ys, parents, panel=panel, world_half=world_half)
    if text is not None and len(text):
        frames = overlay_captions(frames, text)
    if filename.endswith(".mp4"):
        write_mp4(frames, filename, fps, bitrate)
    else:
        write_gif(frames, filename, fps)
    return filename
