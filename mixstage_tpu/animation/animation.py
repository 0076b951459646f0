"""Skeleton rendering: pose tensors → videos with captions + audio.

Parity target: reference ``/root/reference/src/animation/animation.py`` —
``animate`` (:101-249, matplotlib FuncAnimation over LineCollections with
tapered widths, word-highlight captions, ffmpeg writer + audio mux),
``save_animation`` (:304-333, joblib fan-out), ``renderGroundTruth``
(:345-415) and per-cluster ``frames`` PNG dumps (:418-460).

Host-side subsystem.  When the ffmpeg binary is unavailable (as in this
container) BOTH backends mux decodable audio into a pure-Python MJPEG+PCM
``.avi`` (aviwriter.py; the matplotlib fallback re-reads its Pillow GIF's
frames to do so); with no decodable audio the render stays a silent GIF.
"""

from __future__ import annotations

import os
import shutil
import subprocess
import warnings
from pathlib import Path
from typing import List, Optional

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402
import numpy as np  # noqa: E402
from matplotlib.animation import FuncAnimation, PillowWriter, writers  # noqa: E402
from matplotlib.collections import LineCollection  # noqa: E402


def have_ffmpeg() -> bool:
    return shutil.which("ffmpeg") is not None


def split_text(text, max_length: int = 27):
    """Greedily wrap the word table into caption lines.

    Behavioral contract shared with reference ``animation.py:28-41`` (27-char
    monospace caption rows, a word costs ``len+1`` for its trailing space,
    the first word of a line costs only ``len``); expressed here as a single
    pass over the word lengths instead of DataFrame row iteration.
    """
    lengths = [len(str(w)) for w in text["Word"]]
    lines, line_start, used = [], 0, 0
    for i, n in enumerate(lengths):
        if used + n + 1 > max_length:
            lines.append((line_start, i))
            line_start, used = i, n
        else:
            used += n + 1
    if used > 0:
        lines.append((line_start, len(lengths)))
    return [text.iloc[s:e].reset_index(drop=True) for s, e in lines]


def get_line_segments(x, y, num_segments: int = 20):
    """Subdivide the bone from (x0, y0) to (x1, y1) into ``num_segments``
    consecutive 2-point segments, the input LineCollection expects for
    tapered widths (fills the role of reference ``animation.py:78-97``;
    implemented with a single linspace instead of per-axis aranges, which
    also fixes the float-fencepost extra segment the arange version
    produced)."""
    pts = np.linspace((x[0], y[0]), (x[1], y[1]), num_segments + 1)
    return np.stack([pts[:-1], pts[1:]], axis=1)


def _tapered_widths(min_w, max_w, segs=100):
    def widths(a, b, n, eps_flag=1):
        eps = (b - a) / n
        if eps == 0:
            return np.repeat(a, repeats=int(n))
        return np.arange(a, b + eps * int(eps_flag), eps)

    return np.concatenate([widths(min_w, max_w, segs / 2, eps_flag=0),
                           widths(max_w, min_w, segs / 2, eps_flag=1)])


def animate(ys, interval_id, parents, dir_name, desc, data, start, end, idx,
            subname, text=None, fps: int = 15, bitrate: int = 1000):
    """Render one interval's pose sequence(s) to video (animation.py:101-249).

    ys: (T, 2, joints) array or list of them (side-by-side subplots,
    e.g. [prediction, ground truth]).
    """
    if not isinstance(ys, list):
        ys = [ys]
    ext = "mp4" if have_ffmpeg() else "gif"
    render_dir = f"render_{subname}" if subname is not None else "render"
    speaker = data.getSpeaker(interval_id)
    stem = f"{interval_id}" if idx is None else f"{interval_id}_{idx:03d}"
    filename = Path(dir_name) / render_dir / desc / speaker / f"{stem}.{ext}"
    filename_temp = filename.with_name(f"{stem}_temp.{ext}")
    os.makedirs(filename.parent, exist_ok=True)

    backend = os.environ.get("MIXSTAGE_RENDER_BACKEND", "auto")
    if backend != "matplotlib":
        from mixstage_tpu.animation import raster

        if backend == "native" or raster.available():
            try:
                return _animate_native(ys, filename, filename_temp, parents,
                                       data, interval_id, start, end, text,
                                       fps, bitrate)
            except Exception:
                if backend == "native":
                    raise
                warnings.warn("native rasterizer failed; falling back to "
                              "matplotlib")

    plt.ioff()
    fig = plt.figure()
    fig.patch.set_alpha(0.0)
    C = len(ys)
    axs = [fig.add_subplot(1, C, c + 1) for c in range(C)]
    num_segments = 100
    lwidths1 = _tapered_widths(1, 3, num_segments)
    lwidths2 = _tapered_widths(1, 1, num_segments)
    colors = [axs[0].plot([], [])[0].get_color() for _ in parents[1:]]

    def get_line_collections():
        lns_list = []
        for i, color in enumerate(colors):
            lw = lwidths1 if i <= 8 else lwidths2
            lns_list.append(LineCollection([], linewidths=lw, alpha=1,
                                           color=color))
        return lns_list

    lns = [get_line_collections() for _ in axs]
    for ax, ln in zip(axs, lns):
        for l in ln:
            ax.add_collection(l)

    text_subs = split_text(text) if text is not None else None
    labels: List = []
    caption_state = {"idx": 0, "end_frame": (text_subs[0].iloc[-1].end_frame
                                             if text_subs else 0)}

    def init():
        for ax in axs:
            ax.set_xticks([])
            ax.set_yticks([])
            ax.set_xlim(-500, 500)
            ax.set_ylim(-500, 500)
            ax.set_aspect(aspect=1)

    def draw_caption(frame):
        sub = text_subs[caption_state["idx"]]
        if frame >= caption_state["end_frame"] and \
                caption_state["idx"] + 1 < len(text_subs):
            caption_state["idx"] += 1
            sub = text_subs[caption_state["idx"]]
            caption_state["end_frame"] = sub.iloc[-1].end_frame
        words = list(sub.Word.values)
        active = sub[frame < sub["end_frame"]]
        current = active.index[0] - sub.index[0] if len(active) else 0
        for label in labels:
            label.remove()
        labels.clear()
        x0 = 0.0
        for i, word in enumerate(words):
            color = "tab:red" if i == current else "k"
            weight = "bold" if i == current else "normal"
            labels.append(axs[0].text(
                x0 + (len(" ".join(words[:i])) + (1 if i else 0)) / 27, -0.08,
                word, transform=axs[0].transAxes, c=color, fontweight=weight,
                fontfamily="monospace", fontsize=13 if C == 1 else 10))

    def update(frame):
        for i, y in enumerate(ys):
            for joint, parent in enumerate(parents):
                if joint != 0:
                    segments = get_line_segments(
                        x=[y[frame, 0, parent], y[frame, 0, joint]],
                        y=[-y[frame, 1, parent], -y[frame, 1, joint]],
                        num_segments=num_segments)
                    lns[i][joint - 1].set_segments(segments)
        if text_subs is not None:
            draw_caption(frame)

    n_frames = min(y.shape[0] for y in ys)
    anim = FuncAnimation(fig, update, frames=range(n_frames), init_func=init)
    if have_ffmpeg():
        writer = writers["ffmpeg"](fps=fps, metadata={}, bitrate=bitrate)
    else:
        writer = PillowWriter(fps=fps)
    if start is not None and have_ffmpeg():
        anim.save(filename_temp.as_posix(), writer=writer, dpi=400)
        audio_file = get_audio_file(data, interval_id)
        if audio_file is not None:
            add_audio(start, end, audio_file, filename_temp.as_posix(),
                      filename.as_posix())
        else:
            shutil.move(filename_temp.as_posix(), filename.as_posix())
    else:
        plan = None if have_ffmpeg() else _ffmpeg_free_mux_plan(
            data, interval_id, start, end, n_frames, fps)
        if plan is not None:
            # same ffmpeg-free contract as the native path: re-read the
            # Pillow GIF's frames and remux them as MJPEG+PCM .avi
            clip, sr, n_keep = plan
            anim.save(filename_temp.as_posix(), writer=writer)
            from mixstage_tpu.animation.aviwriter import AviWriter

            filename = filename.with_suffix(".avi")
            w = AviWriter(filename.as_posix(), fps=fps)
            # stream the decoded frames in bounded chunks (the native path
            # renders 64 frames at a time for the same reason: a reference-
            # scale 375-frame pred+GT clip is ~0.3 GB as one (T,H,W,3) stack)
            chunk = []
            for arr in _gif_frames(filename_temp.as_posix(), fps,
                                   limit=n_keep):
                chunk.append(arr)
                if len(chunk) == 64:
                    w.add(np.stack(chunk))
                    chunk = []
            if chunk:
                w.add(np.stack(chunk))
            w.set_audio(clip, sr)
            w.close()
            filename_temp.unlink()
        else:
            anim.save(filename.as_posix(), writer=writer)
    print(f"{filename} saved")
    plt.close("all")
    return filename.as_posix()


def _ffmpeg_free_mux_plan(data, interval_id, start, end, n_frames, fps):
    """The ffmpeg-free audio-mux decision shared by both render backends:
    ``(pcm_clip, sample_rate, n_video_frames_to_keep)`` when the interval's
    audio is decodable in-process and overlaps ``[start, stop)``, else None
    (silent render).  Mirrors the reference mux's ``-ss start``/``-shortest``
    semantics (animation.py:251-271): the clip starts at ``start`` and the
    SHORTER track truncates the other."""
    if start is None:
        return None
    audio_file = get_audio_file(data, interval_id)
    if audio_file is None:
        return None
    from mixstage_tpu.animation.aviwriter import decode_audio

    decoded = decode_audio(audio_file)
    if decoded is None:
        return None
    pcm, sr = decoded
    dur = n_frames / fps
    stop = min(float(end) if end is not None else start + dur, start + dur)
    clip = pcm[int(start * sr):int(stop * sr)]
    if not clip.size:
        return None
    n_keep = min(int(round(dur * fps)),
                 int(round(clip.size / sr * fps)))
    if n_keep <= 0:
        return None
    return clip, sr, n_keep


def _gif_frames(path: str, fps: int, limit=None):
    """Yield a GIF's frames back as constant-fps RGB arrays (at most
    ``limit``).  PIL merges identical consecutive frames into one longer-
    duration frame, so each stored frame is repeated ``round(duration*fps)``
    times to reconstruct the original constant-rate sequence.  A generator so
    the AVI remux never materializes the whole clip at once."""
    from PIL import Image, ImageSequence

    n = 0
    with Image.open(path) as im:
        for frame in ImageSequence.Iterator(im):
            rgba = frame.convert("RGBA")
            bg = Image.new("RGBA", rgba.size, (255, 255, 255, 255))
            arr = np.asarray(Image.alpha_composite(bg, rgba).convert("RGB"))
            repeats = max(1, int(round(
                frame.info.get("duration", 1000 / fps) / 1000 * fps)))
            for _ in range(repeats):
                if limit is not None and n >= limit:
                    return
                yield arr
                n += 1


def _animate_native(ys, filename, filename_temp, parents, data, interval_id,
                    start, end, text, fps, bitrate):
    """Native-rasterizer render path (see animation/raster.py); identical
    file/audio-mux contract to the matplotlib path above, plus an
    ffmpeg-free mux: when the binary is absent but the interval's audio is
    decodable in-process (WAV via the stdlib, anything via soundfile when
    installed), the clip is written as MJPEG+PCM ``.avi`` instead of a
    silent GIF (aviwriter.py; reference mux: animation.py:251-271)."""
    from mixstage_tpu.animation import raster

    if start is not None and have_ffmpeg():
        raster.render_to_file(ys, parents, filename_temp.as_posix(),
                              text=text, fps=fps, bitrate=bitrate)
        audio_file = get_audio_file(data, interval_id)
        if audio_file is not None:
            add_audio(start, end, audio_file, filename_temp.as_posix(),
                      filename.as_posix())
        else:
            shutil.move(filename_temp.as_posix(), filename.as_posix())
    else:
        audio = None
        ys_list = ys if isinstance(ys, list) else [ys]
        plan = _ffmpeg_free_mux_plan(
            data, interval_id, start, end,
            min(int(y.shape[0]) for y in ys_list), fps)
        if plan is not None:
            clip, sr, n_keep = plan
            ys = [np.asarray(y)[:n_keep] for y in ys_list]
            audio = (clip, sr)
            filename = filename.with_suffix(".avi")
        raster.render_to_file(ys, parents, filename.as_posix(), text=text,
                              fps=fps, bitrate=bitrate, audio=audio)
    print(f"{filename} saved")
    return filename.as_posix()


def in_modalities(modality: str, input_modalities) -> bool:
    """True when e.g. 'text' appears in any modality key like 'text/bert'
    (reference animation.py:336-342)."""
    return any(modality in key for key in input_modalities)


def get_audio_file(data, interval_id) -> Optional[str]:
    """The interval's raw audio clip.  The reference dataset ships mp3
    (animation.py:274-283); ``.wav`` is also accepted so the ffmpeg-free
    mux path has a stdlib-decodable source.  When both exist the preference
    follows the available decoder: mp3 with ffmpeg (reference behavior),
    wav without (the stdlib cannot decode mp3)."""
    speaker = data.getSpeaker(interval_id)
    parent = Path(data.path2data) / "raw" / f"{speaker}_cropped"
    if not parent.exists():
        return None
    found = {}
    for f in parent.iterdir():
        if f.suffix in (".mp3", ".wav") and \
                f.stem.split("_")[-1] == str(interval_id):
            found[f.suffix] = f.as_posix()
    order = (".mp3", ".wav") if have_ffmpeg() else (".wav", ".mp3")
    return next((found[s] for s in order if s in found), None)


def add_audio(start, end, audio_file, filename_temp, filename):
    """Mux the interval's audio into the rendered video (animation.py:251-271)."""
    if not have_ffmpeg():
        warnings.warn("ffmpeg unavailable; skipping audio mux")
        shutil.move(filename_temp, filename)
        return
    command = ["ffmpeg", "-y", "-ss", str(start), "-i", audio_file,
               "-i", filename_temp, "-map", "0:a", "-map", "1:v",
               "-c:v", "copy", "-shortest", filename]
    subprocess.run(command, stdout=subprocess.DEVNULL,
                   stderr=subprocess.DEVNULL, check=False)
    os.remove(filename_temp)


def save_animation(y, interval_ids, dir_name, desc, data, start=None,
                   end=None, idx=None, subname=None, text=None,
                   output_modalities="pose/data", mask=()):
    """Thread-parallel fan-out over intervals (animation.py:304-333)."""
    from mixstage_tpu.parallel.parallel import parallel

    parents = data.modality_classes[output_modalities].parents
    n = len(interval_ids)

    def listify(v):
        return v if isinstance(v, list) else [v] * n

    parallel(animate, -1, y, list(interval_ids), [parents] * n,
             listify(dir_name), listify(desc), [data] * n, listify(start),
             listify(end), listify(idx), listify(subname), listify(text))


def frames(ys, clusters, interval_id, parents, dir_name, data, subname,
           filename=None):
    """Per-cluster still-frame dumps (reference ``animation.py:418-460``):
    frame ``i`` of the interval renders to
    ``render[_<subname>]/<speaker>/<clusters[i]>/frame_<i>.png`` so each
    mixture cluster's poses can be browsed side by side.  Returns the
    speaker directory, like the reference."""
    from PIL import Image

    from mixstage_tpu.animation import raster

    if not isinstance(ys, list):
        ys = [ys]
    render_dir = f"render_{subname}" if subname is not None else "render"
    if filename is None:
        filename = (Path(dir_name) / render_dir / data.getSpeaker(interval_id)
                    / "{}" / "frame_{}.png")
    imgs = raster.rasterize(ys, parents)
    for i in range(imgs.shape[0]):
        path = Path(str(filename).format(clusters[i], i))
        os.makedirs(path.parent, exist_ok=True)
        Image.fromarray(imgs[i]).save(path.as_posix())
    return Path(str(filename)).parent.parent


def render_ground_truth(args, exp_num):
    """Render ground-truth intervals (reference renderGroundTruth,
    animation.py:345-415)."""
    import pandas as pd

    from mixstage_tpu.data.dataset import Data, DataLoader

    data = Data(args.path2data, args.speaker, args.modalities, args.fs_new,
                time=args.time, split=args.split, batch_size=args.batch_size,
                shuffle=bool(args.shuffle))
    output_modality = args.output_modalities[0]
    feats_shape = data.shape[output_modality][-1] // 2
    dir_name = (Path(args.path2outdata) / f"{args.speaker}").as_posix()
    os.makedirs(dir_name, exist_ok=True)

    for desc in ["train", "dev", "test"]:
        for minidata in data.datasets[desc].datasets:
            # captions only when a text modality is in play
            # (reference animation.py:377,407)
            text = None
            if in_modalities("text", getattr(args, "input_modalities", None)
                             or args.modalities):
                from mixstage_tpu.data.text import read_text_meta

                text = read_text_meta(minidata.path2h5)
            loader = DataLoader(minidata, batch_size=len(minidata) or 1,
                                shuffle=False)
            for batch in loader:
                y = np.asarray(batch[output_modality])
                y = y.reshape(-1, 2, feats_shape)
                y[..., 0] = 0
                interval_id = batch["meta"]["interval_id"][0]
                # start=0 so interval audio muxes in (reference
                # animation.py:399,410)
                animate(y, interval_id, data.modality_classes[output_modality].parents,
                        dir_name, desc, data, 0, None, None, "gt", text)
                break
