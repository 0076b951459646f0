"""Pure-Python AVI writer (MJPEG + PCM) — the ffmpeg-free audio-mux path.

Parity role: reference ``animation.py:251-271`` muxes interval audio into
rendered videos via an ffmpeg subprocess; this container has no ffmpeg, so
``animation/aviwriter.py`` writes the RIFF container directly.  Validated
two ways: our own spec-derived RIFF walker, and OpenCV's independent
MJPEG-AVI demuxer/decoder.
"""

import io
import wave

import numpy as np
import pytest

from mixstage_tpu.animation.aviwriter import (AviWriter, decode_audio,
                                              parse_avi, read_wav)
from mixstage_tpu.data.skeleton import PARENTS

FPS = 5
SR = 8000


def _frames(T=12, H=64, W=96):
    """Smooth synthetic frames (flat background + moving block) so the JPEG
    round trip stays near-lossless."""
    frames = np.full((T, H, W, 3), 255, np.uint8)
    for t in range(T):
        frames[t, 10:30, 5 + 4 * t:25 + 4 * t] = (200, 40, 40)
    return frames


def _tone(seconds, sr=SR, hz=440.0):
    t = np.arange(int(seconds * sr)) / sr
    return (np.sin(2 * np.pi * hz * t) * 20000).astype(np.int16)


def test_avi_round_trip(tmp_path):
    frames = _frames()
    pcm = _tone(len(frames) / FPS)
    path = str(tmp_path / "clip.avi")
    w = AviWriter(path, fps=FPS)
    w.add(frames[:7])           # chunked adds, like render_to_file streams
    w.add(frames[7:])
    w.set_audio(pcm, SR)
    w.close()

    info = parse_avi(path)
    avih = info["headers"]["avih"]
    assert avih["total_frames"] == len(frames)
    assert (avih["width"], avih["height"]) == (96, 64)
    assert avih["streams"] == 2
    kinds = {s["kind"]: s for s in info["headers"]["streams"]}
    assert kinds["vids"]["rate"] // kinds["vids"]["scale"] == FPS
    assert kinds["auds"]["rate"] // kinds["auds"]["scale"] == SR
    assert kinds["auds"]["length"] == pcm.size
    # PCM is bit-exact through the container
    assert info["pcm"] == pcm.tobytes()
    # JPEG frames decode and stay close on smooth content
    from PIL import Image

    got = np.asarray(Image.open(io.BytesIO(info["frames"][3])))
    err = np.abs(got.astype(int) - frames[3].astype(int)).max()
    assert err <= 40, err


def test_avi_cv2_independent_decode(tmp_path):
    cv2 = pytest.importorskip("cv2")
    frames = _frames()
    path = str(tmp_path / "clip.avi")
    w = AviWriter(path, fps=FPS)
    w.add(frames)
    w.set_audio(_tone(len(frames) / FPS), SR)
    w.close()

    cap = cv2.VideoCapture(path)
    assert cap.isOpened()
    assert cap.get(cv2.CAP_PROP_FPS) == FPS
    assert (int(cap.get(cv2.CAP_PROP_FRAME_WIDTH)),
            int(cap.get(cv2.CAP_PROP_FRAME_HEIGHT))) == (96, 64)
    decoded = []
    while True:
        ok, fr = cap.read()
        if not ok:
            break
        decoded.append(fr[..., ::-1])  # BGR → RGB
    assert len(decoded) == len(frames)
    err = np.abs(decoded[-1].astype(int) - frames[-1].astype(int)).max()
    assert err <= 40, err


def test_read_wav_stdlib(tmp_path):
    pcm = _tone(0.5)
    mono = tmp_path / "m.wav"
    with wave.open(str(mono), "wb") as f:
        f.setnchannels(1), f.setsampwidth(2), f.setframerate(SR)
        f.writeframes(pcm.tobytes())
    got, sr = read_wav(str(mono))
    assert sr == SR and np.array_equal(got, pcm)

    stereo = tmp_path / "s.wav"
    two = np.stack([pcm, np.zeros_like(pcm)], -1)
    with wave.open(str(stereo), "wb") as f:
        f.setnchannels(2), f.setsampwidth(2), f.setframerate(SR)
        f.writeframes(two.tobytes())
    got, sr = read_wav(str(stereo))
    assert sr == SR and np.array_equal(got, (pcm / 2).astype(np.int16))

    assert decode_audio(str(mono))[1] == SR
    assert decode_audio(str(tmp_path / "missing.mp3")) is None


def test_animate_muxes_wav_audio_without_ffmpeg(tmp_path, monkeypatch):
    """e2e through ``animate``: with no ffmpeg but a WAV clip on disk, the
    native path writes an .avi whose PCM is exactly the [start, start+T/fps)
    slice of the interval audio (reference mux contract: -ss start,
    -shortest — animation.py:251-271)."""
    from mixstage_tpu.animation import animation

    monkeypatch.setattr(animation, "have_ffmpeg", lambda: False)
    raw = tmp_path / "data" / "raw" / "oliver_cropped"
    raw.mkdir(parents=True)
    pcm = _tone(4.0)
    with wave.open(str(raw / "audio_123.wav"), "wb") as f:
        f.setnchannels(1), f.setsampwidth(2), f.setframerate(SR)
        f.writeframes(pcm.tobytes())

    class FakeData:
        path2data = str(tmp_path / "data")

        def getSpeaker(self, interval_id):
            return "oliver"

    T = 10
    y = np.cumsum(np.random.default_rng(0).normal(size=(T, 2, 52)), 0) * 10
    start = 0.5
    out = animation.animate(y, "123", PARENTS, str(tmp_path), "test",
                            FakeData(), start, 4.0, None, None, fps=FPS)
    assert out.endswith(".avi")
    info = parse_avi(out)
    assert len(info["frames"]) == T
    lo, hi = int(start * SR), int((start + T / FPS) * SR)
    assert info["pcm"] == pcm[lo:hi].tobytes()


def test_animate_shortest_truncates_video_to_audio(tmp_path, monkeypatch):
    """Audio shorter than the rendered clip: ffmpeg's ``-shortest`` truncates
    the video track to the audio; the ffmpeg-free mux mirrors that so both
    paths produce the same clip length (reference animation.py:251-271)."""
    from mixstage_tpu.animation import animation

    monkeypatch.setattr(animation, "have_ffmpeg", lambda: False)
    raw = tmp_path / "data" / "raw" / "oliver_cropped"
    raw.mkdir(parents=True)
    pcm = _tone(1.7)  # video below asks for [0.5, 2.5) -> only 1.2 s exists
    with wave.open(str(raw / "audio_7.wav"), "wb") as f:
        f.setnchannels(1), f.setsampwidth(2), f.setframerate(SR)
        f.writeframes(pcm.tobytes())

    class FakeData:
        path2data = str(tmp_path / "data")

        def getSpeaker(self, interval_id):
            return "oliver"

    T = 10  # 2 s of video at FPS=5
    y = np.cumsum(np.random.default_rng(2).normal(size=(T, 2, 52)), 0) * 10
    out = animation.animate(y, "7", PARENTS, str(tmp_path), "test",
                            FakeData(), 0.5, None, None, None, fps=FPS)
    assert out.endswith(".avi")
    info = parse_avi(out)
    got_pcm = np.frombuffer(info["pcm"], np.int16)
    assert got_pcm.size == pcm.size - int(0.5 * SR)   # [start, end-of-audio)
    # video truncated to the audio's 1.2 s -> 6 frames, not 10
    assert len(info["frames"]) == int(round(got_pcm.size / SR * FPS))


def test_animate_matplotlib_backend_muxes_audio_too(tmp_path, monkeypatch):
    """Backend parity: the matplotlib fallback honors the same ffmpeg-free
    mux contract as the native path (re-reads its Pillow GIF's frames and
    remuxes them as MJPEG+PCM .avi), including -shortest truncation."""
    from mixstage_tpu.animation import animation

    monkeypatch.setattr(animation, "have_ffmpeg", lambda: False)
    monkeypatch.setenv("MIXSTAGE_RENDER_BACKEND", "matplotlib")
    raw = tmp_path / "data" / "raw" / "oliver_cropped"
    raw.mkdir(parents=True)
    pcm = _tone(1.2)  # video wants 2 s -> -shortest keeps 6 of 10 frames
    with wave.open(str(raw / "audio_11.wav"), "wb") as f:
        f.setnchannels(1), f.setsampwidth(2), f.setframerate(SR)
        f.writeframes(pcm.tobytes())

    class FakeData:
        path2data = str(tmp_path / "data")

        def getSpeaker(self, interval_id):
            return "oliver"

    T = 10
    y = np.cumsum(np.random.default_rng(3).normal(size=(T, 2, 52)), 0) * 10
    out = animation.animate(y, "11", PARENTS, str(tmp_path), "test",
                            FakeData(), 0.0, None, None, None, fps=FPS)
    assert out.endswith(".avi")
    info = parse_avi(out)
    assert info["pcm"] == pcm.tobytes()
    assert len(info["frames"]) == int(round(pcm.size / SR * FPS))
    assert not list((tmp_path / "render" / "test" / "oliver").glob("*temp*"))


def test_get_audio_file_prefers_decodable_source(tmp_path, monkeypatch):
    """mp3 + wav both on disk: mp3 wins with ffmpeg (reference dataset ships
    mp3 — animation.py:274-283), wav wins without (stdlib can't decode mp3)."""
    from mixstage_tpu.animation import animation

    raw = tmp_path / "raw" / "oliver_cropped"
    raw.mkdir(parents=True)
    (raw / "clip_42.mp3").touch()
    (raw / "clip_42.wav").touch()

    class FakeData:
        path2data = str(tmp_path)

        def getSpeaker(self, interval_id):
            return "oliver"

    monkeypatch.setattr(animation, "have_ffmpeg", lambda: True)
    assert animation.get_audio_file(FakeData(), 42).endswith(".mp3")
    monkeypatch.setattr(animation, "have_ffmpeg", lambda: False)
    assert animation.get_audio_file(FakeData(), 42).endswith(".wav")
    # only one form present -> it is returned either way
    (raw / "clip_42.wav").unlink()
    assert animation.get_audio_file(FakeData(), 42).endswith(".mp3")


def test_set_audio_int16_stereo_averages_in_int16_scale(tmp_path):
    """int16 stereo must be averaged at int16 scale, not pushed through the
    [-1, 1] float clip (which would flatten everything to ±1)."""
    w = AviWriter(str(tmp_path / "x.avi"), fps=FPS)
    w.add(_frames(T=2))
    stereo = np.array([[20000, 10000], [-20000, -10000], [5, -4]], np.int16)
    w.set_audio(stereo, SR)
    assert w._pcm.dtype == np.int16
    assert list(w._pcm) == [15000, -15000, 0]  # mean, rounded to nearest
    # float stereo still goes through the [-1, 1] clip first
    w.set_audio(np.array([[0.5, 1.5]], np.float32), SR)  # 1.5 clips to 1.0
    assert list(w._pcm) == [int(round((0.5 + 1.0) / 2 * 32767))]


def test_decode_audio_unreadable_wav_degrades_to_none(tmp_path):
    """A wav the stdlib reader rejects (e.g. IEEE-float) falls through to
    soundfile when installed, else returns None — never raises."""
    bad = tmp_path / "f32.wav"
    bad.write_bytes(b"RIFF\x24\x00\x00\x00WAVEfmt \x10\x00\x00\x00"
                    b"\x03\x00\x01\x00" + (8000).to_bytes(4, "little") * 2 +
                    b"\x04\x00\x20\x00data\x00\x00\x00\x00")
    try:
        import soundfile  # noqa: F401
        pytest.skip("soundfile installed; fallback path would decode")
    except ImportError:
        pass
    assert decode_audio(str(bad)) is None


def test_animate_without_audio_still_writes_gif(tmp_path, monkeypatch):
    """start=None (no mux requested) keeps the silent-GIF contract."""
    from mixstage_tpu.animation import animation

    monkeypatch.setattr(animation, "have_ffmpeg", lambda: False)

    class FakeData:
        path2data = "/nonexistent"

        def getSpeaker(self, interval_id):
            return "oliver"

    y = np.cumsum(np.random.default_rng(1).normal(size=(6, 2, 52)), 0) * 10
    out = animation.animate(y, "9", PARENTS, str(tmp_path), "test",
                            FakeData(), None, None, None, None, fps=FPS)
    assert out.endswith(".gif")
