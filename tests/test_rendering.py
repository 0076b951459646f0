"""Rendering + HTML grid + audio frontend tests."""

import numpy as np
import pytest

from mixstage_tpu.data.audio import (log_mel_400, log_mel_512,
                                     log_mel_spectrogram_jax, mel_filterbank,
                                     silence_vad, stft_mag)
from mixstage_tpu.data.skeleton import PARENTS
from mixstage_tpu.htmlgrid.to_html import make_html_file


@pytest.fixture
def raster_lib(require_native):
    """libraster.so ships prebuilt: load failure FAILS (conftest guard)."""
    from mixstage_tpu.animation import raster

    return require_native(raster.get_lib, raster._LIB_PATH, "raster")


def test_stft_matches_scipy_golden():
    """Golden pin of the from-scratch STFT against scipy.signal.stft
    (VERDICT r3 weak #4).  Same conventions as the reference's librosa
    calls (audio.py:117-137): periodic hann, hop framing, rfft magnitude.
    scipy scales by 1/window.sum(); multiply back to compare raw |STFT|."""
    from scipy import signal

    rng = np.random.default_rng(0)
    y = rng.standard_normal(16000)
    win = signal.get_window("hann", 512, fftbins=True)

    # center=False, win_length == n_fft: direct framing
    ours = stft_mag(y, n_fft=512, hop_length=160, center=False, power=1.0)
    _, _, Z = signal.stft(y, window=win, nperseg=512, noverlap=512 - 160,
                          nfft=512, boundary=None, padded=False,
                          detrend=False)
    ref = np.abs(Z).T * win.sum()
    assert ours.shape == ref.shape == (97, 257)
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-10)

    # center=True (log_mel_512's convention): librosa reflect-pads by
    # n_fft//2 — pin our centered output against scipy on an explicitly
    # reflect-padded signal
    win2k = signal.get_window("hann", 2048, fftbins=True)
    ours_c = stft_mag(y, n_fft=2048, hop_length=512, center=True, power=2.0)
    ypad = np.pad(y, 2048 // 2, mode="reflect")
    _, _, Z2 = signal.stft(ypad, window=win2k, nperseg=2048,
                           noverlap=2048 - 512, nfft=2048, boundary=None,
                           padded=False, detrend=False)
    ref_c = (np.abs(Z2).T * win2k.sum()) ** 2
    n = min(len(ours_c), len(ref_c))
    assert n >= 28
    np.testing.assert_allclose(ours_c[:n], ref_c[:n], rtol=1e-9,
                               atol=1e-9 * ref_c.max())


def test_stft_window_padding_convention_golden():
    """win_length=400 inside n_fft=512 (the log_mel_400 convention,
    reference audio.py:128-135): librosa centers the 400-tap hann in the
    512-sample frame.  Oracle: direct per-frame windowed rfft."""
    from scipy import signal

    rng = np.random.default_rng(1)
    y = rng.standard_normal(4000)
    ours = stft_mag(y, n_fft=512, hop_length=160, win_length=400,
                    center=False, power=1.0)
    w400 = signal.get_window("hann", 400, fftbins=True)
    pad = (512 - 400) // 2
    wfull = np.pad(w400, (pad, 512 - 400 - pad))
    frames = 1 + (len(y) - 512) // 160
    ref = np.stack([np.abs(np.fft.rfft(y[k * 160:k * 160 + 512] * wfull))
                    for k in range(frames)])
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours, ref, rtol=1e-10, atol=1e-12)


def test_slaney_filterbank_golden_constants():
    """Slaney-scale mel filterbank hard goldens for the exact reference
    parameterization (sr=16000, n_fft=512, 64 mels, fmin=125, fmax=7500,
    norm=None — audio.py:129-135, librosa defaults htk=False, slaney mel).

    Derivation: mel(f) = f/(200/3) below 1000 Hz, else
    15 + ln(f/1000)/(ln(6.4)/27); 66 points linspace(mel(125), mel(7500));
    weight[m, k] = max(0, min((f_k - f_m)/(f_{m+1} - f_m),
                              (f_{m+2} - f_k)/(f_{m+2} - f_{m+1}))).
    The constants below were computed from that formula (independently
    re-derived in this test body) — a silent convention change in
    mel_filterbank (htk vs slaney, edge handling, normalization) breaks
    them, which would otherwise silently distort every imported reference
    checkpoint's inputs."""
    fb = mel_filterbank(16000, 512, 64, 125.0, 7500.0, norm=None)

    # independent re-derivation of the slaney formula
    def mel(f):
        f = np.asarray(f, np.float64)
        lin = f / (200.0 / 3.0)
        log = 15.0 + np.log(f / 1000.0) / (np.log(6.4) / 27.0)
        return np.where(f < 1000.0, lin, log)

    def hz(m):
        m = np.asarray(m, np.float64)
        lin = m * (200.0 / 3.0)
        log = 1000.0 * np.exp((m - 15.0) * (np.log(6.4) / 27.0))
        return np.where(m < 15.0, lin, log)

    pts = hz(np.linspace(mel(125.0), mel(7500.0), 66))
    freqs = np.linspace(0, 8000.0, 257)
    ref = np.zeros((64, 257))
    for m in range(64):
        lower = (freqs - pts[m]) / (pts[m + 1] - pts[m])
        upper = (pts[m + 2] - freqs) / (pts[m + 2] - pts[m + 1])
        ref[m] = np.maximum(0.0, np.minimum(lower, upper))
    np.testing.assert_allclose(fb, ref, rtol=1e-9, atol=1e-12)

    # hard constants (peak bin, row sum, peak weight) for 5 probe rows
    golden = {
        0: (5, 1.2819380286814797, 0.718061971318521),
        16: (28, 1.3303887457184644, 0.7665126883555047),
        32: (57, 2.622987778355848, 0.9682795054882184),
        48: (117, 5.277822640508725, 0.9916227929986248),
        63: (229, 10.289870192025, 0.953660857275706),
    }
    for m, (peak_bin, row_sum, peak_val) in golden.items():
        assert fb[m].argmax() == peak_bin, f"mel {m} peak moved"
        np.testing.assert_allclose(fb[m].sum(), row_sum, rtol=1e-9)
        np.testing.assert_allclose(fb[m].max(), peak_val, rtol=1e-9)
    # exact ramp weights of the first filter
    np.testing.assert_allclose(
        fb[0, 5:7], [0.718061971318521, 0.5638760573629585], rtol=1e-9)
    assert np.abs(fb[0, :5]).max() == 0.0 and fb[0, 7] == 0.0


def test_mel_filterbank_properties():
    fb = mel_filterbank(16000, 512, 64, 125.0, 7500.0, norm=None)
    assert fb.shape == (64, 257)
    assert (fb >= 0).all()
    # every filter has support; peaks move up in frequency
    peaks = fb.argmax(axis=1)
    assert (np.diff(peaks) >= 0).all()
    assert fb.sum() > 0


def test_log_mel_shapes_and_rate():
    sr = 16000
    t = np.linspace(0, 2.0, 2 * sr, endpoint=False)
    y = np.sin(2 * np.pi * 440 * t)
    m512 = log_mel_512(y, sr)
    assert m512.shape[1] == 128
    m400 = log_mel_400(y, sr)
    assert m400.shape[1] == 64
    # ~103 rows/sec for log_mel_400 (fs_map parity)
    assert abs(m400.shape[0] / 2.0 - 100) < 8
    assert np.isfinite(m400).all()
    # 440 Hz tone: energy concentrated in low mel bands
    band_energy = m400.mean(0)
    assert band_energy[:16].max() > band_energy[40:].max()


def test_jax_frontend_matches_numpy():
    import jax.numpy as jnp

    sr = 16000
    rng = np.random.default_rng(0)
    y = rng.normal(size=(sr,))
    ref = log_mel_400(y, sr)
    out = np.asarray(log_mel_spectrogram_jax(jnp.asarray(y, jnp.float64)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=1e-3, atol=1e-3)


def test_silence_vad_energy_fallback():
    sr = 16000
    y = np.concatenate([np.zeros(sr), np.sin(np.linspace(0, 3000, sr))])
    mask = silence_vad(y, sr)
    assert mask.ndim == 1 and len(mask) > 0
    # first second is silence → early entries flag silence more often
    half = len(mask) // 2
    assert mask[:half].sum() >= mask[half:].sum()


@pytest.mark.slow
def test_animate_renders_file(tmp_path):
    from mixstage_tpu.animation.animation import animate

    class FakeData:
        path2data = "/nonexistent"

        def getSpeaker(self, interval_id):
            return "oliver"

    y = np.cumsum(np.random.default_rng(0).normal(size=(8, 2, 52)), 0) * 10
    out = animate(y, "123", PARENTS, str(tmp_path), "test", FakeData(),
                  None, None, None, None, fps=5)
    import os

    assert os.path.exists(out) and os.path.getsize(out) > 0


def test_html_grid(tmp_path):
    (tmp_path / "render_oliver_maher" / "test" / "oliver").mkdir(parents=True)
    (tmp_path / "render_oliver_maher" / "test" / "oliver" / "1.mp4").touch()
    (tmp_path / "render" / "test" / "oliver").mkdir(parents=True)
    (tmp_path / "render" / "test" / "oliver" / "2.gif").touch()
    page = make_html_file(str(tmp_path))
    html = open(page).read()
    assert "oliver" in html and "maher" in html
    assert "1.mp4" in html
    # mp4 embeds as <video>, the ffmpeg-less GIF fallback as <img>
    # (browsers do not play GIFs inside <video> tags)
    assert '<video controls src="render_oliver_maher/test/oliver/1.mp4"' \
        in html
    assert '<img src="render/test/oliver/2.gif"' in html


def test_html_snippets_compose_reference_report(tmp_path):
    """grid/index/description/heading snippet vocabulary + the reference
    makeHTMLfile composition (toHTML.py:17-76): bracketed-speaker-list dir,
    diagonal render/ vs off-diagonal render_<src>_<tgt>/, '0' corner marker
    cell, one grid per sample idx composed through the index template."""
    from mixstage_tpu.htmlgrid.snippets import (compose_index,
                                                get_html_snippet,
                                                get_list_files,
                                                make_html_report)

    exp = tmp_path / "exp_3_speaker_['oliver', 'maher']_model"
    for sp in ("oliver", "maher"):
        (exp / "render" / "test" / sp).mkdir(parents=True)
        (exp / "render" / "test" / sp / f"{sp}_0.mp4").touch()
    (exp / "render_oliver_maher" / "test" / "oliver").mkdir(parents=True)
    (exp / "render_oliver_maher" / "test" / "oliver" / "x.mp4").touch()

    files = get_list_files(str(exp), 0)
    assert files[0] == ["0", "oliver", "maher"]           # corner marker row
    assert files[1][0] == "oliver"
    assert files[1][1].startswith("render/test/oliver/")  # diagonal
    assert files[1][2].startswith("render_oliver_maher/") # off-diagonal
    assert files[2][2] == "render/test/maher/maher_0.mp4"

    page = make_html_report(str(exp), idxs=2)
    html = open(page).read()
    assert "Content \\ Style" in html            # '0' marker cell expanded
    assert html.count("<table>") == 2            # one grid per idx
    assert "render_oliver_maher/test/oliver/x.mp4" in html
    assert "<video" in html and "<style>" in html

    # the other two vocabularies + manual composition
    head = get_html_snippet("heading.html", {"h1": "Appendix B"})
    desc = get_html_snippet("description.html",
                            {"h1": "B1", "h2": "body orientation"})
    composed = compose_index([head, desc])
    assert '<h1 align="center">Appendix B</h1>' in composed
    assert "<u>B1</u>" in composed and "body orientation" in composed


def test_html_supplementary_page(tmp_path):
    from mixstage_tpu.htmlgrid.snippets import make_supplementary

    out = make_supplementary(
        [{"title": "B1. Body Orientation Style",
          "description": "left vs right",
          "names": [["1", "modelA"], ["oliver", "render/test/o/0.mp4"],
                    ["maher", "render/test/m/0.gif"]],
          "columns": [0, 1]}],
        title="Appendix B", out_path=str(tmp_path / "supp.html"))
    html = open(out).read()
    assert "Speaker \\ Model" in html            # '1' marker cell expanded
    assert "B1. Body Orientation Style" in html and "<video" in html
    assert '<img width="300" src="render/test/m/0.gif">' in html


def test_html_media_kind_by_suffix(tmp_path):
    """Media kind decided by SUFFIX, not substring ('gifford.mp4' is a
    video), and MJPEG .avi clips get a download link (browsers can't demux
    them — a <video> tag would show a dead player)."""
    from mixstage_tpu.htmlgrid.snippets import make_supplementary
    from mixstage_tpu.htmlgrid.to_html import _TEMPLATE

    out = make_supplementary(
        [{"title": "S", "description": "d",
          "names": [["oliver", "render/test/gifford/clip.mp4"],
                    ["maher", "render/test/m/clip.avi"]],
          "columns": [0, 1]}],
        title="T", out_path=str(tmp_path / "supp.html"))
    html = open(out).read()
    assert '<source src="render/test/gifford/clip.mp4"' in html  # not <img>
    assert '<img width="300" src="render/test/gifford' not in html
    assert '<a href="render/test/m/clip.avi" download>' in html

    page = _TEMPLATE.render(
        title="t", sources=["a"], targets=["b"],
        grid={("a", "b"): ["x/gifford.mp4", "x/clip.avi", "x/clip.gif"]})
    assert '<video controls src="x/gifford.mp4">' in page
    assert '<a href="x/clip.avi" download>' in page
    assert '<img src="x/clip.gif"' in page


def test_raster_native_matches_numpy_reference(raster_lib):
    """The C++ rasterizer and the pure-numpy fallback implement identical
    math (tapered-capsule coverage, per-bone uint8 quantization)."""
    from mixstage_tpu.animation import raster

    rng = np.random.default_rng(3)
    y = np.cumsum(rng.normal(size=(4, 2, 52)), 0) * 25
    native = raster.rasterize(y, PARENTS, panel=128)
    stack = np.ascontiguousarray(np.stack([np.asarray(y, np.float32)]))
    ref = raster._rasterize_numpy(
        stack, np.asarray(PARENTS, np.int32), raster.bone_colors(51),
        raster.bone_peak_widths(51), float(raster.MIN_W_PX), 128, 500.0)
    assert native.shape == ref.shape == (4, 128, 128, 3)
    np.testing.assert_array_equal(native, ref)
    assert (native < 250).mean() > 0  # some ink was drawn


def test_raster_bone_geometry_and_color():
    """A single horizontal bone lands at the expected pixels with the
    matplotlib C0 color; background stays white; panels tile horizontally."""
    from mixstage_tpu.animation import raster

    parents = np.array([-1, 0], np.int32)
    pose = np.zeros((2, 2, 2), np.float32)          # (T=2, 2, J=2)
    pose[:, 0, 0], pose[:, 0, 1] = -200.0, 200.0    # x: -200 → +200, y = 0
    frames = raster.rasterize([pose, pose], parents, panel=480)
    assert frames.shape == (2, 480, 960, 3)
    # world (0, 0) → pixel (240, 240); bone midpoint is at peak width
    assert tuple(frames[0, 240, 240]) == tuple(raster.TAB10_RGB[0])
    assert tuple(frames[0, 240, 240 + 480]) == tuple(raster.TAB10_RGB[0])
    assert (frames[0, 0, 0] == 255).all()
    # off the segment (same row, x outside endpoints) stays white
    assert (frames[0, 240, 40] == 255).all()
    # rows far above the bone stay white
    assert (frames[0, 100, :480] == 255).all()


def test_native_gif_encoder_roundtrip(tmp_path, raster_lib):
    """The native GIF89a/LZW encoder produces a bitstream PIL decodes back
    to exactly the nearest-palette mapping of the input frames."""
    from PIL import Image

    from mixstage_tpu.animation import raster

    y = np.cumsum(np.random.default_rng(1).normal(size=(6, 2, 52)), 0) * 10
    frames = raster.rasterize(y, PARENTS, panel=160)
    path = str(tmp_path / "clip.gif")
    raster.write_gif(frames, path, fps=15)
    im = Image.open(path)
    assert im.n_frames == 6
    assert im.info.get("loop") == 0          # NETSCAPE loop-forever
    assert im.info.get("duration") == 70     # ceil-ish of 100/15 cs → ms
    pal = raster.gif_palette().astype(np.int64)
    for t in range(6):
        im.seek(t)
        dec = np.asarray(im.convert("RGB"))
        orig = frames[t].astype(np.int64)
        d = ((orig[:, :, None, :] - pal[None, None]) ** 2).sum(-1)
        np.testing.assert_array_equal(dec, pal[d.argmin(-1)])


def test_native_gif_encoder_fuzz_random_noise(tmp_path, raster_lib):
    """Adversarial LZW input: random palette-color noise fills the 4096-code
    dictionary repeatedly (clear-code path) and defeats the delta encoder's
    dirty-rect optimization — decode must still be exact."""
    from PIL import Image

    from mixstage_tpu.animation import raster

    rng = np.random.default_rng(7)
    pal = raster.gif_palette()
    idx = rng.integers(0, len(pal), size=(4, 64, 64))
    frames = pal[idx]  # exact palette colors → decode must match bit-for-bit
    # make frame 2 identical to frame 1 (empty dirty rect → 1×1 carrier)
    frames[2] = frames[1]
    path = str(tmp_path / "noise.gif")
    raster.write_gif(frames, path, fps=10)
    im = Image.open(path)
    assert im.n_frames == 4
    for t in range(4):
        im.seek(t)
        np.testing.assert_array_equal(np.asarray(im.convert("RGB")),
                                      frames[t])


def test_gif_writer_pil_fallback(tmp_path, monkeypatch):
    """Without the native lib the GifWriter buffers frames and PIL writes at
    close — same file contract."""
    from PIL import Image

    from mixstage_tpu.animation import raster

    monkeypatch.setattr(raster, "get_lib", lambda: None)
    writer = raster.GifWriter(str(tmp_path / "fb.gif"), fps=10)
    assert writer.lib is None
    frames = np.full((3, 32, 32, 3), 255, np.uint8)
    for t in range(3):  # distinct frames (PIL merges identical ones)
        frames[t, 8 + t:12 + t, 8:12] = [31, 119, 180]
    writer.add(frames[:2])
    writer.add(frames[2:])
    writer.close()
    im = Image.open(tmp_path / "fb.gif")
    assert im.n_frames == 3


def test_animate_native_backend_writes_gif(tmp_path, monkeypatch):
    import pandas as pd
    from PIL import Image

    from mixstage_tpu.animation.animation import animate

    class FakeData:
        path2data = "/nonexistent"

        def getSpeaker(self, interval_id):
            return "oliver"

    monkeypatch.setenv("MIXSTAGE_RENDER_BACKEND", "native")
    y = np.cumsum(np.random.default_rng(0).normal(size=(6, 2, 52)), 0) * 10
    text = pd.DataFrame({"Word": ["hi", "there"], "start_frame": [0, 3],
                         "end_frame": [3, 6]})
    out = animate(y, "123", PARENTS, str(tmp_path), "test", FakeData(),
                  None, None, 0, None, text=text, fps=5)
    assert out.endswith(".gif")
    im = Image.open(out)
    assert im.n_frames == 6
    fr = np.asarray(im.convert("RGB"))
    assert fr.shape[0] > 480  # caption strip appended
    strip = fr[480:]
    red = (strip[..., 0] > 150) & (strip[..., 1] < 100) & (strip[..., 2] < 100)
    assert red.sum() > 0  # active word highlighted


def test_render_cli_restores_checkpoint_args(tmp_path, monkeypatch):
    """End-to-end render CLI on a fabricated experiment: the speaker list
    must come from the checkpoint's ``_args.args`` (reference render.py:23-27
    via get_args_update_dict), not the CLI defaults — regression for the
    getSpeaker IndexError on intervals of a non-default speaker."""
    import sys

    import pandas as pd

    from mixstage_tpu.config import config_from_dict
    from mixstage_tpu.data.hdf5 import HDF5
    from mixstage_tpu.data.synthetic import make_synthetic_dataset

    data_dir = tmp_path / "pats"
    make_synthetic_dataset(str(data_dir), speakers=["oliver", "maher"],
                           num_intervals_per_speaker=2)
    df = pd.read_csv(data_dir / "cmu_intervals_df.csv", dtype=str)
    # an interval of the speaker that is NOT the config default ('oliver')
    iid = df[df.speaker == "maher"]["interval_id"].iloc[0]

    save_dir = tmp_path / "save"
    save_dir.mkdir()
    prefix = save_dir / "exp_1_cpk_m_speaker_['oliver', 'maher']_model_M"
    cfg = config_from_dict(dict(
        path2data=str(data_dir), speaker=["oliver", "maher"],
        modalities=["pose/data", "audio/log_mel_512"], fs_new=[15, 15],
        save_dir=str(save_dir), exp=1, cpk="m", model="M"))
    cfg.save(f"{prefix}_args.args")
    kp = prefix / "keypoints" / "test" / "maher"
    kp.mkdir(parents=True)
    y = np.cumsum(np.random.default_rng(0).normal(size=(16, 104)), 0)
    HDF5.append((kp / f"{iid}.h5").as_posix(), "pose/data", y)

    monkeypatch.setenv("MIXSTAGE_RENDER_BACKEND", "native")
    monkeypatch.setattr(sys, "argv", [
        "render", "-load", f"{prefix}_weights.p", "-path2data", str(data_dir),
        "-render", "1"])
    from mixstage_tpu.cli.render import main
    main()
    out = prefix / "render" / "test" / "maher" / f"{iid}.gif"
    out_eval = prefix / "render_eval" / "test" / "maher" / f"{iid}.gif"
    assert out.exists() and out.stat().st_size > 0
    assert out_eval.exists() and out_eval.stat().st_size > 0


def test_frames_per_cluster_png_dump(tmp_path):
    """reference animation.py:418-460: frame i → <speaker>/<cluster_i>/
    frame_<i>.png; returns the speaker dir."""
    from mixstage_tpu.animation.animation import frames

    class FakeData:
        def getSpeaker(self, interval_id):
            return "oliver"

    y = np.cumsum(np.random.default_rng(0).normal(size=(5, 2, 52)), 0) * 10
    out = frames(y, [0, 1, 0, 2, 1], "7", PARENTS, str(tmp_path), FakeData(),
                 "style")
    base = tmp_path / "render_style" / "oliver"
    assert sorted(p.name for p in base.iterdir()) == ["0", "1", "2"]
    for i, c in enumerate([0, 1, 0, 2, 1]):
        assert (base / str(c) / f"frame_{i}.png").exists()
    assert str(out) == str(base)


def test_get_args_update_dict_tracks_typed_flags():
    from mixstage_tpu.config import config_from_dict, get_args_update_dict

    cfg = config_from_dict(dict(render=3, speaker=["x"], batch_size=7))
    upd = get_args_update_dict(
        cfg, argv=["-load", "w.p", "-render", "3", "--batch_size", "7",
                   "-notaflag", "1"])
    # typed flags captured with cfg values; load and unknowns excluded
    assert upd == {"render": 3, "batch_size": 7}


def test_split_text_wraps_at_line_length():
    import pandas as pd

    from mixstage_tpu.animation.animation import split_text

    words = ["alpha", "beta", "gamma", "deltafour", "eps", "unbelievably",
             "zed"]
    text = pd.DataFrame({"Word": words, "start_frame": range(7),
                         "end_frame": range(1, 8)})
    lines = split_text(text, max_length=27)
    # every line fits in the budget (len(word)+1 per word, first word len)
    for line in lines:
        ws = [str(w) for w in line["Word"]]
        assert len(ws[0]) + sum(len(w) + 1 for w in ws[1:]) <= 27
    # no word lost, order preserved
    assert [w for line in lines for w in line["Word"]] == words


def test_get_line_segments_shape_and_endpoints():
    from mixstage_tpu.animation.animation import get_line_segments

    seg = get_line_segments(x=[0.0, 2.0], y=[1.0, -1.0], num_segments=20)
    assert seg.shape == (20, 2, 2)
    np.testing.assert_allclose(seg[0, 0], [0.0, 1.0])
    np.testing.assert_allclose(seg[-1, 1], [2.0, -1.0])
    # consecutive segments share endpoints
    np.testing.assert_allclose(seg[:-1, 1], seg[1:, 0])
    # degenerate bone: all segments collapse to the point
    seg0 = get_line_segments(x=[3.0, 3.0], y=[4.0, 4.0], num_segments=8)
    assert seg0.shape == (8, 2, 2)
    np.testing.assert_allclose(seg0, 3.0 * np.ones_like(seg0) *
                               np.array([1.0, 4.0 / 3.0]))


def test_make_html_file_loop_cli(tmp_path, monkeypatch):
    """Standalone HTML CLI (reference toHTML.py:78-93): restore args from
    the checkpoint, rebuild videos.html + videos_subset.html in the
    experiment dir."""
    import sys

    from mixstage_tpu.config import config_from_dict

    save_dir = tmp_path
    prefix = save_dir / "exp_9_cpk_m_speaker_oliver_model_M"
    cfg = config_from_dict(dict(save_dir=str(save_dir), exp=9, cpk="m",
                                speaker="oliver", model="M", note=None,
                                render=2))
    cfg.save(f"{prefix}_args.args")
    vid = prefix / "render_oliver_maher" / "test" / "oliver"
    vid.mkdir(parents=True)
    (vid / "1.mp4").touch()

    monkeypatch.setattr(sys, "argv",
                        ["to_html", "-load", f"{prefix}_weights.p"])
    from mixstage_tpu.htmlgrid.to_html import main
    main()
    assert (prefix / "videos.html").exists()
    assert (prefix / "videos_subset.html").exists()
    assert "1.mp4" in (prefix / "videos.html").read_text()


def test_layer_power_of_two_utils():
    from mixstage_tpu.models.layers import (next_multiple_power_of_two,
                                            num_powers_of_two)

    assert num_powers_of_two(64) == 6
    assert num_powers_of_two(12) == 2
    assert num_powers_of_two(7) == 0
    assert next_multiple_power_of_two(12, power=5) == 96   # 12 * 2^3
    assert next_multiple_power_of_two(64, power=5) == 64   # already 2^5-able


def test_in_modalities_helper():
    from mixstage_tpu.animation.animation import in_modalities

    assert in_modalities("text", ["pose/data", "text/bert"])
    assert not in_modalities("text", ["pose/data", "audio/log_mel_512"])


def test_render_streaming_matches_oneshot(tmp_path, raster_lib):
    """Chunked streaming render (bounded memory) is byte-identical to the
    one-shot path, captions included."""
    import pandas as pd

    from mixstage_tpu.animation import raster

    y = np.cumsum(np.random.default_rng(2).normal(size=(50, 2, 52)), 0) * 10
    text = pd.DataFrame({"Word": [f"w{i}" for i in range(10)],
                         "start_frame": np.arange(10) * 5,
                         "end_frame": np.arange(1, 11) * 5})
    a = tmp_path / "stream.gif"
    b = tmp_path / "oneshot.gif"
    raster.render_to_file([y, y], PARENTS, str(a), text=text, panel=128,
                          chunk_frames=16)
    raster.render_to_file([y, y], PARENTS, str(b), text=text, panel=128,
                          chunk_frames=10 ** 9)
    assert a.read_bytes() == b.read_bytes()


def test_bookkeeper_restore_does_not_rewrite_args(tmp_path):
    """Restoring an experiment must not bake inference-time CLI overrides
    into the stored PREFIX_args.args (advisor-style atomicity of the
    training record)."""
    import json

    from mixstage_tpu.bookkeeping import BookKeeper
    from mixstage_tpu.config import config_from_dict

    cfg = config_from_dict(dict(save_dir=str(tmp_path), exp=1, cpk="m",
                                speaker="oliver", model="M",
                                window_hop=5, render=0))
    book = BookKeeper(cfg)
    args_file = book.name("args", "args", str(tmp_path))
    before = open(args_file).read()

    cfg2 = config_from_dict(dict(
        load=args_file.replace("_args.args", "_weights.p"),
        save_dir=str(tmp_path)))
    book2 = BookKeeper(cfg2, args_dict_update={"window_hop": 0, "render": 3})
    assert book2.args.window_hop == 0 and book2.args.render == 3  # in memory
    after = open(args_file).read()
    assert after == before                       # on disk: untouched
    assert json.loads(after)["window_hop"] == 5


def test_save_animation_thread_fanout(tmp_path, monkeypatch):
    """save_animation (reference animation.py:304-333) renders every
    interval through the joblib thread map; files land per split/speaker."""
    from mixstage_tpu.animation.animation import save_animation

    class FakeModality:
        parents = PARENTS

    class FakeData:
        path2data = "/nonexistent"
        modality_classes = {"pose/data": FakeModality()}

        def getSpeaker(self, interval_id):
            return "oliver"

    monkeypatch.setenv("MIXSTAGE_RENDER_BACKEND", "native")
    rng = np.random.default_rng(0)
    ys = [np.cumsum(rng.normal(size=(6, 2, 52)), 0) * 10 for _ in range(3)]
    save_animation(ys, ["11", "22", "33"], str(tmp_path), "dev", FakeData(),
                   idx=0, subname=None)
    for iid in ("11", "22", "33"):
        out = tmp_path / "render" / "dev" / "oliver" / f"{iid}_000.gif"
        assert out.exists() and out.stat().st_size > 0


def test_render_ground_truth(tmp_path, monkeypatch):
    """render_ground_truth (reference animation.py:345-415): GT intervals →
    render_gt/<split>/<speaker> clips, captions only when a text modality is
    configured."""
    from types import SimpleNamespace

    from mixstage_tpu.animation.animation import render_ground_truth
    from mixstage_tpu.data.synthetic import make_synthetic_dataset

    data_dir = tmp_path / "pats"
    # intervals must cover the 4.3 s / 64-frame window (time * fs)
    make_synthetic_dataset(str(data_dir), ["oliver"],
                           num_intervals_per_speaker=3, interval_seconds=6.0)
    monkeypatch.setenv("MIXSTAGE_RENDER_BACKEND", "native")
    args = SimpleNamespace(
        path2data=str(data_dir), speaker=["oliver"],
        modalities=["pose/data", "audio/log_mel_512"], fs_new=[15, 15],
        time=4.3, split=None, batch_size=4, shuffle=0,
        output_modalities=["pose/data"],
        path2outdata=str(tmp_path / "out"))
    render_ground_truth(args, 0)
    gifs = list((tmp_path / "out").rglob("*.gif"))
    assert len(gifs) >= 1
    # files live under <speaker>/render_gt/<split>/<speaker>
    assert any("render_gt" in p.as_posix() for p in gifs)
