"""Rendering + HTML grid + audio frontend tests."""

import numpy as np
import pytest

from mixstage_tpu.data.audio import (log_mel_400, log_mel_512,
                                     log_mel_spectrogram_jax, mel_filterbank,
                                     silence_vad)
from mixstage_tpu.data.skeleton import PARENTS
from mixstage_tpu.htmlgrid.to_html import make_html_file


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
    page = make_html_file(str(tmp_path))
    html = open(page).read()
    assert "oliver" in html and "maher" in html
    assert "1.mp4" in html


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
          "names": [["1", "modelA"], ["oliver", "render/test/o/0.mp4"]],
          "columns": [0, 1]}],
        title="Appendix B", out_path=str(tmp_path / "supp.html"))
    html = open(out).read()
    assert "Speaker \\ Model" in html            # '1' marker cell expanded
    assert "B1. Body Orientation Style" in html and "<video" in html


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
