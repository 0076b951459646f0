"""Text preprocessing tests: not-aligned transcript bootstrap (reference
text.py:142-237), text/meta round-trip, subword frame distribution
(text.py:293-329), and BertSentenceBatching shapes (text.py:507-537)."""

import numpy as np
import pytest

from mixstage_tpu.data.hdf5 import HDF5
from mixstage_tpu.data.synthetic import make_synthetic_dataset
from mixstage_tpu.data.text import (Text, distribute_frames_over_subwords,
                                    read_text_meta, write_text_meta,
                                    _expand_subwords, _to_seconds)


@pytest.fixture(scope="module")
def raw_synth(tmp_path_factory):
    path = tmp_path_factory.mktemp("pats_raw")
    make_synthetic_dataset(str(path), speakers=["oliver", "maher"],
                           num_intervals_per_speaker=3,
                           with_raw_transcripts=True)
    return str(path)


def test_to_seconds_both_formats():
    assert _to_seconds("0 days 0:00:25.500000") == 25.5
    assert _to_seconds("0:01:00.000") == 60.0


def test_not_aligned_bootstraps_text_meta(raw_synth):
    text = Text(path2data=raw_synth, path2outdata=raw_synth,
                speaker=["oliver"], preprocess_methods=["w2v", "pos"],
                text_aligned=0)
    text.preprocess()
    df_sp = text.get_df_subset("speaker", "oliver")
    for interval_id in df_sp["interval_id"].unique():
        fn = f"{raw_synth}/processed/oliver/{interval_id}.h5"
        meta = read_text_meta(fn)
        assert meta is not None, f"text/meta missing for {interval_id}"
        num_frames = HDF5.load_array(fn, "pose/data").shape[0]
        starts = meta["start_frame"].values
        ends = meta["end_frame"].values
        # contiguous word spans: frame 0 → max_len (reference text.py:199-210)
        assert starts[0] == 0
        assert ends[-1] == num_frames
        assert (starts[1:] == ends[:-1]).all()
        assert (ends >= starts).all()
        # embeddings frame-aligned with pose
        w2v = HDF5.load_array(fn, "text/w2v")
        assert w2v.shape == (num_frames, 300)
        pos = HDF5.load_array(fn, "text/pos")
        assert pos.shape == (num_frames,)
    # nothing from this speaker in the missing ledger
    missing = text.missing.load_intervals()
    assert not (set(df_sp["interval_id"]) & missing)


@pytest.mark.slow
def test_aligned_path_reuses_bootstrapped_meta(raw_synth):
    # after the not-aligned pass wrote text/meta, the aligned path must work.
    # Self-sufficient (bootstraps its own meta, on the speaker the fast-tier
    # test does NOT touch) so it passes when the slow tier runs alone.
    boot = Text(path2data=raw_synth, path2outdata=raw_synth,
                speaker=["maher"], preprocess_methods=["pos"],
                text_aligned=0)
    boot.preprocess()
    text = Text(path2data=raw_synth, path2outdata=raw_synth,
                speaker=["maher"], preprocess_methods=["tokens"],
                text_aligned=1)
    text.preprocess()
    df_sp = text.get_df_subset("speaker", "maher")
    interval_id = df_sp["interval_id"].iloc[0]
    fn = f"{raw_synth}/processed/maher/{interval_id}.h5"
    toks = HDF5.load_array(fn, "text/tokens")
    assert toks.shape == (HDF5.load_array(fn, "pose/data").shape[0],)


def test_text_meta_roundtrip(tmp_path):
    import pandas as pd

    fn = tmp_path / "x.h5"
    meta = pd.DataFrame({"Word": ["hello", "world"],
                         "start_frame": [0, 7], "end_frame": [7, 20]})
    write_text_meta(fn, meta)
    out = read_text_meta(fn)
    assert list(out["Word"]) == ["hello", "world"]
    assert list(out["start_frame"]) == [0, 7]
    assert list(out["end_frame"]) == [7, 20]
    # create-only: second write with different content is a no-op
    write_text_meta(fn, meta.assign(Word=["a", "b"]))
    assert list(read_text_meta(fn)["Word"]) == ["hello", "world"]


def test_distribute_frames_over_subwords():
    # 'unbelievable' → un ##believ ##able: 10 frames → 3+3+4 (remainder last)
    out = distribute_frames_over_subwords(
        ["unbelievable", "yes"], [10, 5], ["un", "##believ", "##able", "yes"])
    assert out == [(0, 3), (0, 3), (0, 4), (1, 5)]
    # ungroupable trailing token gets (-1, 0)
    out = distribute_frames_over_subwords(["yes"], [4], ["yes", "##zzz"])
    assert out == [(0, 4), (-1, 0)]


def test_expand_subwords_fills_spans():
    vecs = np.array([[1.0], [2.0], [3.0]])
    assignments = [(0, 2), (0, 1), (1, 3)]
    out = _expand_subwords(vecs, assignments, starts=[0, 3], ends=[3, 6],
                           num_frames=6)
    assert out[:, 0].tolist() == [1, 1, 2, 3, 3, 3]


@pytest.mark.slow
def test_bert_sentence_batching_shapes():
    from mixstage_tpu.data.text import BertSentenceBatching

    b = BertSentenceBatching()
    if b.tokenizer is None:
        pytest.skip("bert tokenizer not available offline")
    ids, mask, toks = b(["hello world this is a test"])
    assert ids.shape == mask.shape
    assert toks[0][0] == "[CLS]"
    assert mask.sum() == ids.shape[1]  # single short chunk, no padding
    # long input chunks at 510 tokens per row
    ids2, mask2, toks2 = b([" ".join(["word"] * 1200)])
    assert ids2.shape[0] == 3
    assert ids2.shape[1] <= 512
