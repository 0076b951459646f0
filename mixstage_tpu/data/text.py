"""Text modality: frame-aligned transcript embeddings + offline CLI.

Parity target: reference ``Text`` (``/root/reference/src/data/text.py:72-387``)
— both the *aligned* path (pre-existing ``text/meta`` tables, text.py:119-140)
and the *not-aligned* path that bootstraps ``text/meta`` from raw
``*_transcripts/*.csv`` word timings (text.py:142-237) — plus its embedders:
Word2Vec (:413-452), frozen-BERT sequence embeddings (:459-505),
``BertSentenceBatching`` (:507-537), POS tagging as alternative cluster
labels (:539-572), and ``collate_fn_pad`` (:56-70).

Heavy NLP deps (gensim word2vec weights, BERT, nltk corpora) are optional at
import time and gated at call time, since the TPU training path consumes only
the *preprocessed* ``text/{w2v,bert,tokens,pos}`` h5 datasets.

``text/meta`` storage: the reference writes the per-word frame-span table via
``pandas.to_hdf`` (pytables format, text.py:236).  pytables is not available
in every deployment, so the rebuild writes an h5py-native group
(``text/meta/{Word,start_frame,end_frame}``) and the reader falls back to
``pd.read_hdf`` for original PATS files when pytables is importable.
"""

from __future__ import annotations

import os
import warnings
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from mixstage_tpu.data.common import MissingData, Modality
from mixstage_tpu.data.hdf5 import HDF5

W2V_DIM = 300
BERT_DIM = 768
TEXT_FS = 15  # words are frame-aligned to the pose stream (text.py:383)


def write_text_meta(filename, meta: pd.DataFrame) -> None:
    """Persist the per-word frame-span table (reference text.py:231-236).

    h5py-native layout: vlen-str ``text/meta/Word`` plus int
    ``text/meta/{start_frame,end_frame}``.  Written create-only, like the
    reference's ``isDatasetInFile`` guard.
    """
    import h5py

    if HDF5.isDatasetInFile(filename, "text/meta/Word"):
        return
    dt = h5py.special_dtype(vlen=str)
    words = np.array([str(w) for w in meta["Word"].values], dtype=dt)
    HDF5.append(filename, "text/meta/Word", words)
    HDF5.append(filename, "text/meta/start_frame",
                meta["start_frame"].values.astype(np.int64))
    HDF5.append(filename, "text/meta/end_frame",
                meta["end_frame"].values.astype(np.int64))


def read_text_meta(filename) -> Optional[pd.DataFrame]:
    """Load ``text/meta`` as a DataFrame: tries the h5py-native layout first,
    then ``pd.read_hdf`` (original pytables-format PATS files)."""
    try:
        if HDF5.isDatasetInFile(filename, "text/meta/Word"):
            words = HDF5.load_array(filename, "text/meta/Word")
            words = [w.decode() if isinstance(w, bytes) else str(w)
                     for w in words]
            return pd.DataFrame({
                "Word": words,
                "start_frame": HDF5.load_array(filename,
                                               "text/meta/start_frame"),
                "end_frame": HDF5.load_array(filename,
                                             "text/meta/end_frame")})
    except Exception as e:  # noqa: BLE001
        warnings.warn(f"native text/meta read failed for {filename}: {e}")
    try:
        return pd.read_hdf(filename, key="text/meta")
    except Exception:
        return None

# Penn-treebank coarse tag classes used as POS cluster labels
# (reference text.py:539-572)
POS_TAGSET = ["NOUN", "VERB", "ADJ", "ADV", "PRON", "DET", "ADP", "NUM",
              "CONJ", "PRT", ".", "X"]


class Word2VecEmbedder:
    """GoogleNews-300 word2vec lookup (reference text.py:413-452)."""

    def __init__(self, path2weights: Optional[str] = None):
        self.model = None
        if path2weights:
            try:
                from gensim.models import KeyedVectors

                self.model = KeyedVectors.load_word2vec_format(
                    path2weights, binary=True)
            except ImportError:
                warnings.warn("gensim unavailable; Word2VecEmbedder disabled")

    def __call__(self, words: List[str]) -> np.ndarray:
        out = np.zeros((len(words), W2V_DIM))
        if self.model is None:
            return out
        for i, w in enumerate(words):
            if w in self.model:
                out[i] = self.model[w]
        return out


class BertEmbedder:
    """Frozen bert-base-uncased sequence embeddings with subword→word frame
    alignment (reference text.py:459-505)."""

    def __init__(self):
        try:
            import torch
            from transformers import BertModel, BertTokenizer

            self.tokenizer = BertTokenizer.from_pretrained("bert-base-uncased")
            self.model = BertModel.from_pretrained("bert-base-uncased").eval()
            self.torch = torch
        except Exception as e:  # pragma: no cover - heavy optional dep
            warnings.warn(f"BERT unavailable: {e}")
            self.model = None

    def __call__(self, words: List[str]) -> np.ndarray:
        if self.model is None:
            return np.zeros((len(words), BERT_DIM))
        torch = self.torch
        enc = self.tokenizer(" ".join(words), return_tensors="pt",
                             truncation=True, max_length=512)
        with torch.no_grad():
            hidden = self.model(**enc).last_hidden_state[0]  # (subwords, 768)
        tokens = self.tokenizer.convert_ids_to_tokens(enc["input_ids"][0])
        # average subword vectors per word (text.py:293-329)
        out = np.zeros((len(words), BERT_DIM))
        wi, acc, cnt = 0, np.zeros(BERT_DIM), 0
        for tok, vec in zip(tokens[1:-1], hidden[1:-1]):
            cont = tok.startswith("##")
            if not cont and cnt > 0:
                if wi < len(words):
                    out[wi] = acc / cnt
                wi, acc, cnt = wi + 1, np.zeros(BERT_DIM), 0
            acc = acc + vec.numpy()
            cnt += 1
        if cnt > 0 and wi < len(words):
            out[wi] = acc / cnt
        return out

    def subword_embed(self, words: List[str]):
        """Per-subword hidden states + tokens, [CLS]/[SEP] stripped — the
        inputs to the reference's per-subword frame distribution
        (text.py:283-329).  None when BERT is unavailable."""
        if self.model is None:
            return None
        torch = self.torch
        enc = self.tokenizer(" ".join(w.lower() for w in words),
                             return_tensors="pt", truncation=True,
                             max_length=512)
        with torch.no_grad():
            hidden = self.model(**enc).last_hidden_state[0]
        tokens = self.tokenizer.convert_ids_to_tokens(enc["input_ids"][0])
        return hidden[1:-1].numpy(), tokens[1:-1]


class BertSentenceBatching:
    """Sentences → BERT token ids + mask (reference text.py:507-537).

    Tokenizes, chunks a single long input into ≤510-token windows, wraps each
    chunk in [CLS]/[SEP], pads rows with [SEP] and returns
    ``(ids (B, L) int64, mask (B, L) int64, tokens list-of-lists)`` as numpy.
    """

    def __init__(self):
        self.tokenizer = None
        try:
            from transformers import BertTokenizer

            self.tokenizer = BertTokenizer.from_pretrained("bert-base-uncased")
        except Exception as e:  # pragma: no cover - needs cached weights
            warnings.warn(f"BERT tokenizer unavailable: {e}")

    def __call__(self, sentences: List[str]):
        if self.tokenizer is None:
            return None, None, None
        toks = [self.tokenizer.tokenize(s) for s in sentences]
        if len(toks) == 1:
            # batch-1: split into chunks of <=510 (text.py:530-531)
            flat = toks[0]
            toks = [flat[i:i + 510] for i in range(0, max(len(flat), 1), 510)]
        toks = [["[CLS]"] + t + ["[SEP]"] for t in toks]
        max_len = max(len(t) for t in toks)
        mask = np.array([[1] * len(t) + [0] * (max_len - len(t))
                         for t in toks], dtype=np.int64)
        toks = [t + ["[SEP]"] * (max_len - len(t)) for t in toks]
        ids = np.array([self.tokenizer.convert_tokens_to_ids(t) for t in toks],
                       dtype=np.int64)
        return ids, mask, toks


def distribute_frames_over_subwords(words: List[str],
                                    delta_frames: List[int],
                                    subword_tokens: List[str]):
    """Split each word's frame span across its BERT subword tokens
    (reference text.py:293-316 / 353-365): integer division per subword,
    remainder folded into the last subword.  ``subword_tokens`` excludes
    [CLS]/[SEP].  Returns one ``(word_index, n_frames)`` pair per subword
    (``(-1, 0)`` for tokens that could not be grouped back into a word)."""
    out: List = []
    count, piece = 0, []
    for tok in subword_tokens:
        piece.append(tok[2:] if tok.startswith("##") else tok)
        if count < len(words) and (
                "".join(piece) == words[count].lower()
                or tok == "[UNK]" or len(piece) > 20):
            n = len(piece)
            share = [int(delta_frames[count] / n)] * n
            share[-1] = int(delta_frames[count]) - sum(share[:-1])
            out += [(count, s) for s in share]
            piece = []
            count += 1
    out += [(-1, 0)] * (len(subword_tokens) - len(out))
    return out


def _expand_subwords(vecs: np.ndarray, assignments, starts, ends,
                     num_frames: int) -> np.ndarray:
    """Write each subword's vector into its share of the owning word's frame
    span (reference text.py:318-327)."""
    out = np.zeros((num_frames, vecs.shape[-1]))
    cursors = {i: int(starts[i]) for i in range(len(starts))}
    for (wi, nf), vec in zip(assignments, vecs):
        if wi < 0 or nf <= 0:
            continue
        s = cursors[wi]
        e = min(s + nf, int(ends[wi]), num_frames)
        if e > s:
            out[s:e] = vec
        cursors[wi] = s + nf
    return out


def _to_seconds(timestr) -> float:
    """'0 days 00:00:25.000' or '0:00:25.00' → seconds (reference
    text.py:146-147 via ``pd.to_timedelta(... .str.split().str[1])``)."""
    return pd.to_timedelta(str(timestr).split()[-1]).total_seconds()


def pos_tags(words: List[str]) -> np.ndarray:
    """Universal POS tag-class labels (reference text.py:539-572)."""
    try:
        import nltk

        tags = nltk.pos_tag(words, tagset="universal")
        return np.array([POS_TAGSET.index(t) if t in POS_TAGSET
                         else POS_TAGSET.index("X") for _, t in tags])
    except Exception:
        return np.zeros(len(words), dtype=np.int64)


def collate_fn_pad(batch: List[Dict], pad_key: List[str], dim: int = 0):
    """Pad variable-length text arrays across a batch and emit
    ``text/token_count`` (reference text.py:56-70).  Works on numpy dicts."""
    out: Dict[str, np.ndarray] = {}
    keys = batch[0].keys()
    for key in keys:
        vals = [b[key] for b in batch]
        if key in pad_key and isinstance(vals[0], np.ndarray):
            max_len = max(v.shape[dim] for v in vals)
            padded, counts = [], []
            for v in vals:
                pad_width = [(0, 0)] * v.ndim
                pad_width[dim] = (0, max_len - v.shape[dim])
                padded.append(np.pad(v, pad_width))
                counts.append(v.shape[dim])
            out[key] = np.stack(padded)
            out["text/token_count"] = np.array(counts)
        elif key == "meta":
            out[key] = {k: [v[k] for v in vals] for k in vals[0]}
        elif isinstance(vals[0], np.ndarray):
            out[key] = np.stack(vals)
        else:
            out[key] = np.asarray(vals)
    return out


class Text(Modality):
    """Transcripts → frame-aligned ``text/*`` h5 datasets."""

    def __init__(self, path2data="../dataset/groot/data",
                 path2outdata="../dataset/groot/data", speaker="all",
                 preprocess_methods=("w2v",), text_aligned=1):
        super().__init__(path2data=path2data, path2outdata=path2outdata,
                         speaker=speaker, preprocess_methods=preprocess_methods)
        self.missing = MissingData(self.path2data)
        self.text_aligned = text_aligned
        self._embedders: Dict[str, object] = {}

    def fs(self, modality):
        return 15  # frame-aligned to pose fs

    @property
    def h5_key(self):
        return "text"

    def embedder(self, method):
        if method not in self._embedders:
            if method == "w2v":
                self._embedders[method] = Word2VecEmbedder()
            elif method == "bert":
                self._embedders[method] = BertEmbedder()
            elif method == "tokens":
                self._embedders[method] = BertSentenceBatching()
        return self._embedders.get(method)

    def frame_align(self, words: List[str], starts: np.ndarray,
                    ends: np.ndarray, vecs: np.ndarray,
                    num_frames: int) -> np.ndarray:
        """Repeat each word vector across its [start_frame, end_frame) span
        (reference text.py:226-237)."""
        out = np.zeros((num_frames, vecs.shape[-1]))
        for i in range(len(words)):
            s = int(max(0, starts[i]))
            e = int(min(num_frames, ends[i]))
            if e > s:
                out[s:e] = vecs[i]
        return out

    def preprocess(self):
        speakers = self.speaker if self.speaker[0] != "all" else self.speakers
        if self.text_aligned:
            self.text_aligned_preprocessing(speakers)
        else:
            self.text_not_aligned_preprocessing(speakers)

    # -- aligned path: text/meta already on disk (reference text.py:119-140) --
    def text_aligned_preprocessing(self, speakers):
        for speaker in speakers:
            df_speaker = self.get_df_subset("speaker", speaker)
            missing = []
            for interval_id in df_speaker["interval_id"].unique():
                missing.append(self.save_interval(interval_id, speaker))
            self.missing.save_intervals(missing)

    # -- not-aligned path: bootstrap text/meta from raw transcript CSVs
    #    (reference text.py:142-237) --------------------------------------
    def text_not_aligned_preprocessing(self, speakers):
        for speaker in speakers:
            df_speaker = self.get_df_subset("speaker", speaker).copy()
            df_speaker["video_id"] = df_speaker["video_link"].apply(
                lambda x: str(x).split("=")[-1])
            df_speaker["Start"] = df_speaker["start_time"].apply(
                _to_seconds)
            df_speaker["End"] = df_speaker["end_time"].apply(_to_seconds)
            interval_ids = df_speaker["interval_id"].unique()
            parent = Path(self.path2data) / "raw" / speaker
            done: List[str] = []
            if parent.exists():
                # raw/<speaker>/<video>_transcripts/<video>.csv
                tdirs = [d for d in os.listdir(parent)
                         if d.split("_")[-1] == "transcripts"]
                rels = ["{}/{}.csv".format(d, "_".join(d.split("_")[:-1]))
                        for d in tdirs]
                rels = [r for r in rels if (parent / r).exists()]
                for rel in rels:
                    done += self.get_intervals_from_video(
                        Path(rel).stem, df_speaker, parent / rel, speaker)
            self.missing.save_intervals(set(interval_ids) - set(done))

    def find_interval_for_words(self, end_time, df_video) -> Optional[str]:
        """Interval whose [Start, End) covers the word's end time
        (reference text.py:221-229)."""
        ids = df_video[(df_video["End"] >= end_time)
                       & (df_video["Start"] < end_time)]["interval_id"]
        if ids.shape[0] > 1:
            warnings.warn("More than one interval for one word")
        if ids.shape[0] == 0:
            return None
        return str(ids.iloc[0])

    def get_intervals_from_video(self, key, df_speaker, path2csv,
                                 speaker) -> List[str]:
        """Assign transcript words of one video to intervals, compute word
        frame spans, write text/meta + embeddings (reference text.py:171-218).
        Returns the interval ids found for this video."""
        text = pd.read_csv(path2csv)
        if key[:2] == "_-":
            key = key[2:]
        df_video = df_speaker[df_speaker["video_id"] == key] \
            .sort_values(by="start_time")
        if df_video.empty:  # non-youtube videos (text.py:182-184)
            new_key = "-".join(key.split("-")[-5:])
            df_video = df_speaker[df_speaker["video_id"].apply(
                lambda x: new_key in x)].sort_values(by="start_time")
        text["interval_id"] = text["End"].apply(
            self.find_interval_for_words, args=(df_video,))
        interval_ids = [i for i in text["interval_id"].unique()
                        if i is not None]
        done = []
        for interval_id in interval_ids:
            filename = (Path(self.path2outdata) / "processed" / speaker
                        / f"{interval_id}.h5")
            try:
                max_len = self.load_array(filename, "pose/data").shape[0]
            except Exception:  # interval missing on disk (text.py:196-197)
                continue
            row = self.df[self.df["interval_id"] == interval_id]
            start_offset = _to_seconds(row["start_time"].iloc[0])
            subtext = text[text["interval_id"] == interval_id].reset_index()
            # word boundaries: first word starts at frame 0, each next word
            # starts where the previous ends, last ends at max_len
            # (text.py:199-210)
            starts, ends = [], []
            for i, r in subtext.iterrows():
                if i == 0:
                    starts.append(0)
                else:
                    starts.append(int(min(
                        int((r["Start"] - start_offset) * self.fs("text")),
                        max_len)))
                    ends.append(starts[-1])
            ends.append(max_len)
            subtext = subtext.assign(start_frame=starts, end_frame=ends)
            if self.save_interval_from_meta(interval_id, speaker,
                                            subtext) is None:
                done.append(interval_id)
        return done

    def save_interval_from_meta(self, interval_id, speaker,
                                meta: pd.DataFrame) -> Optional[str]:
        """Write text/meta then the embeddings (reference text.py:231-253)."""
        filename = (Path(self.path2outdata) / "processed" / speaker
                    / f"{interval_id}.h5")
        try:
            write_text_meta(filename, meta)
            return self._embed_and_save(filename, interval_id, meta)
        except Exception as e:  # noqa: BLE001
            warnings.warn(f"text preprocess failed for {interval_id}: {e}")
            return interval_id

    def save_interval(self, interval_id, speaker) -> Optional[str]:
        filename = (Path(self.path2outdata) / "processed" / speaker
                    / f"{interval_id}.h5")
        meta = read_text_meta(filename)
        if meta is None:
            warnings.warn(f"text/meta missing for {interval_id}")
            return interval_id
        try:
            return self._embed_and_save(filename, interval_id, meta)
        except Exception as e:  # noqa: BLE001
            warnings.warn(f"text preprocess failed for {interval_id}: {e}")
            return interval_id

    def _embed_and_save(self, filename, interval_id,
                        meta: pd.DataFrame) -> Optional[str]:
        """Frame-align each preprocess method's features and append to h5
        (reference process_interval, text.py:256-281)."""
        num_frames = self.load_array(filename, "pose/data").shape[0]
        words = [str(w) for w in meta["Word"].values]
        starts = np.asarray(meta["start_frame"].values, dtype=np.int64)
        ends = np.asarray(meta["end_frame"].values, dtype=np.int64)
        for method in self.preprocess_methods:
            if method == "w2v":
                vecs = self.embedder(method)(words)
                aligned = self.frame_align(words, starts, ends, vecs,
                                           num_frames)
            elif method == "bert":
                aligned = self._bert_aligned(words, starts, ends, num_frames)
            elif method == "pos":
                labels = pos_tags(words)
                aligned = self.frame_align(words, starts, ends,
                                           labels[:, None].astype(float),
                                           num_frames)[:, 0]
            elif method == "tokens":
                aligned = self._tokens_aligned(words, starts, ends,
                                               num_frames)
            else:
                continue
            self.append(filename, self.add_key(self.h5_key, [method]),
                        aligned)
        return None

    def _bert_aligned(self, words, starts, ends, num_frames) -> np.ndarray:
        """Per-subword BERT embeddings distributed over each word's frame
        span (reference bert(), text.py:283-329); word-mean fallback when the
        tokenizer stack is unavailable."""
        emb = self.embedder("bert")
        sub = emb.subword_embed(words) if getattr(emb, "model", None) else None
        if sub is None:
            vecs = emb(words)
            return self.frame_align(words, starts, ends, vecs, num_frames)
        vecs, tokens = sub
        delta = (ends - starts).astype(int).tolist()
        assignments = distribute_frames_over_subwords(words, delta, tokens)
        return _expand_subwords(vecs, assignments, starts, ends, num_frames)

    def _tokens_aligned(self, words, starts, ends, num_frames) -> np.ndarray:
        """Frame-aligned BERT token ids (reference bert_tokens,
        text.py:331-376); word-index fallback without the tokenizer."""
        batcher = self.embedder("tokens")
        ids, mask, toks = batcher([" ".join(w.lower() for w in words)]) \
            if batcher and batcher.tokenizer else (None, None, None)
        if ids is None:
            idx = np.arange(len(words), dtype=float)[:, None]
            return self.frame_align(words, starts, ends, idx, num_frames)[:, 0]
        # strip [CLS]/[SEP] per row and flatten (text.py:340-345)
        flat_ids, flat_toks = [], []
        for row_ids, row_mask, row_toks in zip(ids, mask, toks):
            n = int(row_mask.sum())
            flat_ids.extend(row_ids[1:n - 1].tolist())
            flat_toks.extend(row_toks[1:n - 1])
        delta = (ends - starts).astype(int).tolist()
        assignments = distribute_frames_over_subwords(words, delta, flat_toks)
        return _expand_subwords(np.asarray(flat_ids, dtype=float)[:, None],
                                assignments, starts, ends, num_frames)[:, 0]


if __name__ == "__main__":
    # Executable self-test (reference text.py:574-585 runs its preprocessing
    # main; heavy embedders are dep-gated here, so this exercises the pure
    # text machinery): subword frame distribution, expansion, padding
    # collate, and the pytables-free text/meta round-trip.
    import tempfile

    words = ["hello", "gesturing", "world"]
    delta = [10, 7, 3]
    toks = ["hello", "ges", "##tur", "##ing", "world"]
    assign = distribute_frames_over_subwords(words, delta, toks)
    print(f"subword assignment: {assign}")
    assert [a for a, _ in assign] == [0, 1, 1, 1, 2]
    assert sum(n for _, n in assign) == sum(delta)
    # per-word frame conservation
    for wi, d in enumerate(delta):
        assert sum(n for a, n in assign if a == wi) == d

    vecs = np.eye(5, 4)
    out = _expand_subwords(vecs, assign, starts=[0, 10, 17], ends=[10, 17, 20],
                           num_frames=20)
    assert out.shape == (20, 4) and np.abs(out).sum() > 0

    batch = [{"text/bert": np.ones((3, 8)), "idx": 0},
             {"text/bert": np.ones((5, 8)), "idx": 1}]
    coll = collate_fn_pad(batch, pad_key=["text/bert"])
    assert coll["text/bert"].shape == (2, 5, 8)
    assert coll["text/token_count"].tolist() == [3, 5]

    meta = pd.DataFrame({"Word": ["a", "b"], "start_frame": [0, 5],
                         "end_frame": [5, 9]})
    with tempfile.TemporaryDirectory() as tmp:
        fn = f"{tmp}/meta.h5"
        write_text_meta(fn, meta)
        back = read_text_meta(fn)
        assert list(back["Word"]) == ["a", "b"]
        assert list(back["end_frame"]) == [5, 9]
    print("Text self-test OK")
