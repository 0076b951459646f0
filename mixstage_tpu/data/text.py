"""Text modality: frame-aligned transcript embeddings + offline CLI.

Parity target: reference ``Text`` (``/root/reference/src/data/text.py:72-387``)
and its embedders: Word2Vec (:413-452), frozen-BERT sequence embeddings
(:459-505), POS tagging as alternative cluster labels (:539-572), and
``collate_fn_pad`` (:56-70).

Heavy NLP deps (gensim word2vec weights, BERT, nltk corpora) are optional at
import time and gated at call time, since the TPU training path consumes only
the *preprocessed* ``text/{w2v,bert,tokens,pos}`` h5 datasets.
"""

from __future__ import annotations

import warnings
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from mixstage_tpu.data.common import MissingData, Modality

W2V_DIM = 300
BERT_DIM = 768

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
        for speaker in speakers:
            df_speaker = self.get_df_subset("speaker", speaker)
            missing = []
            for interval_id in df_speaker["interval_id"].unique():
                missing.append(self.save_interval(interval_id, speaker))
            self.missing.save_intervals(missing)

    def save_interval(self, interval_id, speaker) -> Optional[str]:
        filename = (Path(self.path2outdata) / "processed" / speaker
                    / f"{interval_id}.h5")
        try:
            meta = pd.read_hdf(filename, key="text/meta")
        except Exception:
            warnings.warn(f"text/meta missing for {interval_id}")
            return interval_id
        try:
            pose = np.asarray(
                self.load_array(filename, "pose/data"))
            num_frames = pose.shape[0]
            words = [str(w) for w in meta["Word"].values]
            starts = meta["start_frame"].values
            ends = meta["end_frame"].values
            for method in self.preprocess_methods:
                if method in ("w2v", "bert"):
                    vecs = self.embedder(method)(words)
                    aligned = self.frame_align(words, starts, ends, vecs,
                                               num_frames)
                elif method == "pos":
                    labels = pos_tags(words)
                    aligned = self.frame_align(words, starts, ends,
                                               labels[:, None].astype(float),
                                               num_frames)[:, 0]
                elif method == "tokens":
                    idx = np.arange(len(words), dtype=float)[:, None]
                    aligned = self.frame_align(words, starts, ends, idx,
                                               num_frames)[:, 0]
                else:
                    continue
                self.append(filename, self.add_key(self.h5_key, [method]),
                            aligned)
        except Exception as e:
            warnings.warn(f"text preprocess failed for {interval_id}: {e}")
            return interval_id
        return None
