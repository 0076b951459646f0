"""Dataset registry + missing-interval ledger.

Parity targets: ``Modality`` (reference
``/root/reference/src/data/common.py:105-189``) — master-CSV access and the
25-speaker PATS registry — and ``MissingData`` (common.py:191-236), the
persistent ledger of intervals that failed preprocessing (the reference's
data-level fault tolerance, see SURVEY.md §5).
"""

from __future__ import annotations

import os
import warnings
from pathlib import Path
from typing import List, Optional

import h5py
import numpy as np
import pandas as pd

from mixstage_tpu.data.hdf5 import HDF5

# PATS speaker registry (reference common.py:152-179)
SPEAKERS: List[str] = [
    "oliver", "jon", "conan", "rock", "chemistry", "ellen", "almaram",
    "angelica", "seth", "shelly", "colbert", "corden", "fallon", "huckabee",
    "maher", "lec_cosmic", "lec_evol", "lec_hist", "lec_law", "minhaj",
    "ytch_charisma", "ytch_dating", "ytch_prof", "bee", "noah",
]


class Modality(HDF5):
    """Base class for a preprocessed modality rooted at ``path2data``."""

    def __init__(self, path2data="../dataset/groot/data",
                 path2outdata="../dataset/groot/data", speaker="all",
                 preprocess_methods=("log_mel_512",)):
        super().__init__()
        self.path2data = path2data
        self.path2outdata = path2outdata
        self.speaker = speaker
        self.preprocess_methods = list(preprocess_methods)
        csv = Path(self.path2data) / "cmu_intervals_df.csv"
        if csv.exists():
            self.df = pd.read_csv(csv, dtype=object)
            self.df["delta_time"] = self.df["delta_time"].astype(float)
            self.df["interval_id"] = self.df["interval_id"].astype(str)
        else:
            self.df = None

    def preprocess(self):
        raise NotImplementedError

    def get_df_subset(self, column, value):
        if isinstance(value, list):
            return self.df[self.df[column].isin(value)]
        return self.df[self.df[column] == value]

    @property
    def speakers(self):
        return list(SPEAKERS)

    @property
    def inv_speakers(self):
        return {sp: i for i, sp in enumerate(self.speakers)}

    def speaker_id(self, speaker):
        return self.inv_speakers[speaker]

    def del_keys(self, h5_key):
        """Delete ``h5_key/<method>`` datasets across a speaker's intervals
        (reference common.py:123-143)."""
        speakers = [self.speaker] if self.speaker != "all" else self.speakers
        for speaker in speakers:
            df_speaker = self.get_df_subset("speaker", speaker)
            for preprocess_method in self.preprocess_methods:
                for interval_id in df_speaker["interval_id"].unique():
                    filename = (Path(self.path2outdata) / "processed" / speaker
                                / f"{interval_id}.h5")
                    key = self.add_key(h5_key[0], [preprocess_method])
                    h5 = self.h5_open(filename.as_posix(), "a")
                    found = self.del_dataset(h5, key)
                    self.h5_close(h5)
                    if not found:
                        break


class MissingData(HDF5):
    """Persistent set of interval ids that failed preprocessing."""

    def __init__(self, path2data):
        super().__init__()
        self.path2file = Path(path2data) / "missing_intervals.h5"
        if not os.path.exists(self.path2file):
            self.h5_close(self.h5_open(self.path2file, "a"))
        self.key = "intervals"
        self.missing_data_list: List[Optional[str]] = []

    def append_interval(self, data):
        self.missing_data_list.append(data)
        warnings.warn(f"interval_id: {data} not found.")

    def save_intervals(self, missing_data_list):
        """Merge new missing ids into the ledger."""
        dt = h5py.special_dtype(vlen=str)
        new = set(missing_data_list) - {None}
        intervals = self.load_intervals() | new
        HDF5.append(self.path2file, self.key,
                    np.array(sorted(intervals), dtype=dt))

    def save(self, missing_data_list):
        dt = h5py.special_dtype(vlen=str)
        HDF5.append(self.path2file, self.key,
                    np.array(sorted(set(missing_data_list) - {None}), dtype=dt))

    def load_intervals(self) -> set:
        if HDF5.isDatasetInFile(self.path2file, self.key):
            arr = HDF5.load_array(self.path2file, self.key)
            return {x.decode() if isinstance(x, bytes) else str(x) for x in arr}
        return set()
