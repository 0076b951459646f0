"""Data pipeline tests: windowing math, transforms, samplers, caches."""

import numpy as np
import pytest

from mixstage_tpu.data.dataset import (AlternateClassSampler,
                                       ConcatDatasetIndex, Data, DataLoader,
                                       DummyData, RandomSampler)
from mixstage_tpu.data.synthetic import make_synthetic_dataset
from mixstage_tpu.data.transforms import (Compose, KMeansTransform,
                                          Relative2Parent, RemoveJoints,
                                          TransformDict, ZNorm, add_slices,
                                          remove_slices)


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    path = tmp_path_factory.mktemp("pats")
    make_synthetic_dataset(str(path), speakers=["oliver", "maher"],
                           num_intervals_per_speaker=3)
    return str(path)


@pytest.fixture(scope="module")
def data(synth):
    return Data(synth, ["oliver", "maher"],
                modalities=["pose/data", "audio/log_mel_512"],
                fs_new=[15, 15], time=4.3, batch_size=8, window_hop=5)


def test_windowing_math(data):
    """window = time*fs; stride = round(fs/fs_new); hop = window_hop*stride
    (reference dataUtils.py:510-527)."""
    md = data.train.dataset.datasets[0]
    # pose: fs=15 → window 64 frames pre-subsample, stride 1
    assert md.idx_interval_dict["pose/data"] == 1
    assert (md.idx_end_list_dict["pose/data"][0]
            - md.idx_start_list_dict["pose/data"][0]) == int(4.3 * 15)
    # audio: fs=89 → stride 6, window int(4.3*89)=382
    assert md.idx_interval_dict["audio/log_mel_512"] == round(89 / 15)
    assert (md.idx_end_list_dict["audio/log_mel_512"][0]
            - md.idx_start_list_dict["audio/log_mel_512"][0]) == int(4.3 * 89)
    # hop: starts advance by window_hop * stride
    starts = md.idx_start_list_dict["pose/data"]
    assert starts[1] - starts[0] == 5 * 1


def test_batch_shapes(data):
    batch = next(iter(data.train))
    assert batch["pose/data"].shape[1:] == (64, 104)
    assert batch["audio/log_mel_512"].shape[1:] == (64, 128)
    assert batch["style"].shape[1:] == (64,)
    assert "idx" in batch
    # shape property matches (dataUtils.py:452-464)
    assert data.shape["pose/data"] == [64, 104]
    assert data.shape["audio/log_mel_512"] == [64, 128]


def test_style_ids_match_speaker(data):
    for loader in [data.train, data.dev, data.test]:
        for batch in loader.iter_all(batch_size=64):
            assert set(np.unique(batch["style"])) <= {0.0, 1.0}
            break


def test_znorm_normalizes_and_inverts(synth, data, tmp_path):
    pre = ZNorm(["pose/data"], savepath=str(tmp_path / "muvar"),
                key=["oliver", "maher"], data=data.train, verbose=False)
    batch = next(iter(data.train))
    out = pre(batch)
    z = out["pose/data"]
    assert abs(z.mean()) < 0.5 and 0.3 < z.std() < 3.0
    back = pre(out, inv=True)
    np.testing.assert_allclose(back["pose/data"], batch["pose/data"],
                               rtol=1e-6, atol=1e-6)
    # second construction loads from cache and matches
    pre2 = ZNorm(["pose/data"], savepath=str(tmp_path / "muvar"),
                 key=["oliver", "maher"], data=None, verbose=False)
    np.testing.assert_allclose(pre2.variable_dict["pose/data"][0],
                               pre.variable_dict["pose/data"][0])


def test_kmeans_cache_key_and_labels(data, tmp_path):
    km = KMeansTransform(["pose/data"], savepath=str(tmp_path / "kmeans"),
                         key=["oliver", "maher"], data=data.train,
                         num_clusters=4, mask=[0, 7, 8, 9], verbose=False)
    import h5py

    with h5py.File(str(tmp_path / "kmeans" / "oliver_maher.h5"), "r") as h5:
        # exact reference key format (transform.py:320-327)
        assert "centers/4_pose_velocity_0_7_8_9_pose_data" in h5["/"]
    batch = next(iter(data.train))
    rj = RemoveJoints([0, 7, 8, 9])
    labels = km(rj(batch["pose/data"]))
    assert labels.shape == batch["pose/data"].shape[:2]
    assert labels.max() < 4
    soft = km.predict(rj(batch["pose/data"]), soft_labels=True)
    np.testing.assert_allclose(soft.sum(-1), 1.0, rtol=1e-5)


def test_kmeans_gemm_matches_broadcast(data, tmp_path):
    """predict() computes ||x-c||^2 regrouped as one BLAS GEMM
    (||x||^2 - 2x.c + ||c||^2); hard labels and soft probabilities must
    match the reference's naive broadcast form (transform.py:395-410)
    exactly / to fp64 regrouping tolerance."""
    km = KMeansTransform(["pose/data"], savepath=str(tmp_path / "kmeans"),
                         key=["oliver", "maher"], data=data.train,
                         num_clusters=4, mask=[0, 7, 8, 9], verbose=False)
    rj = RemoveJoints([0, 7, 8, 9])
    rng = np.random.default_rng(3)
    x = rj(np.asarray(next(iter(data.train))["pose/data"]))
    # include far-outlier rows (large ||x||^2 stresses the regrouping)
    x = np.concatenate([x, rng.normal(scale=50.0, size=x[:1].shape)], 0)

    f = km.get_feats(np.asarray(x, np.float64))
    flat = f.reshape(-1, 1, f.shape[-1])
    mse_ref = ((km.centers[None] - flat) ** 2).sum(axis=-1)
    labels_ref = mse_ref.argmin(-1).reshape(f.shape[:-1])
    np.testing.assert_array_equal(km.predict(x), labels_ref)

    z = -mse_ref / mse_ref.mean(-1, keepdims=True)
    z = z - z.max(-1, keepdims=True)
    p_ref = np.exp(z)
    p_ref /= p_ref.sum(-1, keepdims=True)
    np.testing.assert_allclose(
        km.predict(x, soft_labels=True),
        p_ref.reshape(list(f.shape[:-1]) + [km.centers.shape[0]]),
        rtol=1e-9, atol=1e-12)


def test_kmeans_get_feats_matches_naive(data, tmp_path):
    """get_feats writes feature blocks into one preallocated buffer; every
    kind must equal the reference's append-then-concatenate construction
    (transform.py:352-379)."""
    km = KMeansTransform(["pose/data"], savepath=str(tmp_path / "kmeans"),
                         key=["oliver", "maher"], data=data.train,
                         num_clusters=4, mask=[0, 7, 8, 9], verbose=False)
    rng = np.random.default_rng(7)
    x = rng.normal(size=(3, 16, 8))

    def naive(x, feats):
        cols = []
        for feat in feats:
            v = np.zeros_like(x)
            v[:, 1:, :] = x[:, 1:] - x[:, :-1]
            if feat == "pose":
                cols.append(x)
            elif feat == "velocity":
                cols.append(v)
            elif feat == "speed":
                s = v.reshape(v.shape[0], v.shape[1], 2, -1)
                cols.append(np.sqrt((s ** 2).sum(axis=-2)))
            elif feat == "acceleration":
                a = np.zeros_like(x)
                a[:, 1:, :] = v[:, 1:] - v[:, :-1]
                cols.append(a)
        return np.concatenate(cols, axis=-1)

    for feats in (["pose", "velocity"], ["velocity"], ["speed"],
                  ["acceleration"], ["pose", "speed", "acceleration"],
                  ["pose", "velocity", "speed", "acceleration"]):
        km.feats = feats
        np.testing.assert_allclose(km.get_feats(x), naive(x, feats),
                                   rtol=0, atol=0)


def test_remove_add_slices_roundtrip():
    x = np.arange(2 * 3 * 2 * 6, dtype=float).reshape(2, 3, 2, 6)
    kept, removed = remove_slices(x, [0, 3], axis=-1)
    assert kept.shape == (2, 3, 2, 4)
    back = add_slices(kept, removed, [0, 3], axis=-1)
    np.testing.assert_array_equal(back, x)


def test_remove_joints_invertible():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(4, 64, 104))
    rj = RemoveJoints([0, 7, 8, 9])
    y = rj(x)
    assert y.shape == (4, 64, 96)
    back = rj(y, inv=True)
    np.testing.assert_allclose(back, x, rtol=1e-12)


def test_transform_dict_lifts_to_dict_batches():
    """TransformDict applies an array transform to every dict value
    (reference transform.py:25-48) and inverses compose through it."""
    rng = np.random.default_rng(1)
    batch = {"a": rng.normal(size=(2, 8, 104)),
             "b": rng.normal(size=(2, 8, 104))}
    td = TransformDict(RemoveJoints([0, 7, 8, 9]))
    out = td(batch)
    assert set(out) == {"a", "b"} and out["a"].shape == (2, 8, 96)
    # last-applied insert belongs to "b"; explicit inverse reconstructs it
    back = td.transform(out["b"], inv=True)
    np.testing.assert_allclose(back, batch["b"], rtol=1e-12)
    assert "RemoveJoints" in repr(td)


def test_relative2parent_invertible():
    rng = np.random.default_rng(0)
    batch = {"pose/data": rng.normal(size=(2, 16, 104))}
    r2p = Relative2Parent()
    rel = r2p(batch)
    back = r2p(rel, inv=True)
    np.testing.assert_allclose(back["pose/data"], batch["pose/data"],
                               rtol=1e-9, atol=1e-9)


def test_alternate_class_sampler_interleaves():
    s = AlternateClassSampler([100, 100], num_samples=16)
    idx = list(iter(s))
    assert len(idx) == 16
    # even positions from class 0, odd from class 1
    assert all(i < 100 for i in idx[0::2])
    assert all(100 <= i < 200 for i in idx[1::2])


def test_concat_dataset_index_injects_idx():
    d = ConcatDatasetIndex([DummyData(length=5), DummyData(length=5)])
    assert len(d) == 10
    item = d[7]
    assert item["idx"] == 7


def test_dataloader_iter_all_is_sequential():
    d = DummyData(length=10)
    loader = DataLoader(d, batch_size=4, sampler=RandomSampler(10))
    seen = [b["pose"] for b in loader.iter_all(batch_size=4)]
    np.testing.assert_array_equal(np.concatenate(seen),
                                  np.arange(10, dtype=float) + 1)


def test_iter_all_bulk_matches_per_item(data):
    """The native bulk sweep must yield exactly the per-item windows."""
    loader = data.train
    bulk = list(loader.iter_all(batch_size=16))
    # per-item reference path
    items = [loader.dataset[i] for i in range(len(loader.dataset))]
    per_item = np.concatenate([it["pose/data"][None] for it in items])
    bulk_cat = np.concatenate([b["pose/data"] for b in bulk])
    np.testing.assert_array_equal(bulk_cat, per_item)
    audio_b = np.concatenate([b["audio/log_mel_512"] for b in bulk])
    audio_i = np.concatenate([it["audio/log_mel_512"][None] for it in items])
    np.testing.assert_array_equal(audio_b, audio_i)


def test_data_sample_view(synth, tmp_path):
    """DataSample reads predicted-keypoint h5 trees from a view directory
    (reference dataUtils.py:618-655)."""
    from mixstage_tpu.data.dataset import DataSample
    from mixstage_tpu.data.hdf5 import HDF5

    base = Data(synth, ["oliver"], modalities=["pose/data"], fs_new=[15],
                time=4.3, batch_size=4)
    view = tmp_path / "view"
    n = 0
    for split in ["train", "dev", "test"]:
        for iv in getattr(base, f"{split}_intervals"):
            src = base.getPath2file(iv)
            arr = HDF5.load_array(src, "pose/data")
            dst = view / "keypoints" / split / "oliver" / f"{iv}.h5"
            HDF5.append(dst.as_posix(), "pose/data", arr)
            n += 1
    assert n > 0
    ds = DataSample(synth, ["oliver"], view=str(view),
                    modalities=["pose/data"], fs_new=[15], time=4.3,
                    batch_size=4)
    batch = next(iter(ds.train))
    assert batch["pose/data"].shape[1:] == (64, 104)


def test_quantile_sampler_kinds(synth):
    """Velocity-quantile training subsets: above / tail / rebalance
    (reference dataUtils.py:353-446)."""
    d_above = Data(synth, ["oliver"], modalities=["pose/data"], fs_new=[15],
                   time=4.3, batch_size=4, window_hop=5, quantile_sample=0.5)
    n_total = len(d_above.train.dataset)
    assert 0 < len(d_above.train.sampler) <= n_total // 2 + 1

    d_tail = Data(synth, ["oliver"], modalities=["pose/data"], fs_new=[15],
                  time=4.3, batch_size=4, window_hop=5,
                  quantile_sample=[0.25, 0.75])
    assert 0 < len(d_tail.train.sampler) <= n_total

    d_reb = Data(synth, ["oliver"], modalities=["pose/data"], fs_new=[15],
                 time=4.3, batch_size=4, window_hop=5, quantile_sample=4,
                 quantile_num_training_sample=3)
    # BalanceClassSampler: num_samples = (3*batch) // classes * classes
    assert len(d_reb.train.sampler) > 0
    idx = list(iter(d_reb.train.sampler))
    assert max(idx) < n_total


def test_prefetch_pool_order_and_exceptions():
    """workers>1 prefetch must preserve input order exactly (training
    dynamics identical for any worker count) and forward worker
    exceptions; wired to the reference's -num_workers flag (declared
    upstream at argsUtils.py:33 but never consumed by its trainer)."""
    import time as _time

    from mixstage_tpu.data.prefetch import prefetch

    def slow_square(x):
        _time.sleep(0.02 if x % 3 == 0 else 0.001)  # out-of-order completion
        return x * x

    items = list(range(40))
    for workers in (1, 4):
        out = list(prefetch(items, slow_square, depth=2, workers=workers))
        assert out == [x * x for x in items], f"order broken at workers={workers}"

    def boom(x):
        if x == 5:
            raise ValueError("boom at 5")
        return x

    import pytest as _pytest
    for workers in (1, 4):
        with _pytest.raises(ValueError, match="boom at 5"):
            list(prefetch(items, boom, depth=2, workers=workers))
    # items before the failure still arrive, in order
    got = []
    try:
        for v in prefetch(items, boom, depth=1, workers=4):
            got.append(v)
    except ValueError:
        pass
    assert got == list(range(5))


def test_skeleton_raw_preprocessing_pipeline(tmp_path):
    """Raw keypoints_simple txt trees → pose/data h5 (reference
    skeleton.py:67-110,180-245): per-interval timestamp slicing of the
    video's frame files, root-relative encoding, frame-gap detection, and
    the Berkeley YAML confidence branch."""
    import os

    from mixstage_tpu.data.skeleton import Skeleton2D, load_pose
    from mixstage_tpu.data.synthetic import make_synthetic_dataset

    make_synthetic_dataset(str(tmp_path), ["oliver"],
                           num_intervals_per_speaker=2, interval_seconds=2.0,
                           with_raw_keypoints=True)
    out = tmp_path / "out"
    sk = Skeleton2D(path2data=str(tmp_path), path2outdata=str(out),
                    speaker=["oliver"], preprocess_methods="data")
    ids = sorted(sk.get_df_subset("speaker", "oliver")["interval_id"])
    assert len(ids) == 2

    # interval slicing: 2 s * 15 fps + shared boundary frame = 31 files each
    fl0 = sk.get_filelist(ids[0])
    fl1 = sk.get_filelist(ids[1])
    assert len(fl0) == 31 and len(fl1) == 31
    assert fl0[-1] == fl1[0]              # end frame == next start frame
    assert set(fl0[:-1]).isdisjoint(fl1)  # otherwise non-overlapping

    sk.preprocess()
    h5 = out / "processed" / "oliver" / f"{ids[0]}.h5"
    from mixstage_tpu.data.hdf5 import HDF5
    data = HDF5.load_array(h5.as_posix(), "pose/data")
    # matches the direct computation from the txt files
    kp = np.stack([np.loadtxt(f) for f in fl0], 0)
    np.testing.assert_allclose(data, Skeleton2D.process_keypoints(kp))

    # Berkeley confidence branch: YAML conf column duplicated across x/y
    skc = Skeleton2D(path2data=str(tmp_path), path2outdata=str(out),
                     speaker=["oliver"], preprocess_methods="confidence")
    conf = skc.confidence(ids[0])
    assert conf.shape == (31, 104)
    p = __import__("pathlib").Path(fl0[0])
    yml = (p.parent.parent.parent / "keypoints_all" / p.parent.name
           / (p.name[:-4] + "_pose.yml"))
    np.testing.assert_allclose(conf[0, :52], load_pose(yml.as_posix())[:, -1])
    np.testing.assert_allclose(conf[0, 52:], conf[0, :52])

    # a frame gap inside the interval → None (are_keypoints_complete parity)
    os.remove(fl1[3])
    assert sk.get_filelist(ids[1]) is None
    assert sk.get_filelist(ids[0]) is not None


def test_data_sample_view_reads_predicted_keypoints(tmp_path):
    """DataSample (reference dataUtils.py:618-655): the h5 tree is an
    experiment's predicted-keypoints view; intervals whose prediction file
    is missing are silently dropped."""
    from mixstage_tpu.data.dataset import DataSample
    from mixstage_tpu.data.hdf5 import HDF5
    from mixstage_tpu.data.synthetic import make_synthetic_dataset

    make_synthetic_dataset(str(tmp_path / "pats"), ["oliver"],
                           num_intervals_per_speaker=3)
    import pandas as pd

    df = pd.read_csv(tmp_path / "pats" / "cmu_intervals_df.csv", dtype=str)
    view = tmp_path / "view"
    written = []
    for _, row in df.iterrows():
        if row.dataset != "test":   # leave the test interval missing
            p = view / "keypoints" / row.dataset / "oliver" / f"{row.interval_id}.h5"
            p.parent.mkdir(parents=True, exist_ok=True)
            HDF5.append(p.as_posix(), "pose/data",
                        np.cumsum(np.random.default_rng(0).normal(
                            size=(375, 104)), 0))
            written.append(row.interval_id)

    ds = DataSample(str(tmp_path / "pats"), ["oliver"], view=str(view),
                    modalities=["pose/data"], fs_new=[15], window_hop=0,
                    batch_size=2, shuffle=False)
    # only the intervals with an existing prediction file became datasets
    n = sum(len(ds.datasets[d].datasets) for d in ("train", "dev", "test"))
    assert n == len(written) == 2
    batch = next(iter(ds.train))
    assert batch["pose/data"].shape[-1] == 104
    assert str(batch["meta"]["interval_id"][0]) in written
