"""Metric-suite math tests (definitions per reference metrics.py)."""

import numpy as np
import pytest

from mixstage_tpu.evaluation.metrics import (FID, PCK, W1, AverageMeter,
                                             Diversity, Expressiveness, F1,
                                             L1, Stack, VelL1)


def test_average_meter():
    m = AverageMeter("x")
    m.update(1.0, n=2)
    m.update(4.0, n=1)
    assert m.avg == pytest.approx(2.0)
    m.reset()
    assert m.count == 0


def test_l1_and_vel_l1():
    rng = np.random.default_rng(0)
    y = rng.normal(size=(2, 8, 104))
    gt = rng.normal(size=(2, 8, 104))
    m = L1()
    m(y, gt, mask_idx=[0, 7, 8, 9])
    keep = sorted(set(range(52)) - {0, 7, 8, 9})
    manual = np.abs(y.reshape(2, 8, 2, 52)[..., keep]
                    - gt.reshape(2, 8, 2, 52)[..., keep]).mean()
    assert m.get_averages("t")["t_L1"] == pytest.approx(manual)
    v = VelL1()
    v(y, gt)
    dy = np.diff(y.reshape(2, 8, 2, 52), axis=1)[..., keep]
    dg = np.diff(gt.reshape(2, 8, 2, 52), axis=1)[..., keep]
    assert v.get_averages("t")["t_VelL1"] == pytest.approx(
        np.abs(dy - dg).mean())


def test_f1_confusion():
    m = F1(num_clusters=3)
    m(np.array([0, 1, 2, 2]), np.array([0, 1, 1, 2]))
    avgs = m.get_averages("t")
    assert avgs["t_acc"] == pytest.approx(3 / 4)
    assert 0 < avgs["t_F1"] <= 1


def test_pck_perfect_and_threshold():
    m = PCK(num_joints=52)
    gt = np.random.default_rng(0).normal(size=(4, 2, 52)) * 100
    m(gt.copy(), gt.copy())
    assert m.get_averages("t")["t_pck"] == pytest.approx(1.0)
    # a prediction far outside the bbox threshold scores 0
    m2 = PCK(num_joints=52)
    m2(gt + 1e5, gt)
    assert m2.get_averages("t")["t_pck"] == pytest.approx(0.0)


def test_expressiveness_spatial_norm_identity():
    """Predicting exactly the GT makes spatial → 0; predicting the mean pose
    makes spatialNorm ratio → 1 (metrics.py:238-241)."""
    rng = np.random.default_rng(1)
    mean = rng.normal(size=(96,))
    gt = rng.normal(size=(32, 96)) + mean
    m = Expressiveness(mean)
    m(gt.copy(), gt.copy())
    avgs = m.get_averages("t")
    assert avgs["t_spatial"] == pytest.approx(0.0, abs=1e-9)
    m2 = Expressiveness(mean)
    m2(np.broadcast_to(mean, gt.shape).copy(), gt)
    a2 = m2.get_averages("t")
    assert a2["t_spatialNorm"] == pytest.approx(1.0)


def test_diversity():
    mean = np.zeros(96)
    y = np.ones((10, 96))
    m = Diversity(mean)
    m(y, 2 * y)
    avgs = m.get_averages("t")
    assert avgs["t_diversity"] == pytest.approx(1.0)
    assert avgs["t_diversity_gt"] == pytest.approx(2.0)


def test_fid_zero_for_identical_distributions():
    rng = np.random.default_rng(2)
    m = FID()
    x = rng.normal(size=(16, 64, 104))
    m(x, x.copy())
    fid = m.get_averages("t")["t_FID"]
    assert abs(fid) < 1e-4


def test_w1_zero_for_identical():
    rng = np.random.default_rng(3)
    m = W1()
    # W1 consumes (B, T, 2, joints) like the reference (trainer.py:891-896)
    y = np.abs(rng.normal(size=(4, 64, 2, 52))) * 5
    m(y, y.copy())
    avgs = m.get_averages("t")
    assert avgs["t_W1_vel"] == pytest.approx(0.0, abs=1e-9)
    assert avgs["t_W1_acc"] == pytest.approx(0.0, abs=1e-9)


def test_stack_routes_per_style_pair():
    s = Stack(L1(), n=2, speakers=["a", "b"], sample_styles=["same", "style"])
    y = np.ones((2, 4, 104))
    s(y, np.zeros_like(y), idx=1, kwargs_name="style")
    overall, split = s.get_averages("t")
    assert overall["t_L1"] == pytest.approx(1.0)
    assert split["style"]["b"]["t_L1"] == pytest.approx(1.0)
    assert split["style"]["a"]["t_L1"] == 0.0  # untouched meter
