"""Tests for the val-split fusion operating-point tuner (scripts/tune_fusion.py).

The reference has no ensemble machinery (analyze_model.py evaluates one
model at threshold 0.5); the tuner is a framework extension, so these are
behavioral tests, not golden-parity tests.
"""
import importlib.util
import sys
from pathlib import Path

import numpy as np
import pytest

_spec = importlib.util.spec_from_file_location(
    "tune_fusion",
    Path(__file__).resolve().parent.parent / "scripts" / "tune_fusion.py")
tf = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(tf)


def test_histogram_dice_matches_direct():
    rng = np.random.default_rng(0)
    prob = rng.random((64, 64)).astype(np.float32)
    gt = rng.random((64, 64)) > 0.8
    got = tf.dice_at_thresholds(prob, gt)
    for k, thr in enumerate(tf.THR_GRID):
        pred = (prob > thr).astype(np.float64)
        want = 2 * (pred * gt).sum() / (pred.sum() + gt.sum() + 1e-8)
        assert got[k] == pytest.approx(want, abs=2e-3), thr


def test_noisyor_is_soft_union():
    stack = np.array([[[0.4]], [[0.4]]])
    fused = tf.fuse(stack, "noisyor", 1.0)
    assert fused[0, 0] == pytest.approx(1 - 0.6 * 0.6)
    # w>1 sharpens toward 1
    assert tf.fuse(stack, "noisyor", 2.0)[0, 0] > fused[0, 0]
    assert tf.fuse(stack, "max", 1.0)[0, 0] == pytest.approx(0.4)


def _write_maps(root: Path, labels, img_ids, maps, gts):
    for i in img_ids:
        np.save(root / f"gt_{i}.npy", gts[i].astype(np.uint8))
        for l in labels:
            m = maps[(l, i)].astype(np.float32)
            np.save(root / f"{l}_{i}.npy", m)
            np.save(root / f"{l}_{i}_mom.npy",
                    np.stack([m * 10, (m ** 2) * 10]).astype(np.float32))


def test_greedy_selects_informative_members(tmp_path):
    """Two complementary half-detectors + one noise member: greedy should
    pick the two detectors (union recovers the full mask) and skip noise."""
    rng = np.random.default_rng(1)
    img_ids = ["IDRiD_01", "IDRiD_02", "IDRiD_03"]
    gts, maps = {}, {}
    for i in img_ids:
        gt = np.zeros((32, 32), bool)
        gt[8:24, 8:24] = True
        gts[i] = gt
        left = np.zeros((32, 32), np.float32)
        left[8:24, 8:16] = 0.9   # left half confident
        right = np.zeros((32, 32), np.float32)
        right[8:24, 16:24] = 0.9  # right half confident
        noise = rng.random((32, 32)).astype(np.float32) * 0.6
        maps[("left", i)] = left
        maps[("right", i)] = right
        maps[("noise", i)] = noise
    _write_maps(tmp_path, ["left", "right", "noise"], img_ids, maps, gts)

    cache = tf.MapCache(tmp_path)
    assert sorted(cache.labels) == ["left", "noise", "right"]
    score, combo, (method, w), k = tf.greedy_select(cache, 3, verbose=False)
    assert set(combo) == {"left", "right"}
    assert score > 0.95


def test_objectives_and_prob_cache(tmp_path):
    """min-objective scores the worst image; keep_probs returns identical
    arrays without re-reading disk."""
    img_ids = ["IDRiD_01", "IDRiD_02"]
    gts, maps = {}, {}
    for j, i in enumerate(img_ids):
        gt = np.zeros((16, 16), bool)
        gt[:8] = True
        gts[i] = gt
        m = np.zeros((16, 16), np.float32)
        # member nails image 0, half-covers image 1
        m[: (8 if j == 0 else 4)] = 0.9
        maps[("a", i)] = m
    _write_maps(tmp_path, ["a"], img_ids, maps, gts)
    cache = tf.MapCache(tmp_path, keep_probs=True)
    t_mean = tf.eval_combo(cache, ["a"], objective="mean")
    t_min = tf.eval_combo(cache, ["a"], objective="min")
    mk = ("max", 1.0)
    assert t_min[mk].max() < t_mean[mk].max()  # worst image caps the score
    p1 = cache.prob("a", "IDRiD_01")
    (tmp_path / "a_IDRiD_01.npy").unlink()    # cached: disk copy not needed
    p2 = cache.prob("a", "IDRiD_01")
    assert p1 is p2


def test_apply_point_writes_reference_schema(tmp_path):
    img_ids = ["IDRiD_01"]
    gt = np.zeros((16, 16), bool)
    gt[4:12, 4:12] = True
    m = np.zeros((16, 16), np.float32)
    m[4:12, 4:12] = 0.8
    _write_maps(tmp_path, ["a"], img_ids, {("a", "IDRiD_01"): m},
                {"IDRiD_01": gt})
    cache = tf.MapCache(tmp_path)
    point = {"members": ["a"], "fusion": "max", "weight": 1.0,
             "threshold": 0.5}
    mean = tf.apply_point(cache, point, tmp_path / "out", "EX_T1.0_N10", 10)
    assert mean == pytest.approx(1.0)
    csv = (tmp_path / "out" / "EX_T1.0_N10" / "analysis_metrics.csv")
    header = csv.read_text().splitlines()[0]
    assert header == ("img_id,dice,ece,sparsification_error,"
                      "uncertainty_error_dice,error_auroc,error_auprc")
