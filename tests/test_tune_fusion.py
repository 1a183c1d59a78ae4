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
    score, combo, (method, w, mode), k = tf.greedy_select(
        cache, 3, verbose=False)
    assert set(combo) == {"left", "right"}
    assert score > 0.95
    assert mode == "fixed"


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
    mk = ("max", 1.0, "fixed")
    assert t_min[mk].max() < t_mean[mk].max()  # worst image caps the score
    p1 = cache.prob("a", "IDRiD_01")
    (tmp_path / "a_IDRiD_01.npy").unlink()    # cached: disk copy not needed
    p2 = cache.prob("a", "IDRiD_01")
    assert p1 is p2


def _haze_map(shape, lesion_slice, lesion_conf, haze_slice, haze_conf):
    """A tiny confident core over a broad low-probability haze — the
    under-confident-image regime (IDRiD_80): soft mass is dominated by the
    haze, so area matching lands the threshold just above it and keeps the
    core without flooding false positives the way a fixed low threshold does."""
    m = np.zeros(shape, np.float32)
    m[haze_slice] = haze_conf
    m[lesion_slice] = lesion_conf
    gt = np.zeros(shape, bool)
    gt[lesion_slice] = True
    return m, gt


def test_area_threshold_caps_predicted_area():
    """The wa=1.0 threshold makes |{p > t}| the largest achievable count
    <= sum(p); on a haze-dominated map that keeps exactly the confident core."""
    m, gt = _haze_map((64, 64), (slice(2, 6), slice(2, 6)), 0.32,
                      (slice(16, 48), slice(16, 48)), 0.22)
    cp, cn, g = tf._hist_cumsums(m, gt)
    thrs = tf.area_thresholds(m, cp, cn)
    k = list(tf.AREA_GRID).index(1.0)
    # soft mass ~ 230 (haze) + 5 (core): threshold lands above the haze
    assert 0.22 <= thrs[k] < 0.32
    assert ((m > thrs[k]) == gt).all()
    d_area = tf.dice_at_area_factors(m, gt)[k]
    assert d_area == pytest.approx(1.0, abs=1e-6)
    # no fixed grid threshold separates this image AND its half-confidence
    # sibling; the adaptive rule nails both
    m2, gt2 = _haze_map((64, 64), (slice(2, 6), slice(2, 6)), 0.16,
                        (slice(16, 48), slice(16, 48)), 0.11)
    d2_area = tf.dice_at_area_factors(m2, gt2)[k]
    assert d2_area == pytest.approx(1.0, abs=1e-6)
    fixed_pair = np.minimum(tf.dice_at_thresholds(m, gt),
                            tf.dice_at_thresholds(m2, gt2))
    assert fixed_pair.max() < 0.5


def test_greedy_can_select_area_mode(tmp_path):
    """Per-image confidence shift across the split: no fixed threshold works
    for both images, so the combined search freezes an area-mode point."""
    m1, g1 = _haze_map((32, 32), (slice(2, 6), slice(2, 6)), 0.32,
                       (slice(8, 28), slice(8, 28)), 0.22)
    m2, g2 = _haze_map((32, 32), (slice(2, 6), slice(2, 6)), 0.16,
                       (slice(8, 28), slice(8, 28)), 0.11)
    _write_maps(tmp_path, ["a"], ["IDRiD_01", "IDRiD_02"],
                {("a", "IDRiD_01"): m1, ("a", "IDRiD_02"): m2},
                {"IDRiD_01": g1, "IDRiD_02": g2})
    cache = tf.MapCache(tmp_path)
    score, combo, (method, w, mode), k = tf.greedy_select(
        cache, 1, verbose=False, modes=("fixed", "area"))
    assert mode == "area"
    assert score > 0.9


def test_apply_point_area_mode(tmp_path):
    m, gt = _haze_map((16, 16), (slice(2, 4), slice(2, 4)), 0.30,
                      (slice(6, 14), slice(6, 14)), 0.20)
    _write_maps(tmp_path, ["a"], ["IDRiD_01"], {("a", "IDRiD_01"): m},
                {"IDRiD_01": gt})
    cache = tf.MapCache(tmp_path)
    point = {"members": ["a"], "fusion": "max", "weight": 1.0,
             "threshold_mode": "area", "threshold": 1.0}
    mean = tf.apply_point(cache, point, tmp_path / "out", "EX_T1.0_N10", 10)
    assert mean > 0.9


def test_library_expected_area_threshold_matches_tuner():
    """The library decision rule (inference.expected_area_threshold, exact
    order statistics) and the tuner's histogram lowering pick thresholds
    within one histogram bin of each other."""
    from vaeunet_tpu.inference.ensemble import expected_area_threshold

    rng = np.random.default_rng(7)
    prob = (rng.random((256, 256)).astype(np.float32) ** 4)  # heavy low tail
    gt = rng.random((256, 256)) > 0.9
    cp, cn, _ = tf._hist_cumsums(prob, gt)
    tuner_thrs = tf.area_thresholds(prob, cp, cn)
    for j, wa in enumerate(tf.AREA_GRID):
        lib_t = expected_area_threshold(prob, wa)
        assert abs(lib_t - tuner_thrs[j]) <= 2.5e-3, (wa, lib_t, tuner_thrs[j])
    # exact predicted-area semantics of the library rule
    t = expected_area_threshold(prob, 1.0)
    assert (prob > t).sum() <= prob.sum()
    # haze map: threshold lands above the haze, keeping exactly the core
    m, gt2 = _haze_map((64, 64), (slice(2, 6), slice(2, 6)), 0.32,
                       (slice(16, 48), slice(16, 48)), 0.22)
    t2 = expected_area_threshold(m, 1.0)
    assert ((m > t2) == gt2).all()


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


def test_pool_rule_val_map_floor(tmp_path):
    """pool_rule qualifies members by their own val-map protocol dice:
    a good member passes, a degenerate (near-zero-mass) member and a
    diffuse mass-sprayer fail, flip variants inherit qualification."""
    import json
    import sys

    import scripts.pool_rule as pr

    rng = np.random.RandomState(0)
    gt = np.zeros((64, 64), np.uint8)
    gt[20:40, 20:40] = 1
    for img in ("IDRiD_55", "IDRiD_56"):
        np.save(tmp_path / f"gt_{img}.npy", gt)
        good = np.where(gt, 0.9, 0.02).astype(np.float32)
        np.save(tmp_path / f"good_{img}.npy", good)
        np.save(tmp_path / f"goodF_{img}.npy", good)
        np.save(tmp_path / f"dead_{img}.npy",
                np.full((64, 64), 1e-7, np.float32))
        np.save(tmp_path / f"spray_{img}.npy",
                rng.uniform(0.3, 0.6, (64, 64)).astype(np.float32))
    out = tmp_path / "point.json"
    argv = sys.argv
    sys.argv = ["pool_rule", "--val-dir", str(tmp_path), "--out", str(out),
                "--floor", "0.5"]
    try:
        pr.main()
    finally:
        sys.argv = argv
    point = json.loads(out.read_text())
    assert point["members"] == ["good", "goodF"]
    assert point["member_val_map_dice"]["dead"] < 0.1
    assert point["member_val_map_dice"]["spray"] < 0.5


def test_fusion_selection_needs_margin_and_excludes_noisyor(tmp_path):
    """Round-4 regression (results/r4_ex_mt05_noisyor): with 12 pool entries
    the val selection picked noisy-or over mean by 1e-4 of val noise, and
    noisy-or saturated on test (expected-area threshold ~1.0, one image to
    dice 0.0).  The selection now (a) never offers noisy-or and (b) leaves
    the mean default only on a val margin > FUSION_SELECT_MARGIN."""
    import json
    import sys

    import scripts.pool_rule as pr

    assert "noisyor" not in pr.SELECTABLE_RULES
    gt = np.zeros((64, 64), np.uint8)
    gt[20:40, 20:40] = 1
    for img in ("IDRiD_55", "IDRiD_56"):
        np.save(tmp_path / f"gt_{img}.npy", gt)
        # two near-identical good members: all rules tie on val to within
        # far less than the margin -> selection must stay "mean"
        np.save(tmp_path / f"m1_{img}.npy",
                np.where(gt, 0.90, 0.02).astype(np.float32))
        np.save(tmp_path / f"m2_{img}.npy",
                np.where(gt, 0.89, 0.02).astype(np.float32))
    out = tmp_path / "point.json"
    argv = sys.argv
    sys.argv = ["pool_rule", "--val-dir", str(tmp_path), "--out", str(out),
                "--floor", "0.5", "--fusion-from-val"]
    try:
        pr.main()
    finally:
        sys.argv = argv
    point = json.loads(out.read_text())
    assert point["fusion"] == "mean"
    assert "noisyor" not in point["fusion_val_dice_by_rule"]


def test_member_median_area_estimate_resists_sprayers(tmp_path):
    """Protocol v2: with a diffuse-mass-sprayer in the pool, the fused-mass
    area target collapses precision (threshold driven toward the halo) while
    the member-median target recovers the healthy members' area estimate.
    This is the drive-5 IDRiD_80 failure in miniature (RESULTS.md)."""
    import scripts.tune_fusion as tf

    rng = np.random.RandomState(0)
    gt = np.zeros((64, 64), bool)
    gt[10:14, 10:14] = True                      # 16 px tiny lesion
    healthy = np.where(gt, 0.85, 0.01).astype(np.float32)
    sprayer = rng.uniform(0.25, 0.45, (64, 64)).astype(np.float32)
    stack = np.stack([healthy, healthy, sprayer])
    fused = stack.mean(0)

    cp, cn, g = tf._hist_cumsums(fused, gt)

    def dice_with_mass(mass):
        counts = cp + cn
        k = np.searchsorted(-counts, -(1.0 * mass), side="left")
        t = tf.BINS[min(k, len(tf.BINS) - 1)]
        pred = fused > t
        return 2.0 * (pred & gt).sum() / (pred.sum() + gt.sum())

    d_v1 = dice_with_mass(float(fused.sum()))                    # fused mass
    d_v2 = dice_with_mass(float(np.median(stack.sum(axis=(1, 2)))))
    assert d_v2 > d_v1 + 0.2, (d_v1, d_v2)

    # apply_point honors the area_estimate field end-to-end
    for img in ("IDRiD_01",):
        np.save(tmp_path / f"gt_{img}.npy", gt.astype(np.uint8))
        for lbl, arr in (("h1", healthy), ("h2", healthy), ("sp", sprayer)):
            np.save(tmp_path / f"{lbl}_{img}.npy", arr)
            np.save(tmp_path / f"{lbl}_{img}_mom.npy",
                    np.stack([arr, arr ** 2]).astype(np.float32))
    cache = tf.MapCache(tmp_path)
    base = {"members": ["h1", "h2", "sp"], "fusion": "mean", "weight": 1.0,
            "threshold_mode": "area", "threshold": 1.0}
    d_fused = tf.apply_point(cache, base, tmp_path, "P1", 1)
    d_med = tf.apply_point(cache, {**base, "area_estimate": "member_median"},
                           tmp_path, "P2", 1)
    np.testing.assert_allclose(d_fused, d_v1, atol=0.02)
    np.testing.assert_allclose(d_med, d_v2, atol=0.02)
