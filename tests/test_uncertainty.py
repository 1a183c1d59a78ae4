"""Golden parity of uncertainty metrics against the actual reference module
(utils/uncertainty_metrics.py — importable: torch/sklearn/matplotlib only)."""

import numpy as np
import pytest
import torch

from vaeunet_tpu import uncertainty as U


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(0)
    probs = rng.rand(2, 1, 24, 24).astype(np.float32)
    gt = (rng.rand(2, 1, 24, 24) > 0.7).astype(np.float32)
    unc = rng.rand(2, 1, 24, 24).astype(np.float32)
    return probs, gt, unc


def test_ece_parity(reference_path, data):
    from utils.uncertainty_metrics import calculate_expected_calibration_error as ref
    probs, gt, _ = data
    r_ece, r_acc, r_conf, r_cnt = ref(torch.from_numpy(probs), torch.from_numpy(gt))
    o_ece, o_acc, o_conf, o_cnt = U.calculate_expected_calibration_error(probs, gt)
    assert o_ece == pytest.approx(r_ece, abs=1e-6)
    np.testing.assert_allclose(o_acc, r_acc, atol=1e-6)
    np.testing.assert_allclose(o_conf, r_conf, atol=1e-6)
    np.testing.assert_array_equal(o_cnt, r_cnt)


def test_brier_parity(reference_path, data):
    from utils.uncertainty_metrics import brier_score as ref
    probs, gt, _ = data
    assert U.brier_score(probs, gt) == pytest.approx(
        ref(torch.from_numpy(probs), torch.from_numpy(gt)), abs=1e-7)


def test_sparsification_parity(reference_path, data):
    from utils.uncertainty_metrics import calculate_sparsification_metrics as ref
    probs, gt, unc = data
    rf, rr, ru = ref(torch.from_numpy(probs), torch.from_numpy(unc),
                     torch.from_numpy(gt))
    of, orand, ounc = U.calculate_sparsification_metrics(probs, unc, gt)
    np.testing.assert_allclose(of, rf)
    np.testing.assert_allclose(orand, rr, atol=1e-6)
    np.testing.assert_allclose(ounc, ru, atol=1e-6)
    # SE integral agrees with the reference's np.trapz
    se = U.sparsification_error(of, orand, ounc)
    assert se == pytest.approx(float(np.trapezoid(rr - ru, rf)), abs=1e-6)


def test_sparsification_survives_ulp_overshoot(data):
    """Probabilities can overshoot 1.0 by ~1 ulp through the fp32
    interp-matrix resize (max 1.0000001 observed on real maps); the
    sparsification curve must not silently collapse to zeros (NaN pixel
    errors previously skipped the whole image)."""
    probs, gt, unc = data
    hot = probs.copy()
    hot.reshape(-1)[0] = 1.0000001
    f, err_r, err_u = U.calculate_sparsification_metrics(hot, unc, gt)
    assert err_r[0] > 0 and not np.isnan(err_r).any()
    saturated = probs.copy()
    saturated.reshape(-1)[0] = 1.0
    clean = U.calculate_sparsification_metrics(saturated, unc, gt)
    np.testing.assert_allclose(err_r, clean[1], atol=1e-6)
    np.testing.assert_allclose(err_u, clean[2], atol=1e-6)


def test_error_auc_parity(reference_path, data):
    from utils.uncertainty_metrics import calculate_uncertainty_error_auc as ref
    probs, gt, unc = data
    r_roc, r_pr = ref(torch.from_numpy(probs), torch.from_numpy(gt),
                      torch.from_numpy(unc))
    o_roc, o_pr = U.calculate_uncertainty_error_auc(probs, gt, unc)
    assert o_roc == pytest.approx(r_roc, abs=1e-9)
    assert o_pr == pytest.approx(r_pr, abs=1e-9)


def test_segmentation_metrics_parity(reference_path, data):
    from utils.uncertainty_metrics import calculate_segmentation_metrics as ref
    probs, gt, _ = data
    r = ref(torch.from_numpy(probs), torch.from_numpy(gt))
    o = U.calculate_segmentation_metrics(probs, gt)
    for k in r:
        assert o[k] == pytest.approx(r[k], abs=1e-9), k


def test_nll_parity(reference_path, data):
    from utils.uncertainty_metrics import calculate_negative_log_likelihood as ref
    probs, gt, _ = data
    assert U.calculate_negative_log_likelihood(probs, gt) == pytest.approx(
        ref(torch.from_numpy(probs), torch.from_numpy(gt)), abs=1e-6)


def test_ue_dice_parity(reference_path, data):
    from utils.uncertainty_metrics import calculate_uncertainty_error_dice as ref
    probs, gt, unc = data
    pred_bin = (probs > 0.5).astype(np.float32)
    r = ref(torch.from_numpy(unc), torch.from_numpy(pred_bin),
            torch.from_numpy(gt))
    o = U.calculate_uncertainty_error_dice(unc, pred_bin, gt)
    assert o == pytest.approx(float(r), abs=1e-6)


def test_chunked_metrics_parity(reference_path, tmp_path, data):
    from utils.uncertainty_metrics import calculate_segmentation_metrics_chunked as ref
    probs, gt, _ = data
    ids = ["a", "b"]
    for i, img_id in enumerate(ids):
        np.save(tmp_path / f"{img_id}_pred_flat.npy", probs[i].reshape(-1))
        np.save(tmp_path / f"{img_id}_gt_flat.npy", gt[i].reshape(-1))
    np.random.seed(0)
    r = ref(ids, tmp_path)
    np.random.seed(0)
    o = U.calculate_segmentation_metrics_chunked(ids, tmp_path)
    for k in r:
        assert o[k] == pytest.approx(r[k], abs=1e-9), k


def test_plots_render(data, tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    probs, gt, unc = data
    ece, accs, confs, counts = U.calculate_expected_calibration_error(probs, gt)
    ax = U.plot_reliability_diagram(accs, confs, counts)
    ax.figure.savefig(tmp_path / "rel.png")
    f, er, eu = U.calculate_sparsification_metrics(probs, unc, gt)
    ax2, se = U.plot_sparsification_curve(f, er, eu)
    ax2.figure.savefig(tmp_path / "sparse.png")
    assert (tmp_path / "rel.png").exists() and (tmp_path / "sparse.png").exists()
