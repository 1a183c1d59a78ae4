"""Golden parity of losses/metrics against the actual reference modules
(imported from the read-only snapshot — torch-only)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from vaeunet_tpu import losses as L
from vaeunet_tpu import metrics as M


@pytest.fixture(scope="module")
def data():
    torch.manual_seed(0)
    logits = torch.randn(4, 1, 32, 32) * 3
    targets = (torch.rand(4, 1, 32, 32) > 0.7).float()
    return logits, targets


def test_dice_loss_parity(reference_path, data):
    from utils.loss import dice_loss as ref_dice
    logits, targets = data
    ref = float(ref_dice(logits, targets))
    ours = float(L.dice_loss(jnp.asarray(logits.numpy()), jnp.asarray(targets.numpy())))
    assert abs(ours - ref) < 1e-6


def test_combined_loss_parity(reference_path, data):
    from utils.loss import CombinedLoss
    logits, targets = data
    ref = float(CombinedLoss()(logits, targets))
    ours = float(L.combined_loss(jnp.asarray(logits.numpy()),
                                 jnp.asarray(targets.numpy())))
    assert abs(ours - ref) < 1e-6


def test_ma_losses_parity(reference_path, data):
    from utils.loss import MAFocalLoss, MASegmentationLoss
    logits, targets = data
    ref_f = float(MAFocalLoss()(logits, targets))
    ours_f = float(L.ma_focal_loss(jnp.asarray(logits.numpy()),
                                   jnp.asarray(targets.numpy())))
    assert abs(ours_f - ref_f) < 1e-6
    ref_s = float(MASegmentationLoss(class_weight=0.9)(logits, targets))
    ours_s = float(L.ma_segmentation_loss(jnp.asarray(logits.numpy()),
                                          jnp.asarray(targets.numpy()),
                                          class_weight=0.9))
    assert abs(ours_s - ref_s) < 1e-6


def test_kl_free_bits_parity(reference_path):
    from utils.loss import kl_with_free_bits as ref_kl
    torch.manual_seed(1)
    mu = torch.randn(8, 32)
    logvar = torch.randn(8, 32) * 2
    for fb in (0.0, 1e-3, 0.5):
        ref = float(ref_kl(mu, logvar, free_bits=fb))
        ours = float(L.kl_with_free_bits(jnp.asarray(mu.numpy()),
                                         jnp.asarray(logvar.numpy()),
                                         free_bits=fb))
        assert abs(ours - ref) < 1e-4, (fb, ours, ref)


def test_kl_annealer_parity(reference_path):
    from utils.loss import KLAnnealer as RefKL
    for strategy in ("linear", "cyclical", "constant"):
        ref = RefKL(kl_start=0.0, kl_end=0.001, warmup_epochs=20, strategy=strategy)
        ours = L.KLAnnealer(kl_start=0.0, kl_end=0.001, warmup_epochs=20,
                            strategy=strategy)
        for epoch in (0, 1, 5, 19, 20, 25, 100):
            assert ours.get_weight(epoch) == pytest.approx(ref.get_weight(epoch))
        assert ours.get_weight(3, batch=7, num_batches=11) == pytest.approx(
            ref.get_weight(3, batch=7, num_batches=11))


def test_focal_loss_secondary_parity(reference_path, data):
    from utils.metrics import focal_loss as ref_focal
    logits, targets = data
    ref = float(ref_focal(logits, targets))
    ours = float(L.focal_loss(jnp.asarray(logits.numpy()),
                              jnp.asarray(targets.numpy())))
    assert abs(ours - ref) < 1e-6


def test_get_all_metrics_parity(reference_path, data):
    from utils.metrics import get_all_metrics as ref_metrics
    logits, targets = data
    # parity mode: metrics on raw logits (the reference validation quirk,
    # evaluate.py:76)
    ref = ref_metrics(logits, targets)
    ours = M.get_all_metrics(jnp.asarray(logits.numpy()),
                             jnp.asarray(targets.numpy()))
    for k, v in ref.items():
        assert float(ours[k]) == pytest.approx(v, abs=1e-5), k


def test_dice_empty_both_sides(reference_path):
    from utils.metrics import dice_score as ref_dice
    pred = torch.zeros(1, 1, 8, 8)
    target = torch.zeros(1, 1, 8, 8)
    assert float(ref_dice(pred, target)) == 1.0
    assert float(M.dice_score(jnp.zeros((1, 1, 8, 8)), jnp.zeros((1, 1, 8, 8)))) == 1.0


def test_bce_with_logits_matches_torch(data):
    logits, targets = data
    ref = float(torch.nn.functional.binary_cross_entropy_with_logits(logits, targets))
    ours = float(L.bce_with_logits(jnp.asarray(logits.numpy()),
                                   jnp.asarray(targets.numpy())))
    assert abs(ours - ref) < 1e-5


def test_make_criterion_selects_ma():
    logits = jnp.ones((1, 4, 4, 1))
    targets = jnp.ones((1, 4, 4, 1))
    assert float(L.make_criterion("MA")(logits, targets)) == pytest.approx(
        float(L.ma_segmentation_loss(logits, targets, class_weight=0.9)))
    assert float(L.make_criterion("EX")(logits, targets)) == pytest.approx(
        float(L.combined_loss(logits, targets)))


def test_multiclass_dice_parity(reference_path):
    from utils.metrics import multiclass_dice_score as ref_md, dice_loss as ref_dl
    torch.manual_seed(5)
    pred = torch.rand(2, 3, 16, 16)
    target = (torch.rand(2, 3, 16, 16) > 0.5).float()
    ref = float(ref_md(pred, target))
    ours = float(M.multiclass_dice_score(jnp.asarray(pred.numpy()),
                                         jnp.asarray(target.numpy())))
    assert abs(ours - ref) < 1e-6
    ref_loss = float(ref_dl(pred, target, multiclass=True))
    ours_loss = float(M.dice_loss_metric(jnp.asarray(pred.numpy()),
                                         jnp.asarray(target.numpy()),
                                         multiclass=True))
    assert abs(ours_loss - ref_loss) < 1e-6


def test_kl_clamp_leak_value_identical_gradient_restored():
    """clamp_leak must not change the loss VALUE (reference parity) but must
    restore a gradient on dimensions past the +-100 clamp rails."""
    import jax
    mu = jnp.zeros((2, 4), jnp.float32)
    logvar = jnp.asarray([[0.0, 1.0, 8.0, 12.0]] * 2, jnp.float32)  # last two past rail
    v0 = float(L.kl_with_free_bits(mu, logvar, free_bits=1e-3))
    v1 = float(L.kl_with_free_bits(mu, logvar, free_bits=1e-3, clamp_leak=0.01))
    assert v0 == v1

    g0 = jax.grad(lambda lv: L.kl_with_free_bits(mu, lv, 1e-3))(logvar)
    g1 = jax.grad(lambda lv: L.kl_with_free_bits(mu, lv, 1e-3,
                                                 clamp_leak=0.01))(logvar)
    # inside the rails: identical gradients
    np.testing.assert_allclose(np.asarray(g0[:, :2]), np.asarray(g1[:, :2]))
    # past the rails: parity mode has zero gradient, leak mode a positive one
    assert float(np.abs(np.asarray(g0[:, 2:])).max()) == 0.0
    assert float(np.asarray(g1[:, 2:]).min()) > 0.0
