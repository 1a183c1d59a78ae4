"""End-to-end analysis pipeline on a tiny synthetic dataset."""

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # shared fixture compiles the full model (~50s)
from PIL import Image

import jax
import jax.numpy as jnp

from vaeunet_tpu.analysis.analyze import AnalyzeArgs, analyze_model
from vaeunet_tpu.data.dataset import IDRIDDataset
from vaeunet_tpu.models.vae_unet import UNetResNet


@pytest.fixture(scope="module")
def setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("idrid_analysis")
    rng = np.random.RandomState(0)
    (root / "imgs" / "test").mkdir(parents=True)
    (root / "masks" / "test" / "EX").mkdir(parents=True)
    for i in range(2):
        h, w = 64, 64
        yy, xx = np.mgrid[0:h, 0:w]
        blob = (yy - 32) ** 2 + (xx - 32) ** 2 < 26 ** 2
        img = np.zeros((h, w, 3), np.uint8)
        img[blob] = rng.randint(80, 220, (blob.sum(), 3))
        mask = np.zeros((h, w), np.uint8)
        lesion = (yy - rng.randint(24, 40)) ** 2 + (xx - rng.randint(24, 40)) ** 2 < 30
        mask[lesion & blob] = 255
        Image.fromarray(img).save(root / "imgs" / "test" / f"IDRiD_{i:02d}.jpg")
        Image.fromarray(mask).save(
            root / "masks" / "test" / "EX" / f"IDRiD_{i:02d}_EX.tif")
    dataset = IDRIDDataset(str(root), split="test", scale=1.0,
                           patch_size=None, lesion_type="EX",
                           skip_border_check=True)
    model = UNetResNet(3, 1, latent_dim=8)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(1)},
        jnp.zeros((1, 32, 32, 3)), train=False)
    return dataset, model, variables


def test_analyze_model_end_to_end(setup, tmp_path):
    dataset, model, variables = setup
    args = AnalyzeArgs(lesion_type="EX", temperature=1.0, samples=3,
                       patch_size=None, output_dir=str(tmp_path),
                       temp_values=(0.5, 1.0, 2.0), extended_metrics=True,
                       seed=0)
    df = analyze_model(model, variables, dataset, args)
    assert len(df) == 2
    base_cols = ["img_id", "dice", "ece", "sparsification_error",
                 "uncertainty_error_dice", "error_auroc", "error_auprc"]
    for c in base_cols:
        assert c in df.columns, c
    for c in ("brier", "nll", "mean_entropy", "mean_mutual_info",
              "mean_coeff_variation", "uncertain_pixel_percent"):
        assert c in df.columns, c

    out = tmp_path / "EX_T1.0_N3"
    assert (out / "analysis_metrics.csv").exists()
    for png in ("global_calibration_curve.png", "ece_vs_temperature.png",
                "global_sparsification_curve.png",
                "global_uncertainty_distribution.png",
                "global_error_roc_pr.png",
                "global_segmentation_roc_curve.png"):
        assert (out / png).exists(), png
    # temp spill dir cleaned up (analyze_model.py:1221-1225)
    assert not (out / "temp_pixel_data").exists()
    # dice in range, finite metrics
    assert df["dice"].between(0, 1).all()
    assert np.isfinite(df["ece"]).all()


def test_attention_capture_via_intermediates(setup):
    dataset, model, variables = setup
    img, _ = dataset.get_image_and_mask(dataset.unique_image_ids()[0])
    _, state = model.apply(variables, jnp.asarray(img)[None], train=False,
                           sample=False, mutable=["intermediates"])
    leaves = jax.tree_util.tree_flatten_with_path(state["intermediates"])[0]
    psi_maps = [v for p, v in leaves
                if "psi" in "/".join(str(getattr(q, "key", q)) for q in p)]
    assert len(psi_maps) == 4  # one AttentionGate per decoder block
    for m in psi_maps:
        assert float(jnp.min(m)) >= 0.0 and float(jnp.max(m)) <= 1.0


def test_visualization_figures(setup, tmp_path):
    import matplotlib
    matplotlib.use("Agg")
    from vaeunet_tpu.analysis.visualize import (generate_and_compare_ensemble,
                                                plot_reconstruction,
                                                visualize_temperature_sampling)
    dataset, model, variables = setup
    img_id = dataset.unique_image_ids()[0]
    fig = plot_reconstruction(model, variables, dataset, img_id,
                              jax.random.PRNGKey(0), num_samples=3)
    fig.savefig(tmp_path / "recon.png")
    img, mask = dataset.get_image_and_mask(img_id)
    fig = visualize_temperature_sampling(model, variables, img, mask,
                                         jax.random.PRNGKey(1),
                                         temperatures=(0.5, 1.0),
                                         samples_per_temp=2)
    fig.savefig(tmp_path / "temps.png")
    fig, results = generate_and_compare_ensemble(model, variables, img, mask,
                                                 jax.random.PRNGKey(2),
                                                 temperatures=(0.5, 1.0),
                                                 samples_per_temp=2,
                                                 patch_size=None)
    fig.savefig(tmp_path / "ensemble.png")
    assert "dice_ensemble" in results
    for f in ("recon.png", "temps.png", "ensemble.png"):
        assert (tmp_path / f).exists()
