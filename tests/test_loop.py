"""End-to-end smoke: synthetic dataset -> short training -> checkpoint ->
restore -> values round-trip.  (The test pyramid apex, SURVEY.md section 4.)"""

import numpy as np
import pytest
from PIL import Image

import jax
import jax.numpy as jnp

from vaeunet_tpu.training.checkpoint import restore_checkpoint, load_config
from vaeunet_tpu.training.config import TrainConfig
from vaeunet_tpu.training.loop import train_model
from vaeunet_tpu.training.state import create_train_state, get_learning_rate
from vaeunet_tpu.utils.tracking import Tracker


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("idrid_e2e")
    rng = np.random.RandomState(0)
    for split, n in (("train", 3), ("val", 2)):
        (root / "imgs" / split).mkdir(parents=True)
        (root / "masks" / split / "EX").mkdir(parents=True)
        for i in range(n):
            h, w = 64, 64
            yy, xx = np.mgrid[0:h, 0:w]
            cy, cx = rng.randint(20, 44), rng.randint(20, 44)
            blob = (yy - cy) ** 2 + (xx - cx) ** 2 < 80
            img = np.full((h, w, 3), 40, np.uint8)
            img[blob] = 220
            mask = np.zeros((h, w), np.uint8)
            mask[blob] = 255
            Image.fromarray(img).save(root / "imgs" / split / f"IDRiD_{i:02d}.jpg")
            Image.fromarray(mask).save(
                root / "masks" / split / "EX" / f"IDRiD_{i:02d}_EX.tif")
    return root


@pytest.mark.slow
@pytest.mark.nightly
def test_train_checkpoint_resume(synth_root, tmp_path):
    config = TrainConfig(
        model_type="resnet", latent_dim=8, epochs=2, batch_size=2,
        gradient_accumulation_steps=1, learning_rate=1e-3, amp=False,
        data_dir=str(synth_root), img_scale=1.0, patch_size=32,
        lesion_type="EX", seed=0, checkpoint_dir=str(tmp_path / "ckpt"),
        kl_anneal_epochs=2, early_stopping_patience=100)
    tracker = Tracker(run_dir=str(tmp_path / "runs"), config={"test": True})
    state = train_model(config, tracker=tracker)
    assert int(state.step) > 0

    run_dir = config.checkpoint_path()
    saved_cfg = load_config(run_dir)
    assert saved_cfg is not None and saved_cfg.lesion_type == "EX"

    template = create_train_state(config, jax.random.PRNGKey(0), (32, 32))
    restored, host_state = restore_checkpoint(run_dir, template)
    assert host_state["best_val_score"] > 0
    assert int(restored.step) > 0
    assert get_learning_rate(restored) > 0
    # restored params are real values (not the template's init)
    diff = jax.tree.reduce(
        lambda a, b: a + b,
        jax.tree.map(lambda a, b: float(jnp.sum(jnp.abs(a - b))),
                     restored.params, template.params))
    assert diff > 0

    # metrics were tracked
    lines = (tracker.run_dir / "metrics.jsonl").read_text().strip().splitlines()
    assert any("val/dice" in ln for ln in lines)
    assert any("train/total_loss" in ln for ln in lines)


@pytest.mark.slow
@pytest.mark.nightly
def test_resume_continues_training(synth_root, tmp_path):
    """resume_from restores step/best/scheduler and continues from the next
    epoch (the true-resume capability the reference lacks)."""
    config = TrainConfig(
        model_type="resnet", latent_dim=8, epochs=1, batch_size=2,
        gradient_accumulation_steps=1, learning_rate=1e-3, amp=False,
        data_dir=str(synth_root), img_scale=1.0, patch_size=32,
        lesion_type="EX", seed=0, checkpoint_dir=str(tmp_path / "ckpt"),
        kl_anneal_epochs=2, early_stopping_patience=100)
    tracker = Tracker(run_dir=str(tmp_path / "runs1"))
    state1 = train_model(config, tracker=tracker)
    step1 = int(state1.step)
    run_dir = config.checkpoint_path()

    import dataclasses
    config2 = dataclasses.replace(config, epochs=2)
    tracker2 = Tracker(run_dir=str(tmp_path / "runs2"))
    state2 = train_model(config2, tracker=tracker2, resume_from=run_dir)
    assert int(state2.step) > step1
    lines = (tracker2.run_dir / "metrics.jsonl").read_text().splitlines()
    import json
    epochs_logged = {json.loads(l).get("epoch") for l in lines
                     if "train/total_loss" in l}
    assert epochs_logged == {2.0}  # resumed directly into epoch 2

    # Resuming into the SAME run dir must keep the restored-from weights
    # recoverable: later "better val" checkpoints can overfit a small train
    # set (RESULTS.md round 2), so best_preresume preserves the originals.
    from pathlib import Path
    assert (Path(run_dir) / "best_preresume").exists()


@pytest.mark.slow
def test_eval_padding_does_not_bias_metrics():
    """A 5-sample dataset at batch 4 pads the final batch by repeating
    samples (loader np.resize); evaluate_model must mask the padded rows so
    the averaged metrics equal the unpadded per-batch computation
    (reference behavior: true-size final batch, evaluate.py:39-99)."""
    from vaeunet_tpu.data.loader import Loader
    from vaeunet_tpu.metrics import get_all_metrics
    from vaeunet_tpu.training.loop import evaluate_model
    from vaeunet_tpu.training.state import create_train_state
    from vaeunet_tpu.training.step import make_eval_step

    rng = np.random.RandomState(3)
    n, hw = 5, 32
    images = rng.rand(n, hw, hw, 3).astype(np.float32)
    masks = (rng.rand(n, hw, hw, 1) > 0.7).astype(np.float32)

    class TinyDS:
        def __len__(self):
            return n

        def __getitem__(self, i):
            return {"image": images[i], "mask": masks[i],
                    "img_id": f"im{i}"}

    config = TrainConfig(model_type="resnet", latent_dim=8, batch_size=4,
                         amp=False, patch_size=hw, seed=0, lesion_type="EX")
    state = create_train_state(config, jax.random.PRNGKey(0), (hw, hw))
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    eval_step = make_eval_step(config)

    loader = Loader(TinyDS(), batch_size=4, shuffle=False, drop_last=False)
    metrics, _ = evaluate_model(eval_step, variables, loader,
                                jax.random.PRNGKey(1), max_samples=0)

    # reference computation: batch [0:4] at full size, batch [4:5] unpadded
    model_logits = []
    for sl in (slice(0, 4), slice(4, 5)):
        _, logits = eval_step(variables, jnp.asarray(images[sl]),
                              jnp.asarray(masks[sl]), jax.random.PRNGKey(9),
                              jnp.ones((sl.stop - sl.start,), jnp.float32)
                              if sl.stop - sl.start < 4 else None)
        model_logits.append(logits)
    expected = {}
    for sl, logits in zip((slice(0, 4), slice(4, 5)), model_logits):
        m = get_all_metrics(logits, jnp.asarray(masks[sl]))
        for k, v in m.items():
            expected.setdefault(k, []).append(float(v))
    for k in expected:
        np.testing.assert_allclose(metrics[k], np.mean(expected[k]),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"metric {k} biased by padding")
