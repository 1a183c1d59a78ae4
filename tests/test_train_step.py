"""Training-step behavior: loss decreases, accumulation semantics, lr control,
plateau scheduler."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vaeunet_tpu.losses import KLAnnealer
from vaeunet_tpu.training.config import TrainConfig
from vaeunet_tpu.training.schedule import ReduceLROnPlateau
from vaeunet_tpu.training.state import (create_train_state, get_learning_rate,
                                        set_learning_rate)
from vaeunet_tpu.training.step import make_eval_step, make_train_step


def _tiny_config(**kw):
    base = dict(model_type="resnet", latent_dim=8, batch_size=4,
                patch_size=32, learning_rate=1e-3, amp=False,
                gradient_accumulation_steps=1, lesion_type="EX", seed=0)
    base.update(kw)
    return TrainConfig(**base)


def _synthetic_batch(rng, b=4, hw=32):
    """Images with a bright disc whose interior is the mask — learnable."""
    keys = jax.random.split(rng, 2)
    yy, xx = jnp.mgrid[0:hw, 0:hw]
    centers = jax.random.randint(keys[0], (b, 2), hw // 4, 3 * hw // 4)
    r = hw // 5
    masks = ((yy[None] - centers[:, 0, None, None]) ** 2
             + (xx[None] - centers[:, 1, None, None]) ** 2 < r * r)
    masks = masks.astype(jnp.float32)[..., None]
    noise = 0.1 * jax.random.normal(keys[1], (b, hw, hw, 3))
    images = masks * 0.8 + 0.1 + noise
    return jnp.clip(images, 0, 1), masks


@pytest.mark.slow
def test_loss_decreases():
    config = _tiny_config()
    state = create_train_state(config, jax.random.PRNGKey(0), (32, 32))
    step = make_train_step(config)
    images, masks = _synthetic_batch(jax.random.PRNGKey(1))
    losses = []
    for i in range(8):
        state, aux = step(state, images, masks, jnp.float32(0.0))
        losses.append(float(aux["loss"]))
    assert losses[-1] < losses[0], losses
    assert all(np.isfinite(losses))
    assert int(state.step) == 8


@pytest.mark.slow
def test_grad_accumulation_equivalence():
    """accum=2 over batch 4 must match accum=1 statistically — exact
    equivalence is broken by per-microbatch BN stats (as in torch), so check
    the first-step loss aggregation instead."""
    images, masks = _synthetic_batch(jax.random.PRNGKey(2))
    c1 = _tiny_config(gradient_accumulation_steps=1)
    c2 = _tiny_config(gradient_accumulation_steps=2)
    s1 = create_train_state(c1, jax.random.PRNGKey(0), (32, 32))
    s2 = create_train_state(c2, jax.random.PRNGKey(0), (32, 32))
    step1 = make_train_step(c1)
    step2 = make_train_step(c2)
    s1, a1 = step1(s1, images, masks, jnp.float32(0.001))
    s2, a2 = step2(s2, images, masks, jnp.float32(0.001))
    assert np.isfinite(float(a2["loss"]))
    # same init, similar data -> losses in the same ballpark
    assert abs(float(a1["loss"]) - float(a2["loss"])) < 0.5
    assert a2["mu"].shape == (4, 8)


@pytest.mark.slow
def test_learning_rate_injection():
    config = _tiny_config()
    state = create_train_state(config, jax.random.PRNGKey(0), (32, 32))
    assert get_learning_rate(state) == pytest.approx(1e-3)
    state = set_learning_rate(state, 5e-4)
    assert get_learning_rate(state) == pytest.approx(5e-4)
    # the updated lr must drive the next step without error
    step = make_train_step(config)
    images, masks = _synthetic_batch(jax.random.PRNGKey(3))
    state, aux = step(state, images, masks, jnp.float32(0.0))
    assert np.isfinite(float(aux["loss"]))


def test_eval_step_resizes_and_reports():
    config = _tiny_config()
    state = create_train_state(config, jax.random.PRNGKey(0), (32, 32))
    eval_step = make_eval_step(config)
    images, masks = _synthetic_batch(jax.random.PRNGKey(4))
    metrics, logits = eval_step(state.variables(), images, masks,
                                jax.random.PRNGKey(5))
    for k in ("dice", "iou", "precision", "recall", "specificity", "accuracy"):
        v = float(metrics[k])
        assert 0.0 <= v <= 1.0, (k, v)
    assert logits.shape == (4, 32, 32, 1)


def test_plateau_scheduler_matches_torch():
    import torch
    lin = torch.nn.Linear(1, 1)
    opt = torch.optim.SGD(lin.parameters(), lr=1.0)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="max", patience=2, factor=0.5, min_lr=0.01)
    ours = ReduceLROnPlateau(factor=0.5, patience=2, min_lr=0.01)
    lr = 1.0
    series = [0.5, 0.6, 0.6, 0.6, 0.6, 0.61, 0.61, 0.61, 0.61, 0.2, 0.2, 0.2]
    for m in series:
        ref.step(m)
        lr = ours.step(m, lr)
        assert lr == pytest.approx(opt.param_groups[0]["lr"]), m


def test_kl_annealer_drives_beta():
    ann = KLAnnealer(kl_start=0.0, kl_end=0.001, warmup_epochs=20)
    assert ann.get_weight(0) == 0.0
    assert ann.get_weight(10) == pytest.approx(0.0005)
    assert ann.get_weight(20) == pytest.approx(0.001)
    assert ann.get_weight(400) == pytest.approx(0.001)


def test_deep_supervision_trains_and_keeps_default_params():
    """DS adds ds_head_* params, its aux losses flow gradients, and the
    default (off) param tree is unchanged — reference parity preserved."""
    cfg_off = _tiny_config()
    cfg_on = _tiny_config(deep_supervision=True)
    state_off = create_train_state(cfg_off, jax.random.PRNGKey(0),
                                   sample_input_hw=(32, 32))
    state_on = create_train_state(cfg_on, jax.random.PRNGKey(0),
                                  sample_input_hw=(32, 32))

    def names(tree, prefix=""):
        out = set()
        for k, v in tree.items():
            p = f"{prefix}/{k}"
            out |= names(v, p) if isinstance(v, dict) else {p}
        return out

    on, off = names(state_on.params), names(state_off.params)
    extra = {n for n in on - off}
    assert extra and all("ds_head_" in n for n in extra), extra
    assert not (off - on)

    images, masks = _synthetic_batch(jax.random.PRNGKey(1))
    step = make_train_step(cfg_on, jit=False)
    new_state, aux = step(state_on, images, masks, jnp.float32(0.001))
    assert np.isfinite(float(aux["loss"]))
    # aux-head kernels must receive gradient (they only get it via DS loss)
    moved = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        state_on.params["ds_head_0"], new_state.params["ds_head_0"])
    assert max(jax.tree_util.tree_leaves(moved)) > 0.0
