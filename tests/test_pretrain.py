"""Self-supervised encoder pretraining (vaeunet_tpu/training/pretrain.py):
the in-domain substitute for the reference's ImageNet init
(unet_resnet.py:131-137)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vaeunet_tpu.training.config import TrainConfig
from vaeunet_tpu.training.pretrain import (MaskedReconstructor,
                                           encoder_subtree,
                                           make_block_mask,
                                           make_pretrain_step,
                                           transplant_encoder)
from vaeunet_tpu.training.state import create_train_state


def test_block_mask_shape_and_ratio():
    m = make_block_mask(jax.random.PRNGKey(0), 4, 64, block=16,
                        mask_ratio=0.4)
    assert m.shape == (4, 64, 64, 1)
    assert set(np.unique(np.asarray(m))) <= {0.0, 1.0}
    # blocks are coherent 16x16 squares
    blocks = np.asarray(m)[:, ::16, ::16, 0]
    up = np.repeat(np.repeat(blocks, 16, 1), 16, 2)
    np.testing.assert_array_equal(up, np.asarray(m)[..., 0])
    assert 0.2 < float(m.mean()) < 0.6


@pytest.mark.slow
@pytest.mark.nightly  # rebalanced r5: watched tier held to ~10 min (RESULTS)
def test_pretrain_learns_and_transplants():
    """A few masked-reconstruction steps reduce the loss, and the trained
    encoder transplants into UNetResNet with exact shape/value agreement."""
    model = MaskedReconstructor()
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((1, 64, 64, 3)), train=False)
    params, bs = v["params"], v["batch_stats"]
    tx, step = make_pretrain_step(model, 1e-3, amp=False)
    opt = tx.init(params)
    imgs = jnp.asarray(np.random.RandomState(0).rand(2, 64, 64, 3)
                       .astype(np.float32))
    rng = jax.random.PRNGKey(1)
    first = None
    for _ in range(4):
        params, bs, opt, rng, loss, _ = step(params, bs, opt, imgs, rng)
        first = first if first is not None else float(loss)
    assert float(loss) < first

    cfg = TrainConfig(model_type="resnet", latent_dim=8, batch_size=2,
                      amp=False, patch_size=64, seed=0)
    state = create_train_state(cfg, jax.random.PRNGKey(0), (64, 64))
    enc = encoder_subtree({"params": params, "batch_stats": bs})
    var2 = transplant_encoder(state.variables(), enc)
    for a, b in zip(jax.tree.leaves(var2["params"]["encoder"]),
                    jax.tree.leaves(params["encoder"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # wrong-backbone shapes must be rejected, not silently mis-merged
    cfg50 = TrainConfig(model_type="resnet", backbone="resnet50",
                        latent_dim=8, batch_size=2, amp=False, patch_size=64)
    state50 = create_train_state(cfg50, jax.random.PRNGKey(0), (64, 64))
    with pytest.raises(ValueError):
        transplant_encoder(state50.variables(), enc)


def test_ntxent_loss_prefers_aligned_pairs():
    """NT-Xent: exact value on an orthogonal-pair construction, and aligned
    positives score lower than misaligned ones."""
    from vaeunet_tpu.training.pretrain import ntxent_loss

    # perfectly aligned positives, orthogonal negatives
    e = jnp.eye(4, dtype=jnp.float32)
    z1 = e[:2]                       # [[1,0,0,0],[0,1,0,0]]
    z2 = e[:2]
    t = 0.5
    # each row: positive sim 1, two negatives sim 0 (other pair + its view),
    # self masked -> loss = -log(e^{1/t} / (e^{1/t} + 2 e^{0}))
    expect = -np.log(np.exp(1 / t) / (np.exp(1 / t) + 2.0))
    got = float(ntxent_loss(z1, z2, temperature=t))
    assert abs(got - expect) < 1e-5

    # shuffled positives (misaligned) must score strictly worse
    bad = float(ntxent_loss(z1, z2[::-1], temperature=t))
    assert bad > got + 0.1


@pytest.mark.slow
@pytest.mark.nightly  # rebalanced r5: watched tier held to ~10 min (RESULTS)
def test_contrastive_projector_transplants():
    """The contrastive pretext's encoder subtree transplants into UNetResNet
    exactly like the masked one (same contract), and outputs are unit-norm."""
    from vaeunet_tpu.training.pretrain import ContrastiveProjector

    model = ContrastiveProjector()
    v = model.init({"params": jax.random.PRNGKey(0)},
                   jnp.zeros((2, 64, 64, 3)), train=False)
    z = model.apply(v, jnp.asarray(
        np.random.RandomState(0).rand(2, 64, 64, 3).astype(np.float32)),
        train=False)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(z), axis=-1),
                               1.0, atol=1e-5)
    enc = encoder_subtree(v)
    config = TrainConfig(model_type="resnet", batch_size=1, patch_size=64)
    state = create_train_state(config, jax.random.PRNGKey(1), (64, 64))
    out = transplant_encoder(
        {"params": state.params, "batch_stats": state.batch_stats}, enc)
    chex_leaf = jax.tree_util.tree_leaves(out["params"]["encoder"])[0]
    src_leaf = jax.tree_util.tree_leaves(enc["params"]["encoder"])[0]
    np.testing.assert_array_equal(np.asarray(chex_leaf), np.asarray(src_leaf))
