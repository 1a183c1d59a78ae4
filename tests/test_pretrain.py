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
