"""Parity and behavior of the VAE-UNet (UNetResNet) flagship model."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.torch_mirrors import UNetResNetT
from vaeunet_tpu.compat.torch_weights import convert_unet_resnet_state_dict
from vaeunet_tpu.models.vae_unet import UNetResNet, resolve_injection


def _randomize_bn_stats(model: torch.nn.Module, seed: int = 0):
    """Fresh BN running stats are (0,1) which hides stat-mapping bugs —
    randomize them."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0, 0.5, generator=g)
            m.running_var.uniform_(0.5, 2.0, generator=g)


@pytest.mark.parametrize("injection", ["all", "first", "last", "bottleneck",
                                       "inject_no_bottleneck", "none"])
@pytest.mark.slow
def test_forward_parity_deterministic(injection):
    torch.manual_seed(42)
    ref = UNetResNetT(3, 1, latent_dim=32, latent_injection=injection)
    _randomize_bn_stats(ref)
    ref.eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref_logits, ref_mu, ref_logvar = ref(x)

    variables = jax.tree.map(
        jnp.asarray, convert_unet_resnet_state_dict(ref.state_dict()))
    model = UNetResNet(3, 1, latent_dim=32, latent_injection=injection)
    logits, mu, logvar = model.apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        train=False, sample=False)
    logits = np.asarray(logits).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(np.asarray(mu), ref_mu.numpy(), atol=1e-4)
    np.testing.assert_allclose(np.asarray(logvar), ref_logvar.numpy(), atol=1e-4)
    np.testing.assert_allclose(logits, ref_logits.numpy(), rtol=0, atol=5e-4)
    # default (fused) decoder: masks identical except numerically-borderline
    # pixels (|p - 0.5| < 1e-4); strict bit-identity is covered separately
    # with fused_decoder=False
    p_ours = 1 / (1 + np.exp(-logits))
    p_ref = 1 / (1 + np.exp(-ref_logits.numpy()))
    disagree = (p_ours > 0.5) != (p_ref > 0.5)
    assert (np.abs(p_ref[disagree] - 0.5) < 1e-4).all()


def test_strict_mode_masks_bit_identical():
    """fused_decoder=False: thresholded masks bit-identical to torch."""
    torch.manual_seed(42)
    ref = UNetResNetT(3, 1, latent_dim=32, latent_injection="last")
    _randomize_bn_stats(ref)
    ref.eval()
    x = torch.randn(2, 3, 64, 64)
    with torch.no_grad():
        ref_logits, _, _ = ref(x)
    variables = jax.tree.map(
        jnp.asarray, convert_unet_resnet_state_dict(ref.state_dict()))
    model = UNetResNet(3, 1, latent_dim=32, latent_injection="last",
                       fused_decoder=False)
    logits, _, _ = model.apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        train=False, sample=False)
    logits = np.asarray(logits).transpose(0, 3, 1, 2)
    p_ours = 1 / (1 + np.exp(-logits))
    p_ref = 1 / (1 + np.exp(-ref_logits.numpy()))
    assert ((p_ours > 0.5) == (p_ref > 0.5)).all()


def test_no_skip_no_attention_parity():
    torch.manual_seed(7)
    ref = UNetResNetT(3, 1, use_attention=False, use_skip=False)
    _randomize_bn_stats(ref, 7)
    ref.eval()
    x = torch.randn(1, 3, 64, 64)
    with torch.no_grad():
        ref_logits, _, _ = ref(x)
    variables = jax.tree.map(
        jnp.asarray, convert_unet_resnet_state_dict(ref.state_dict()))
    model = UNetResNet(3, 1, use_attention=False, use_skip=False)
    logits, _, _ = model.apply(
        variables, jnp.asarray(x.numpy().transpose(0, 2, 3, 1)),
        train=False, sample=False)
    np.testing.assert_allclose(np.asarray(logits).transpose(0, 3, 1, 2),
                               ref_logits.numpy(), rtol=0, atol=5e-4)


def test_resolve_injection_table():
    """Strategy table must match unet_resnet.py:156-175,210."""
    assert resolve_injection("all") == ((True,) * 4, True, True)
    assert resolve_injection("first") == ((True, False, False, False), True, True)
    assert resolve_injection("last") == ((False, False, False, True), True, True)
    assert resolve_injection("bottleneck") == ((False,) * 4, True, True)
    assert resolve_injection("inject_no_bottleneck") == ((True,) * 4, False, False)
    assert resolve_injection("none") == ((False,) * 4, False, False)
    assert resolve_injection((0, 2)) == ((True, False, True, False), True, True)
    assert resolve_injection("garbage") == ((True,) * 4, True, True)


def test_sampling_statistics():
    """Reparameterized z must follow N(mu, e^logvar * T^2)."""
    model = UNetResNet(3, 1)
    mu = jnp.array([[1.0, -2.0]])
    logvar = jnp.array([[0.0, jnp.log(4.0)]])
    keys = jax.random.split(jax.random.PRNGKey(0), 4096)

    bound = model.bind({"params": {}})
    zs = jax.vmap(lambda k: bound.reparameterize(mu, logvar, k, temperature=2.0))(keys)
    zs = np.asarray(zs)[:, 0, :]
    np.testing.assert_allclose(zs.mean(0), [1.0, -2.0], atol=0.15)
    np.testing.assert_allclose(zs.std(0), [2.0, 4.0], rtol=0.1)


@pytest.mark.slow
def test_encode_decode_ensemble_consistency():
    """vmap'd decode_features over N z-samples == looped decodes, and
    encode()+decode_features(z=mu) == forward(sample=False)."""
    model = UNetResNet(3, 1, latent_dim=8)
    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "latent": jax.random.PRNGKey(9)},
        x, train=False)

    logits_fwd, mu, logvar = model.apply(variables, x, train=False, sample=False)

    mu2, logvar2, features = model.apply(
        variables, x, train=False, method=UNetResNet.encode_with_features)
    np.testing.assert_array_equal(np.asarray(mu), np.asarray(mu2))

    logits_dec = model.apply(variables, mu2, features, (32, 32), False,
                             method=UNetResNet.decode_features)
    np.testing.assert_array_equal(np.asarray(logits_fwd), np.asarray(logits_dec))

    # N-sample ensemble via vmap matches per-sample loop
    zs = jax.vmap(lambda k: mu2 + jax.random.normal(k, mu2.shape))(
        jax.random.split(jax.random.PRNGKey(2), 3))
    ens = jax.vmap(lambda z: model.apply(
        variables, z, features, (32, 32), False,
        method=UNetResNet.decode_features))(zs)
    for i in range(3):
        one = model.apply(variables, zs[i], features, (32, 32), False,
                          method=UNetResNet.decode_features)
        np.testing.assert_allclose(np.asarray(ens[i]), np.asarray(one), atol=1e-5)


def test_logvar_clamp_keeps_sampling_finite():
    """Runaway logvar head outputs must not NaN the sampled forward
    (PARITY.md #22); strict mode (logvar_clamp=None) is available."""
    model = UNetResNet(3, 1, latent_dim=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 32, 32, 3))
    variables = model.init(
        {"params": jax.random.PRNGKey(1), "latent": jax.random.PRNGKey(2)},
        x, train=False)
    # push the logvar head to produce absurd values
    import flax
    params = flax.core.unfreeze(variables["params"]) if hasattr(
        flax.core, "unfreeze") else dict(variables["params"])
    params["logvar_conv"]["bias"] = jnp.full_like(
        params["logvar_conv"]["bias"], 1e6)
    variables = {"params": params, "batch_stats": variables["batch_stats"]}

    mu, logvar = model.apply(variables, x, False, method=UNetResNet.encode)
    assert float(jnp.max(logvar)) <= 30.0
    logits, _, _ = model.apply(variables, x, train=False,
                               rngs={"latent": jax.random.PRNGKey(3)})
    assert bool(jnp.isfinite(logits).all())

    strict = UNetResNet(3, 1, latent_dim=8, logvar_clamp=None)
    _, logvar_raw = strict.apply(variables, x, False, method=UNetResNet.encode)
    assert float(jnp.max(logvar_raw)) > 30.0


@pytest.mark.slow
def test_fused_decoder_matches_naive():
    """fused=True (no concat / no z broadcast) must equal the naive lowering
    with identical parameters, in eval and train mode."""
    import flax

    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3 * 48 * 48)).reshape(2, 48, 48, 3)
    m_fused = UNetResNet(3, 1, latent_dim=8)
    m_naive = UNetResNet(3, 1, latent_dim=8, fused_decoder=False)
    variables = m_fused.init(
        {"params": jax.random.PRNGKey(1), "latent": jax.random.PRNGKey(2)},
        x, train=False, sample=False)

    yf, muf, _ = m_fused.apply(variables, x, train=False, sample=False)
    yn, mun, _ = m_naive.apply(variables, x, train=False, sample=False)
    np.testing.assert_array_equal(np.asarray(muf), np.asarray(mun))
    np.testing.assert_allclose(np.asarray(yf), np.asarray(yn), atol=2e-5)

    # train mode: outputs and updated batch stats agree
    (ytf, *_), mf = m_fused.apply(variables, x, train=True, sample=False,
                                  mutable=["batch_stats"])
    (ytn, *_), mn = m_naive.apply(variables, x, train=True, sample=False,
                                  mutable=["batch_stats"])
    # train mode normalizes by batch statistics, which amplifies fp
    # reassociation noise through 8 BN layers — tolerance reflects that
    np.testing.assert_allclose(np.asarray(ytf), np.asarray(ytn), atol=2e-3)
    for (pf, vf), (pn, vn) in zip(
            sorted(jax.tree_util.tree_flatten_with_path(mf)[0],
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_flatten_with_path(mn)[0],
                   key=lambda t: str(t[0]))):
        assert str(pf) == str(pn)
        np.testing.assert_allclose(np.asarray(vf), np.asarray(vn), atol=1e-3,
                                   err_msg=str(pf))


@pytest.mark.slow
@pytest.mark.nightly  # rebalanced r5: watched tier held to ~10 min (RESULTS)
def test_remat_modes_match_no_remat():
    """Rematerialization (full and save_convs policies) must not change
    loss or gradients — it only changes what backward recomputes."""
    x = jnp.asarray(np.random.RandomState(0).rand(1, 64, 64, 3)
                    .astype(np.float32))
    results = {}
    for name, kw in [("off", {}), ("full", dict(use_remat=True)),
                     ("save_convs", dict(use_remat=True,
                                         remat_policy="save_convs"))]:
        m = UNetResNet(n_classes=1, latent_dim=8, **kw)
        rngs = {"params": jax.random.PRNGKey(0),
                "latent": jax.random.PRNGKey(1)}
        variables = m.init(rngs, x, train=True)

        def loss_fn(p, m=m, variables=variables):
            out, _ = m.apply(
                {"params": p, "batch_stats": variables["batch_stats"]}, x,
                train=True, rngs={"latent": jax.random.PRNGKey(2)},
                mutable=["batch_stats"])
            return jnp.mean(out[0] ** 2)

        g = jax.grad(loss_fn)(variables["params"])
        results[name] = (
            float(loss_fn(variables["params"])),
            float(jax.tree_util.tree_reduce(
                lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)))
    for mode in ("full", "save_convs"):
        np.testing.assert_allclose(results[mode][0], results["off"][0],
                                   rtol=1e-6)
        np.testing.assert_allclose(results[mode][1], results["off"][1],
                                   rtol=1e-5)
