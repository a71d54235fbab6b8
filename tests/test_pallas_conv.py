"""Fused Pallas conv block == pure-XLA reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinddm_tpu.ops.pallas_conv import conv_block_reference, fused_conv_block


def _random_block(key, b, h, w, c, co, identity_res):
    ks = jax.random.split(key, 10)
    scale = 0.2
    x = jax.random.normal(ks[0], (b, h, w, c))
    cond = jax.random.normal(ks[1], (b, c)) * scale
    wdw = jax.random.normal(ks[2], (5, 5, c)) * scale
    bdw = jax.random.normal(ks[3], (c,)) * scale
    w1 = jax.random.normal(ks[4], (3, 3, c, co)) * scale
    b1 = jax.random.normal(ks[5], (co,)) * scale
    w2 = jax.random.normal(ks[6], (3, 3, co, co)) * scale
    b2 = jax.random.normal(ks[7], (co,)) * scale
    if identity_res:
        wres, bres = None, None
    else:
        wres = jax.random.normal(ks[8], (c, co)) * scale
        bres = jax.random.normal(ks[9], (co,)) * scale
    return x, cond, wdw, bdw, w1, b1, w2, b2, wres, bres


@pytest.mark.parametrize(
    "b,h,w,c,co,identity",
    [
        (2, 16, 24, 8, 16, False),   # expanding block with residual proj
        (1, 24, 16, 16, 16, True),   # identity residual
        (1, 19, 21, 8, 8, True),     # H not a tile multiple (padding path)
    ],
)
def test_fused_matches_reference(b, h, w, c, co, identity):
    args = _random_block(jax.random.PRNGKey(0), b, h, w, c, co, identity)
    ref = conv_block_reference(*args)
    out = fused_conv_block(*args, interpret=True)
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=2e-4, rtol=2e-4
    )


def test_fused_zero_padding_semantics():
    """Edges must see zero padding exactly like 'SAME' convs."""
    args = _random_block(jax.random.PRNGKey(1), 1, 16, 16, 8, 8, True)
    ref = conv_block_reference(*args)
    out = fused_conv_block(*args, interpret=True)
    # compare the border rows/cols specifically
    np.testing.assert_allclose(
        np.asarray(out[:, 0]), np.asarray(ref[:, 0]), atol=2e-4, rtol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out[:, :, -1]), np.asarray(ref[:, :, -1]), atol=2e-4, rtol=2e-4
    )


def test_pallas_denoiser_matches_flax():
    """apply_denoiser_pallas == SinDDMNet.apply over the same params."""
    from sinddm_tpu.models.denoiser import SinDDMNet, apply_denoiser_pallas

    model = SinDDMNet(dim=16)
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 28, 3))
    t = jnp.asarray([7, 42])
    params = model.init(key, x, t, jnp.asarray(1.0))["params"]
    ref = model.apply({"params": params}, x, t, jnp.asarray(1.0))
    out = apply_denoiser_pallas(params, x, t, jnp.asarray(1.0), interpret=True)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=3e-4, rtol=3e-4
    )


def test_depthwise_kernel_matches_oracle():
    """Device-verified dw kernel vs a float64 numpy oracle (interpret here)."""
    from sinddm_tpu.ops.pallas_dw import depthwise_conv5x5

    B, H, W, C = 2, 20, 28, 8
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, C))
    wdw = jax.random.normal(jax.random.PRNGKey(1), (5, 5, C)) * 0.2
    bias = jax.random.normal(jax.random.PRNGKey(2), (C,)) * 0.1
    out = depthwise_conv5x5(x, wdw, bias, tile_h=8, interpret=True)

    xn = np.asarray(x, np.float64)
    xpad = np.pad(xn, ((0, 0), (2, 2), (2, 2), (0, 0)))
    oracle = np.zeros((B, H, W, C))
    for di in range(5):
        for dj in range(5):
            oracle += xpad[:, di : di + H, dj : dj + W, :] * np.asarray(
                wdw, np.float64
            )[di, dj]
    oracle += np.asarray(bias, np.float64)
    np.testing.assert_allclose(np.asarray(out), oracle, atol=1e-5)
