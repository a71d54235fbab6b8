"""Denoiser: shapes, conditioning, and padded-mask exactness."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinddm_tpu.models.denoiser import SinDDMNet, sinusoidal_pos_emb


def _init(dim=32, h=24, w=20):
    model = SinDDMNet(dim=dim)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, h, w, 3))
    params = model.init(key, x, jnp.zeros((1,), jnp.int32), jnp.asarray(0.0))[
        "params"
    ]
    return model, params


def test_sinusoidal_matches_reference_formula():
    dim = 32
    t = jnp.asarray([0.0, 5.0, 99.0])
    emb = np.asarray(sinusoidal_pos_emb(t, dim))
    half = dim // 2
    freqs = np.exp(np.arange(half) * -(np.log(10000.0) / (half - 1)))
    args = np.asarray(t)[:, None] * freqs[None, :]
    expected = np.concatenate([np.sin(args), np.cos(args)], -1)
    assert np.allclose(emb, expected, atol=1e-4)  # fp32 sin/cos of large args


def test_output_shape_any_resolution():
    model, params = _init()
    for h, w in [(24, 20), (48, 64), (33, 57)]:
        x = jax.random.normal(jax.random.PRNGKey(1), (2, h, w, 3))
        t = jnp.asarray([3, 42])
        y = model.apply({"params": params}, x, t, jnp.asarray(1.0))
        assert y.shape == (2, h, w, 3)


def test_conditioning_changes_output():
    model, params = _init()
    x = jax.random.normal(jax.random.PRNGKey(2), (1, 24, 20, 3))
    y1 = model.apply({"params": params}, x, jnp.asarray([3]), jnp.asarray(0.0))
    y2 = model.apply({"params": params}, x, jnp.asarray([90]), jnp.asarray(0.0))
    y3 = model.apply({"params": params}, x, jnp.asarray([3]), jnp.asarray(2.0))
    assert not np.allclose(y1, y2)
    assert not np.allclose(y1, y3)


def test_channel_plan_matches_reference():
    """channels 3 -> dim/2 -> dim -> dim -> dim/2 -> 3 (models.py:122-131)."""
    model, params = _init(dim=160)
    assert params["l1"]["net_conv1"]["kernel"].shape[-1] == 80
    assert params["l2"]["net_conv1"]["kernel"].shape[-1] == 160
    assert params["l3"]["net_conv1"]["kernel"].shape[-1] == 160
    assert params["l4"]["net_conv1"]["kernel"].shape[-1] == 80
    assert params["final_conv"]["kernel"].shape == (1, 1, 80, 3)
    # depthwise 5x5
    assert params["l2"]["ds_conv"]["kernel"].shape[:2] == (5, 5)


def test_padded_mask_exactness():
    """Padded + masked forward must equal the unpadded forward bit-for-bit
    on the valid region (enables the fused uniform-shape train path)."""
    model, params = _init(dim=32, h=24, w=20)
    key = jax.random.PRNGKey(3)
    x = jax.random.normal(key, (2, 24, 20, 3))
    t = jnp.asarray([7, 55])
    s = jnp.asarray(1.0)
    y_ref = model.apply({"params": params}, x, t, s)

    hp, wp = 40, 33  # padded canvas
    xp = jnp.zeros((2, hp, wp, 3)).at[:, :24, :20, :].set(x)
    mask = jnp.zeros((1, hp, wp, 1)).at[:, :24, :20, :].set(1.0)
    yp = model.apply({"params": params}, xp, t, s, mask=mask)

    np.testing.assert_allclose(
        np.asarray(yp[:, :24, :20, :]), np.asarray(y_ref), rtol=0, atol=1e-5
    )
    # padding region output is exactly zero
    assert float(jnp.abs(yp[:, 24:, :, :]).max()) == 0.0
    assert float(jnp.abs(yp[:, :, 20:, :]).max()) == 0.0
