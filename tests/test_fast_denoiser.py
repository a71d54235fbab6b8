"""Dot-formulated denoiser executor == flax SinDDMNet (same param tree)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinddm_tpu.models import SinDDMNet
from sinddm_tpu.models.fast_denoiser import (
    apply_denoiser_dot,
    conv2d_dot,
    depthwise5x5_shifted,
)


@pytest.fixture(scope="module")
def net():
    model = SinDDMNet(dim=16)
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 24, 28, 3))
    t = jnp.asarray([3, 77])
    params = model.init(jax.random.PRNGKey(1), x, t, jnp.asarray(0.0))["params"]
    return model, params, x, t


def test_conv2d_dot_matches_xla_conv():
    x = jax.random.normal(jax.random.PRNGKey(2), (2, 10, 12, 8))
    w = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 8, 6)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(4), (6,))
    ref = (
        jax.lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
        )
        + b
    )
    got = conv2d_dot(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_depthwise_shifted_matches_xla_grouped_conv():
    x = jax.random.normal(jax.random.PRNGKey(5), (2, 10, 12, 8))
    w = jax.random.normal(jax.random.PRNGKey(6), (5, 5, 8)) * 0.2
    b = jax.random.normal(jax.random.PRNGKey(7), (8,))
    ref = (
        jax.lax.conv_general_dilated(
            x, w[:, :, None, :], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=8,
        )
        + b
    )
    got = depthwise5x5_shifted(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_full_forward_fp32_matches_flax(net):
    model, params, x, t = net
    ref = model.apply({"params": params}, x, t, jnp.asarray(2.0))
    got = apply_denoiser_dot(params, x, t, jnp.asarray(2.0),
                             compute_dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_full_forward_bf16_close_to_fp32(net):
    model, params, x, t = net
    ref = np.asarray(model.apply({"params": params}, x, t, jnp.asarray(2.0)))
    got = np.asarray(
        apply_denoiser_dot(params, x, t, jnp.asarray(2.0),
                           compute_dtype=jnp.bfloat16)
    )
    # bf16 has an 8-bit mantissa; activations here are O(1)
    scale = np.abs(ref).max()
    assert np.abs(got - ref).max() / scale < 0.05
    assert np.isfinite(got).all()


def test_sampling_with_fast_mode_runs(net, tiny_pyramid):
    from sinddm_tpu.apps.sampling import sample_scales
    from sinddm_tpu.schedules import make_schedules

    model, _, _, _ = net
    pyr = tiny_pyramid
    sched = make_schedules(
        timesteps=20, scale_losses=pyr.rescale_losses, n_scales=pyr.n_scales
    )
    h0, w0 = pyr.sizes_hw[0]
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h0, w0, 3)),
        jnp.zeros((1,), jnp.int32), jnp.asarray(0.0),
    )["params"]
    outs = sample_scales(
        model, params, sched, pyr.sizes_hw, jax.random.PRNGKey(0),
        scale_factor=pyr.scale_factor, n_scales=pyr.n_scales, batch_size=2,
        custom_sample=True, custom_t_list=[3] * (pyr.n_scales - 1),
        fast_mode="bf16_dot",
    )
    assert np.isfinite(np.asarray(outs[-1])).all()
    # fp32 dot mode matches the default executor end-to-end
    outs_dot32 = sample_scales(
        model, params, sched, pyr.sizes_hw, jax.random.PRNGKey(0),
        scale_factor=pyr.scale_factor, n_scales=pyr.n_scales, batch_size=2,
        custom_sample=True, custom_t_list=[3] * (pyr.n_scales - 1),
        fast_mode="fp32_dot",
    )
    outs_ref = sample_scales(
        model, params, sched, pyr.sizes_hw, jax.random.PRNGKey(0),
        scale_factor=pyr.scale_factor, n_scales=pyr.n_scales, batch_size=2,
        custom_sample=True, custom_t_list=[3] * (pyr.n_scales - 1),
    )
    np.testing.assert_allclose(
        np.asarray(outs_dot32[-1]), np.asarray(outs_ref[-1]), atol=1e-3
    )
