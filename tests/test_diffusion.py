"""Diffusion core math vs independent hand-derived numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinddm_tpu.diffusion.core import (
    p_losses,
    p_sample_step,
    predict_start_from_noise,
    q_posterior,
    q_sample,
    sample_scale0,
    sample_via_scale,
    training_loss,
)
from sinddm_tpu.models.denoiser import SinDDMNet
from sinddm_tpu.schedules import make_schedules


@pytest.fixture(scope="module")
def sched():
    return make_schedules(
        timesteps=100, scale_losses=[1.0, 0.5], n_scales=3
    )


@pytest.fixture(scope="module")
def tiny_model():
    model = SinDDMNet(dim=16)
    key = jax.random.PRNGKey(0)
    x = jnp.zeros((1, 12, 10, 3))
    params = model.init(key, x, jnp.zeros((1,), jnp.int32), jnp.asarray(0.0))[
        "params"
    ]

    def model_fn(x, t, s):
        return model.apply({"params": params}, x, t, s)

    return model_fn


def test_q_sample_closed_form(sched):
    key = jax.random.PRNGKey(1)
    x0 = jax.random.normal(key, (2, 4, 4, 3))
    noise = jax.random.normal(jax.random.PRNGKey(2), x0.shape)
    t = jnp.asarray([10, 70])
    xt = q_sample(sched, x0, t, noise)
    ac = np.asarray(sched.alphas_cumprod)
    for b, tb in enumerate([10, 70]):
        expected = np.sqrt(ac[tb]) * np.asarray(x0[b]) + np.sqrt(
            1 - ac[tb]
        ) * np.asarray(noise[b])
        assert np.allclose(np.asarray(xt[b]), expected, atol=1e-5)


def test_predict_start_inverts_q_sample(sched):
    """With the true noise, predict_start recovers x0 exactly (s=0)."""
    x0 = jax.random.normal(jax.random.PRNGKey(3), (2, 4, 4, 3))
    noise = jax.random.normal(jax.random.PRNGKey(4), x0.shape)
    t = jnp.asarray([50, 50])
    xt = q_sample(sched, x0, t, noise)
    xr, xm = predict_start_from_noise(sched, xt, t, noise, s=0, reblurring=True)
    assert np.allclose(np.asarray(xr), np.asarray(x0), atol=1e-4)
    assert np.array_equal(np.asarray(xr), np.asarray(xm))


def test_predict_start_reblur_deblend(sched):
    """s>0 reblur: x_tm1_mix = (x0_pred - g*img_prev) / (1 - g), g clamped 0.55."""
    x0 = jax.random.normal(jax.random.PRNGKey(5), (1, 4, 4, 3))
    img_prev = jax.random.normal(jax.random.PRNGKey(6), x0.shape)
    noise = jax.random.normal(jax.random.PRNGKey(7), x0.shape)
    t = jnp.asarray([30])
    xt = q_sample(sched, x0, t, noise)
    row = sched.gammas_row_sampling(1)
    xr, xm = predict_start_from_noise(
        sched, xt, t, noise, s=1, reblurring=True, img_prev=img_prev,
        gammas_row=row,
    )
    g = float(row[30])
    assert g <= 0.55 + 1e-7
    expected = (np.asarray(x0) - g * np.asarray(img_prev)) / (1 - g)
    assert np.allclose(np.asarray(xr), expected, atol=1e-4)
    assert np.allclose(np.asarray(xm), np.asarray(x0), atol=1e-4)


def test_q_posterior_standard_matches_ddpm(sched):
    x0 = jax.random.normal(jax.random.PRNGKey(8), (1, 4, 4, 3))
    xt = jax.random.normal(jax.random.PRNGKey(9), x0.shape)
    t = jnp.asarray([40])
    mean, logvar = q_posterior(
        sched, x0, x0, xt, t, s=0, reblurring=True
    )
    c1 = float(sched.posterior_mean_coef1[40])
    c2 = float(sched.posterior_mean_coef2[40])
    assert np.allclose(
        np.asarray(mean), c1 * np.asarray(x0) + c2 * np.asarray(xt), atol=1e-5
    )
    assert np.allclose(
        float(logvar[0, 0, 0, 0]),
        float(sched.posterior_log_variance_clipped[40]),
    )


def test_q_posterior_reblur_custom(sched):
    """Custom posterior: mean = sqrt(abar_{t-1})*x_tm1_mix +
    sqrt(1-abar_{t-1}-var)*(x_t - sqrt(abar_t)*x_t_mix)/sqrt(1-abar_t)."""
    x_tm1 = jax.random.normal(jax.random.PRNGKey(10), (1, 4, 4, 3))
    x_t_mix = jax.random.normal(jax.random.PRNGKey(11), x_tm1.shape)
    xt = jax.random.normal(jax.random.PRNGKey(12), x_tm1.shape)
    tt = 25
    t = jnp.asarray([tt])
    omega = 0.3
    mean, logvar = q_posterior(
        sched, x_tm1, x_t_mix, xt, t, s=1, reblurring=True, omega=omega
    )
    ac = np.asarray(sched.alphas_cumprod, np.float64)
    var = omega * (1 - ac[tt - 1])
    expected = np.sqrt(ac[tt - 1]) * np.asarray(x_tm1) + np.sqrt(
        1 - ac[tt - 1] - var
    ) * (np.asarray(xt) - np.sqrt(ac[tt]) * np.asarray(x_t_mix)) / np.sqrt(
        1 - ac[tt]
    )
    assert np.allclose(np.asarray(mean), expected, atol=1e-4)
    assert np.allclose(float(logvar[0, 0, 0, 0]), np.log(var), atol=1e-4)


def test_q_posterior_reblur_t0_is_xstart(sched):
    x_tm1 = jax.random.normal(jax.random.PRNGKey(13), (1, 4, 4, 3))
    xt = jax.random.normal(jax.random.PRNGKey(14), x_tm1.shape)
    mean, _ = q_posterior(
        sched, x_tm1, x_tm1, xt, jnp.asarray([0]), s=1, reblurring=True
    )
    assert np.allclose(np.asarray(mean), np.asarray(x_tm1), atol=1e-6)


def test_p_sample_step_t0_no_noise(sched, tiny_model):
    """At t=0 the step must be deterministic (noise mask)."""
    x = jax.random.normal(jax.random.PRNGKey(15), (2, 12, 10, 3))
    out1, _, _ = p_sample_step(
        tiny_model, sched, x, jnp.asarray(0), jax.random.PRNGKey(16),
        s=0, reblurring=False,
    )
    out2, _, _ = p_sample_step(
        tiny_model, sched, x, jnp.asarray(0), jax.random.PRNGKey(999),
        s=0, reblurring=False,
    )
    assert np.allclose(np.asarray(out1), np.asarray(out2))


def test_sample_scale0_shapes_and_determinism(sched, tiny_model):
    key = jax.random.PRNGKey(17)
    x1, _, _ = sample_scale0(tiny_model, sched, (2, 12, 10, 3), key)
    x2, _, _ = sample_scale0(tiny_model, sched, (2, 12, 10, 3), key)
    assert x1.shape == (2, 12, 10, 3)
    assert np.allclose(np.asarray(x1), np.asarray(x2))
    assert np.isfinite(np.asarray(x1)).all()
    # outputs near the clamped range, not exploded
    assert np.abs(np.asarray(x1)).max() < 3.0


def test_sample_via_scale_runs(sched, tiny_model):
    img_prev = jnp.clip(
        jax.random.normal(jax.random.PRNGKey(18), (2, 12, 10, 3)), -1, 1
    )
    x, _, _ = sample_via_scale(
        tiny_model, sched, img_prev, jax.random.PRNGKey(19),
        s=1, total_t=20, reblurring=True,
    )
    assert x.shape == img_prev.shape
    assert np.isfinite(np.asarray(x)).all()


def test_sample_limited_t_stops_early(sched, tiny_model):
    """t_min>0 runs fewer steps; check it differs from a full chain."""
    key = jax.random.PRNGKey(20)
    full, _, _ = sample_scale0(tiny_model, sched, (1, 12, 10, 3), key, t_min=0)
    lim, _, _ = sample_scale0(tiny_model, sched, (1, 12, 10, 3), key, t_min=50)
    assert not np.allclose(np.asarray(full), np.asarray(lim))


def test_p_losses_values(sched, tiny_model):
    x = jnp.zeros((2, 12, 10, 3))
    t = jnp.asarray([5, 60])
    noise = jax.random.normal(jax.random.PRNGKey(21), x.shape)
    l1 = p_losses(tiny_model, sched, x, t, noise, s=0, loss_type="l1")
    l2 = p_losses(tiny_model, sched, x, t, noise, s=0, loss_type="l2")
    assert np.isfinite(float(l1)) and float(l1) > 0
    assert np.isfinite(float(l2)) and float(l2) > 0


def test_p_losses_gamma_mixing(sched, tiny_model):
    """At s>0 the noised input mixes blurry/orig by the unclamped gamma."""
    x_blur = jnp.ones((1, 12, 10, 3)) * 0.5
    x_orig = -jnp.ones((1, 12, 10, 3)) * 0.5
    t = jnp.asarray([99])  # gamma likely 1 at large t for loss=0.5 row... use row value
    noise = jnp.zeros((1, 12, 10, 3))
    # with zero noise: x_noisy = sqrt(abar_t) * x_mix; check via q_sample identity
    g = float(sched.gammas_row(2)[99])
    x_mix = g * 0.5 + (1 - g) * (-0.5)
    ac = float(sched.alphas_cumprod[99])
    # recompute what p_losses feeds the model by reproducing its mixing
    expected_pix = np.sqrt(ac) * x_mix
    # direct check of the mixing formula via a probe model that returns x
    probe = lambda xx, tt, ss: xx
    loss = p_losses(probe, sched, x_blur, t, noise, s=2, x_orig=x_orig,
                    loss_type="l1")
    # loss = |0 - x_noisy|.mean() = |expected_pix|
    assert np.allclose(float(loss), abs(expected_pix), atol=1e-5)


def test_training_loss_broadcast(sched, tiny_model):
    """[1,H,W,C] data broadcasts over the batch dimension."""
    x_orig = jnp.zeros((1, 12, 10, 3))
    x_blur = jnp.zeros((1, 12, 10, 3))
    loss = training_loss(
        tiny_model, sched, jax.random.PRNGKey(22), x_orig, x_blur,
        s=1, batch_size=4,
    )
    assert np.isfinite(float(loss))


def test_masked_loss_matches_unpadded(sched):
    """Masked loss on a padded canvas == loss on the unpadded tensor."""
    probe = lambda xx, tt, ss: xx * 0.0  # pred = 0 -> loss = mean |noise|
    h, w = 12, 10
    noise = jax.random.normal(jax.random.PRNGKey(23), (2, h, w, 3))
    x = jnp.zeros((2, h, w, 3))
    t = jnp.asarray([5, 50])
    ref = p_losses(probe, sched, x, t, noise, s=0, loss_type="l1")

    hp, wp = 20, 16
    xp = jnp.zeros((2, hp, wp, 3))
    noisep = jnp.zeros((2, hp, wp, 3)).at[:, :h, :w].set(noise)
    mask = jnp.zeros((hp, wp, 1)).at[:h, :w].set(1.0)
    padded = p_losses(
        probe, sched, xp, t, noisep, s=0, loss_type="l1", valid_mask=mask
    )
    assert np.allclose(float(ref), float(padded), atol=1e-6)


def test_collect_interm(sched, tiny_model):
    """collect_interm returns every intermediate state (save_interm parity)."""
    x, _, aux = sample_scale0(
        tiny_model, sched, (1, 12, 10, 3), jax.random.PRNGKey(30),
        t_min=90, collect_interm=True,
    )
    assert aux["interm"].shape == (10, 1, 12, 10, 3)
    # last collected frame == the returned output
    np.testing.assert_array_equal(np.asarray(aux["interm"][-1]), np.asarray(x))


def test_via_scale_total_t_zero(sched, tiny_model):
    """custom_t=0: forward-noise at t=0, empty reverse chain (i2i edge)."""
    img = jnp.clip(jax.random.normal(jax.random.PRNGKey(31), (1, 12, 10, 3)), -1, 1)
    x, carry, aux = sample_via_scale(
        tiny_model, sched, img, jax.random.PRNGKey(32),
        s=1, total_t=0, reblurring=True,
    )
    assert x.shape == img.shape
    assert aux is None
    # x = sqrt(abar_0) img + sqrt(1-abar_0) noise -> close to img
    ac0 = float(sched.alphas_cumprod[0])
    assert np.corrcoef(
        np.asarray(x).ravel(), np.asarray(img).ravel()
    )[0, 1] > 0.9
