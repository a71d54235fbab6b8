"""Schedule derivations vs independent closed-form numpy math."""

import numpy as np
import pytest

from sinddm_tpu.schedules import cosine_beta_schedule, make_schedules


def _hand_cosine(T=100, s=0.008):
    steps = T + 1
    x = np.linspace(0, steps, steps)
    ac = np.cos(((x / steps) + s) / (1 + s) * np.pi / 2) ** 2
    ac = ac / ac[0]
    return np.clip(1 - ac[1:] / ac[:-1], 0, 0.999)


def test_cosine_schedule_matches_hand_math():
    assert np.allclose(cosine_beta_schedule(100), _hand_cosine(), rtol=1e-12)


def test_ddpm_buffer_identities():
    sch = make_schedules(timesteps=100)
    betas = np.asarray(sch.betas, np.float64)
    ac = np.cumprod(1 - betas)
    assert np.allclose(np.asarray(sch.alphas_cumprod), ac, rtol=1e-5)
    assert np.allclose(
        np.asarray(sch.sqrt_one_minus_alphas_cumprod), np.sqrt(1 - ac), rtol=1e-5
    )
    acp = np.append(1.0, ac[:-1])
    pv = betas * (1 - acp) / (1 - ac)
    assert np.allclose(np.asarray(sch.posterior_variance), pv, rtol=1e-4)
    c1 = betas * np.sqrt(acp) / (1 - ac)
    c2 = (1 - acp) * np.sqrt(1 - betas) / (1 - ac)
    assert np.allclose(np.asarray(sch.posterior_mean_coef1), c1, rtol=1e-4)
    assert np.allclose(np.asarray(sch.posterior_mean_coef2), c2, rtol=1e-4)
    assert np.allclose(
        np.asarray(sch.sigma_t), np.sqrt(1 - ac) / np.sqrt(ac), rtol=1e-4
    )


def test_balloons_ideal_timesteps(balloons_schedules):
    # golden: derived from the reference formula on the balloons pyramid
    assert balloons_schedules.num_timesteps_ideal == (100, 52, 41, 31, 22)
    assert balloons_schedules.num_timesteps_trained == (100, 100, 100, 100, 100)


def test_gammas(balloons_pyramid, balloons_schedules):
    sch = balloons_schedules
    sigma = np.asarray(sch.sigma_t, np.float64)
    for i, loss in enumerate(balloons_pyramid.rescale_losses):
        expected = np.clip(sigma / loss, 0, 1)
        assert np.allclose(np.asarray(sch.gammas[i]), expected, rtol=1e-4)
    # sampling rows are clamped to 0.55 (reference models.py:314,358)
    row = np.asarray(sch.gammas_row_sampling(1))
    assert row.max() <= 0.55 + 1e-7


def test_train_full_t_false():
    sch = make_schedules(
        timesteps=100, scale_losses=[1.0, 0.5], n_scales=3, train_full_t=False
    )
    assert sch.num_timesteps_trained == sch.num_timesteps_ideal


def test_zero_gamma_row(balloons_schedules):
    z = balloons_schedules.zero_gamma_row(4)
    assert np.all(np.asarray(z.gammas[3]) == 0)
    assert np.all(np.asarray(z.gammas[0]) == np.asarray(balloons_schedules.gammas[0]))
