"""SIFID / Frechet distance machinery."""

import numpy as np
import pytest

from sinddm_tpu.metrics import (
    conv_feature_extractor,
    frechet_distance,
    patch_feature_stats,
    sifid,
    sifid_batch,
)


def test_frechet_identity_is_zero():
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(500, 16))
    mu, sigma = patch_feature_stats(feats)
    assert frechet_distance(mu, sigma, mu, sigma) == pytest.approx(0.0, abs=1e-8)


def test_frechet_matches_closed_form_gaussians():
    """For diagonal Gaussians: ||dmu||^2 + sum (sqrt(v1)-sqrt(v2))^2."""
    mu1, mu2 = np.zeros(4), np.ones(4) * 2.0
    s1 = np.diag([1.0, 2.0, 3.0, 4.0])
    s2 = np.diag([4.0, 3.0, 2.0, 1.0])
    expected = 16.0 + np.sum((np.sqrt(np.diag(s1)) - np.sqrt(np.diag(s2))) ** 2)
    assert frechet_distance(mu1, s1, mu2, s2) == pytest.approx(expected, rel=1e-9)


def test_sifid_self_zero_and_ordering():
    rng = np.random.default_rng(1)
    real = rng.uniform(-1, 1, (48, 64, 3)).astype(np.float32)
    similar = np.clip(real + rng.normal(0, 0.05, real.shape), -1, 1).astype(np.float32)
    different = rng.uniform(-1, 1, (48, 64, 3)).astype(np.float32)
    fn = conv_feature_extractor(dim=32)
    d_self = sifid(real, real, fn)
    d_sim = sifid(real, similar, fn)
    d_diff = sifid(real, different, fn)
    assert d_self == pytest.approx(0.0, abs=1e-6)
    assert d_self < d_sim < d_diff


def test_sifid_batch_shape():
    rng = np.random.default_rng(2)
    real = rng.uniform(-1, 1, (24, 24, 3)).astype(np.float32)
    fakes = rng.uniform(-1, 1, (3, 24, 24, 3)).astype(np.float32)
    out = sifid_batch(real, fakes, conv_feature_extractor(dim=16))
    assert out.shape == (3,)
    assert (out > 0).all()


def test_sifid_proxy_rank_stability():
    """Independent random feature maps rank a graded corruption series
    identically — the measurable basis for the random-proxy claim in
    metrics.py (full sweep incl. tiny-CLIP features:
    benchmarks/sifid_correlation.py; real-CLIP upgrade:
    tests/test_real_clip.py)."""
    from scipy import stats

    rng = np.random.default_rng(3)
    real = np.tanh(
        np.cumsum(rng.normal(0, 0.3, (40, 40, 3)), axis=0)
    ).astype(np.float32)  # smooth-ish "natural" base
    series = [
        np.clip(real + s * rng.standard_normal(real.shape), -1, 1)
        for s in (0.05, 0.15, 0.3, 0.6, 1.0)
    ]
    f_a = conv_feature_extractor(dim=32, seed=0)
    f_b = conv_feature_extractor(dim=48, seed=7)
    sa = [sifid(real, x, f_a) for x in series]
    sb = [sifid(real, x, f_b) for x in series]
    assert sa == sorted(sa)  # monotone in corruption
    assert stats.spearmanr(sa, sb).statistic > 0.99
