"""Host-side image ops: morphology, histogram matching, resize parity."""

import numpy as np
import pytest

from sinddm_tpu.ops.image import dilate_mask, disk, match_histograms
from sinddm_tpu.ops.resize import resize_bilinear, resize_nearest


def test_disk_element():
    d = disk(2)
    assert d.shape == (5, 5)
    assert d[2, 2] and d[0, 2] and d[2, 0]
    assert not d[0, 0]  # corner outside radius
    assert d.sum() == 13


def test_dilate_mask_grows_and_normalizes():
    m = np.zeros((40, 40, 3), np.float32)
    m[18:22, 18:22] = 1.0
    out = dilate_mask(m, mode="harmonization")
    assert out.shape == (40, 40, 1)
    assert out.min() == 0.0 and out.max() == 1.0
    # dilation + blur spreads well beyond the original 4x4 square
    assert out[10, 20, 0] > 0.1
    assert out[20, 20, 0] > 0.9


def test_match_histograms_aligns_quantiles():
    rng = np.random.default_rng(0)
    src = rng.normal(100, 10, (32, 32, 3)).clip(0, 255).astype(np.uint8)
    ref = rng.normal(180, 30, (40, 40, 3)).clip(0, 255).astype(np.uint8)
    out = match_histograms(src, ref)
    for c in range(3):
        assert abs(float(np.median(out[..., c])) - float(np.median(ref[..., c]))) < 6
    # perfect self-match is identity
    self_out = match_histograms(src, src)
    assert np.array_equal(self_out, src)


def test_resize_bilinear_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 13, 17, 3)).astype(np.float32)
    out = np.asarray(resize_bilinear(x, (29, 31)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    expected = (
        F.interpolate(xt, size=(29, 31), mode="bilinear")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(out, expected, atol=2e-5)
    # downsampling path too (torch bilinear has no antialias by default)
    out = np.asarray(resize_bilinear(x, (7, 9)))
    expected = (
        F.interpolate(xt, size=(7, 9), mode="bilinear").permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_allclose(out, expected, atol=2e-5)


def test_resize_nearest_matches_torch():
    torch = pytest.importorskip("torch")
    import torch.nn.functional as F

    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 10, 12, 3)).astype(np.float32)
    out = np.asarray(resize_nearest(x, (23, 7)))
    xt = torch.from_numpy(x).permute(0, 3, 1, 2)
    expected = (
        F.interpolate(xt, size=(23, 7), mode="nearest").permute(0, 2, 3, 1).numpy()
    )
    np.testing.assert_array_equal(out, expected)


def test_augment_extra_shapes():
    import jax
    import jax.numpy as jnp

    from sinddm_tpu.ops.augment_extra import (
        borderless_random_perspective,
        divisible_crop,
        random_scale,
        random_size_crop,
        to_tensor_safe,
    )

    img = jnp.clip(jax.random.uniform(jax.random.PRNGKey(0), (37, 45, 3)), 0, 1)
    assert random_scale(jax.random.PRNGKey(1), img, (32, 40)).shape == (32, 40, 3)
    assert random_size_crop(jax.random.PRNGKey(2), img, (24, 24)).shape == (24, 24, 3)
    assert divisible_crop(img, 8).shape == (32, 40, 3)
    assert to_tensor_safe(np.full((5, 6), 255, np.uint8)).shape == (5, 6, 1)
    assert float(to_tensor_safe(np.full((5, 6), 255, np.uint8)).max()) == 1.0
    out = borderless_random_perspective(jax.random.PRNGKey(3), img)
    assert out.shape == img.shape
    assert np.isfinite(np.asarray(out)).all()
