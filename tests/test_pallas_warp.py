"""Pallas warp kernel == the gather/matmul warp (interpret mode on CPU).

Parity contract: ``ops/pallas_warp.bilinear_sample_pallas`` must equal
``ops/warp.bilinear_sample`` (the 4-tap gather oracle, itself parity-
tested against torch) in value and image-gradient, including
out-of-bounds taps, non-zero fill, and the vmap-over-views usage of the
guidance pipeline. On-device perf/parity: ``benchmarks/warp_variants_bench.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinddm_tpu.ops.pallas_warp import bilinear_sample_pallas
from sinddm_tpu.ops.warp import bilinear_sample


def _coords(key, hw, src_hw, spread=1.3):
    h, w = hw
    H, W = src_hw
    k1, k2 = jax.random.split(key)
    # cover in-bounds, boundary, and out-of-bounds sample points
    x = jax.random.uniform(k1, (h, w), minval=-0.2 * W, maxval=spread * W)
    y = jax.random.uniform(k2, (h, w), minval=-0.2 * H, maxval=spread * H)
    return jnp.stack([x, y], axis=-1)


@pytest.mark.parametrize("fill", [0.0, 0.5])
def test_pallas_warp_forward_matches_gather(fill):
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (19, 23, 3))
    coords = _coords(jax.random.PRNGKey(1), (17, 13), (19, 23))
    ref = bilinear_sample(img, coords, fill=fill)
    out = bilinear_sample_pallas(img, coords, fill, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_pallas_warp_grad_matches_gather():
    img = jax.random.uniform(jax.random.PRNGKey(2), (19, 23, 3))
    coords = _coords(jax.random.PRNGKey(3), (17, 13), (19, 23))
    tgt = jax.random.normal(jax.random.PRNGKey(4), (17, 13, 3))

    def loss_ref(im):
        return jnp.sum((bilinear_sample(im, coords, fill=0.3) - tgt) ** 2)

    def loss_pl(im):
        return jnp.sum((bilinear_sample_pallas(im, coords, 0.3, True) - tgt) ** 2)

    g_ref = jax.grad(loss_ref)(img)
    g_pl = jax.grad(loss_pl)(img)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=1e-4)


def test_pallas_warp_multi_tile_and_vmap():
    """> one 512-pixel tile per view, vmapped over views (guidance usage)."""
    img = jax.random.uniform(jax.random.PRNGKey(5), (21, 25, 3))
    keys = jax.random.split(jax.random.PRNGKey(6), 3)
    coords = jax.vmap(lambda k: _coords(k, (26, 30), (21, 25)))(keys)  # 780 px

    ref = jax.vmap(lambda c: bilinear_sample(img, c, fill=0.0))(coords)
    out = jax.vmap(lambda c: bilinear_sample_pallas(img, c, 0.0, True))(coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss_ref(im):
        return jnp.sum(jax.vmap(lambda c: bilinear_sample(im, c, fill=0.0))(coords) ** 2)

    def loss_pl(im):
        return jnp.sum(
            jax.vmap(lambda c: bilinear_sample_pallas(im, c, 0.0, True))(coords) ** 2
        )

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_pl)(img)),
        np.asarray(jax.grad(loss_ref)(img)),
        atol=1e-4,
    )


def test_extractor_pipeline_pallas_matches_mm():
    """Full augment pipeline (crop+affine+perspective homographies) with
    warp_impl='pallas' == the mm/gather path, value and image-grad."""
    from sinddm_tpu.guidance.clip_extractor import augment_views_subset

    img = jax.random.uniform(jax.random.PRNGKey(7), (23, 31, 3))
    n = 4
    keys = jax.random.split(jax.random.PRNGKey(8), 2 * n)
    kcs, kas = keys[:n], keys[n:]
    idxs = jnp.arange(n)

    def views(im, impl):
        return augment_views_subset(
            kcs, kas, idxs, im, fill=1.0,
            mm_adjoint=(impl is None), warp_impl=impl,
        )

    v_mm = views(img, None)
    v_pl = views(img, "pallas")
    np.testing.assert_allclose(np.asarray(v_pl), np.asarray(v_mm), atol=1e-5)

    g_mm = jax.grad(lambda im: jnp.sum(views(im, None) ** 2))(img)
    g_pl = jax.grad(lambda im: jnp.sum(views(im, "pallas") ** 2))(img)
    # rtol term: grads here are O(100), and the two paths differ in fp32
    # summation order only
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_mm), atol=1e-4, rtol=1e-5
    )
