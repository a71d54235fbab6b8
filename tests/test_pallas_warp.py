"""Pallas warp kernels == the gather/matmul warp (interpret mode on CPU).

Parity contract: ``ops/pallas_warp.bilinear_sample_pallas`` and its
windowed variant ``bilinear_sample_pallas_win`` must equal
``ops/warp.bilinear_sample`` (the 4-tap gather oracle, itself parity-
tested against torch) in value and image-gradient, including
out-of-bounds taps, non-zero fill, the vmap-over-views usage of the
guidance pipeline, and — for the windowed kernel — tall sources whose
tiles overflow one 128-row window (the pl.when second-window branch).
On-device perf/parity: ``benchmarks/warp_variants_bench.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinddm_tpu.ops.pallas_warp import (
    bilinear_sample_pallas,
    bilinear_sample_pallas_win,
    bilinear_sample_pallas_winb,
    bilinear_sample_pallas_winx,
)
from sinddm_tpu.ops.warp import bilinear_sample

KERNELS = {
    "fused": bilinear_sample_pallas,
    "windowed": bilinear_sample_pallas_win,
    "windowed_t": bilinear_sample_pallas_winx,
    "windowed_b": bilinear_sample_pallas_winb,
}


def _coords(key, hw, src_hw, spread=1.3):
    h, w = hw
    H, W = src_hw
    k1, k2 = jax.random.split(key)
    # cover in-bounds, boundary, and out-of-bounds sample points
    x = jax.random.uniform(k1, (h, w), minval=-0.2 * W, maxval=spread * W)
    y = jax.random.uniform(k2, (h, w), minval=-0.2 * H, maxval=spread * H)
    return jnp.stack([x, y], axis=-1)


@pytest.mark.parametrize("kernel", list(KERNELS), ids=list(KERNELS))
@pytest.mark.parametrize("fill", [0.0, 0.5])
def test_pallas_warp_forward_matches_gather(fill, kernel):
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (19, 23, 3))
    coords = _coords(jax.random.PRNGKey(1), (17, 13), (19, 23))
    ref = bilinear_sample(img, coords, fill=fill)
    out = KERNELS[kernel](img, coords, fill, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("kernel", list(KERNELS), ids=list(KERNELS))
def test_pallas_warp_grad_matches_gather(kernel):
    img = jax.random.uniform(jax.random.PRNGKey(2), (19, 23, 3))
    coords = _coords(jax.random.PRNGKey(3), (17, 13), (19, 23))
    tgt = jax.random.normal(jax.random.PRNGKey(4), (17, 13, 3))

    def loss_ref(im):
        return jnp.sum((bilinear_sample(im, coords, fill=0.3) - tgt) ** 2)

    def loss_pl(im):
        return jnp.sum((KERNELS[kernel](im, coords, 0.3, True) - tgt) ** 2)

    g_ref = jax.grad(loss_ref)(img)
    g_pl = jax.grad(loss_pl)(img)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=1e-4)


@pytest.mark.parametrize("kernel", list(KERNELS), ids=list(KERNELS))
def test_pallas_warp_multi_tile_and_vmap(kernel):
    """> one 512-pixel tile per view, vmapped over views (guidance usage)."""
    fn = KERNELS[kernel]
    img = jax.random.uniform(jax.random.PRNGKey(5), (21, 25, 3))
    keys = jax.random.split(jax.random.PRNGKey(6), 3)
    coords = jax.vmap(lambda k: _coords(k, (26, 30), (21, 25)))(keys)  # 780 px

    ref = jax.vmap(lambda c: bilinear_sample(img, c, fill=0.0))(coords)
    out = jax.vmap(lambda c: fn(img, c, 0.0, True))(coords)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def loss_ref(im):
        return jnp.sum(jax.vmap(lambda c: bilinear_sample(im, c, fill=0.0))(coords) ** 2)

    def loss_pl(im):
        return jnp.sum(jax.vmap(lambda c: fn(im, c, 0.0, True))(coords) ** 2)

    np.testing.assert_allclose(
        np.asarray(jax.grad(loss_pl)(img)),
        np.asarray(jax.grad(loss_ref)(img)),
        atol=1e-4,
    )


def test_windowed_overflow_branch_tall_source():
    """Tall source (H=186 > one 128-row window) + wide-spread coords: most
    tiles straddle both windows, exercising the disjoint two-window split
    (rows [o, o+128) vs [128+, .)) in value and gradient."""
    img = jax.random.uniform(jax.random.PRNGKey(9), (186, 37, 3))
    coords = _coords(jax.random.PRNGKey(10), (40, 16), (186, 37))
    ref = bilinear_sample(img, coords, fill=0.25)
    out = bilinear_sample_pallas_win(img, coords, 0.25, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    tgt = jax.random.normal(jax.random.PRNGKey(11), (40, 16, 3))
    g_ref = jax.grad(
        lambda im: jnp.sum((bilinear_sample(im, coords, fill=0.25) - tgt) ** 2)
    )(img)
    g_pl = jax.grad(
        lambda im: jnp.sum(
            (bilinear_sample_pallas_win(im, coords, 0.25, True) - tgt) ** 2
        )
    )(img)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=1e-4)


def test_windowed_rotation_homography():
    """A 90-degree-like rotation maps an output x-run to a source y-run —
    the per-tile y-span exceeds any static window and both windows are
    needed for full coverage on tall sources (window 1 at o, window 2 at
    the bottom)."""
    H, W = 150, 40
    img = jax.random.uniform(jax.random.PRNGKey(12), (H, W, 3))
    ys, xs = jnp.meshgrid(
        jnp.arange(30, dtype=jnp.float32),
        jnp.arange(170, dtype=jnp.float32),
        indexing="ij",
    )
    # out (x, y) -> src (y_out * 0.9 + 2, x_out * 0.87 + 1): x-runs sweep
    # source rows
    coords = jnp.stack([ys * 0.9 + 2.0, xs * 0.87 + 1.0], axis=-1)
    ref = bilinear_sample(img, coords, fill=0.0)
    out = bilinear_sample_pallas_win(img, coords, 0.0, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_windowed_split3_close_to_exact():
    """bf16x3 variant: ~1e-5 relative — looser bars than the exact kernels
    (value atol 3e-4 on O(1) pixels, grad atol 2e-3 on O(30) grads)."""
    from sinddm_tpu.ops.pallas_warp import bilinear_sample_pallas_win3

    img = jax.random.uniform(jax.random.PRNGKey(13), (186, 37, 3))
    coords = _coords(jax.random.PRNGKey(14), (40, 16), (186, 37))
    ref = bilinear_sample(img, coords, fill=0.25)
    out = bilinear_sample_pallas_win3(img, coords, 0.25, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-4)

    tgt = jax.random.normal(jax.random.PRNGKey(15), (40, 16, 3))
    g_ref = jax.grad(
        lambda im: jnp.sum((bilinear_sample(im, coords, fill=0.25) - tgt) ** 2)
    )(img)
    g_pl = jax.grad(
        lambda im: jnp.sum(
            (bilinear_sample_pallas_win3(im, coords, 0.25, True) - tgt) ** 2
        )
    )(img)
    np.testing.assert_allclose(np.asarray(g_pl), np.asarray(g_ref), atol=2e-3)


def test_windowed_rejects_too_tall():
    img = jnp.zeros((300, 16, 3))
    coords = jnp.zeros((8, 8, 2))
    with pytest.raises(ValueError, match="overflow window"):
        bilinear_sample_pallas_win(img, coords, 0.0, True)


@pytest.mark.parametrize("impl", ["pallas", "pallas_win"])
def test_extractor_pipeline_pallas_matches_mm(impl):
    """Full augment pipeline (crop+affine+perspective homographies) with
    warp_impl='pallas'/'pallas_win' == the mm/gather path, value and
    image-grad."""
    from sinddm_tpu.guidance.clip_extractor import augment_views_subset

    img = jax.random.uniform(jax.random.PRNGKey(7), (23, 31, 3))
    n = 4
    keys = jax.random.split(jax.random.PRNGKey(8), 2 * n)
    kcs, kas = keys[:n], keys[n:]
    idxs = jnp.arange(n)

    def views(im, i):
        return augment_views_subset(
            kcs, kas, idxs, im, fill=1.0,
            mm_adjoint=(i is None), warp_impl=i,
        )

    v_mm = views(img, None)
    v_pl = views(img, impl)
    np.testing.assert_allclose(np.asarray(v_pl), np.asarray(v_mm), atol=1e-5)

    g_mm = jax.grad(lambda im: jnp.sum(views(im, None) ** 2))(img)
    g_pl = jax.grad(lambda im: jnp.sum(views(im, impl) ** 2))(img)
    # rtol term: grads here are O(100), and the two paths differ in fp32
    # summation order only
    np.testing.assert_allclose(
        np.asarray(g_pl), np.asarray(g_mm), atol=1e-4, rtol=1e-5
    )
