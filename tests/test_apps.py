"""Application layer: pyramid sampling driver, i2i, ROI guidance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinddm_tpu.apps.sampling import sample_scales, via_scale_size
from sinddm_tpu.guidance.roi import make_roi_guidance, rescale_bb
from sinddm_tpu.models import SinDDMNet
from sinddm_tpu.schedules import make_schedules


@pytest.fixture(scope="module")
def app_setup(tiny_pyramid):
    sched = make_schedules(
        timesteps=20,  # short chains -> fast CPU compiles
        scale_losses=tiny_pyramid.rescale_losses,
        n_scales=tiny_pyramid.n_scales,
    )
    model = SinDDMNet(dim=8)
    key = jax.random.PRNGKey(0)
    h0, w0 = tiny_pyramid.sizes_hw[0]
    params = model.init(
        key, jnp.zeros((1, h0, w0, 3)), jnp.zeros((1,), jnp.int32),
        jnp.asarray(0.0),
    )["params"]
    return model, params, sched, tiny_pyramid


def test_via_scale_size_logic():
    sizes = [(10, 12), (14, 17), (20, 24)]
    # plain: size of s
    assert via_scale_size(sizes, s=1, n_scales=3, scale_factor=1.4) == (14, 17)
    # custom idx within pyramid
    assert via_scale_size(
        sizes, s=1, n_scales=3, scale_factor=1.4, custom_sample=True,
        custom_img_size_idx=2,
    ) == (20, 24)
    # extrapolation past the pyramid (reference models.py:555-558)
    assert via_scale_size(
        sizes, s=2, n_scales=3, scale_factor=1.5, custom_sample=True,
        custom_img_size_idx=3,
    ) == (30, 36)
    # scale_mul
    assert via_scale_size(
        sizes, s=0, n_scales=3, scale_factor=1.4, scale_mul=(2.0, 1.5)
    ) == (20, 18)
    # forced size wins
    assert via_scale_size(
        sizes, s=0, n_scales=3, scale_factor=1.4, custom_image_size=(7, 9)
    ) == (7, 9)


def test_sample_scales_shapes(app_setup):
    model, params, sched, pyr = app_setup
    outs = sample_scales(
        model, params, sched, pyr.sizes_hw, jax.random.PRNGKey(1),
        scale_factor=pyr.scale_factor, n_scales=pyr.n_scales, batch_size=2,
        custom_sample=True,
    )
    assert len(outs) == pyr.n_scales
    for s, out in enumerate(outs):
        h, w = pyr.sizes_hw[s]
        assert out.shape == (2, h, w, 3)
        assert np.isfinite(np.asarray(out)).all()


def test_sample_scales_scale_mul(app_setup):
    model, params, sched, pyr = app_setup
    outs = sample_scales(
        model, params, sched, pyr.sizes_hw, jax.random.PRNGKey(2),
        scale_factor=pyr.scale_factor, n_scales=pyr.n_scales, batch_size=1,
        scale_mul=(2.0, 1.0), custom_sample=True,
    )
    for s, out in enumerate(outs):
        h, w = pyr.sizes_hw[s]
        assert out.shape == (1, int(h * 2.0), w, 3)


def test_sample_scales_start_image(app_setup):
    """start_noise=False injects an image at the first run scale
    (clip_style_trans path, reference trainer.py:384-399)."""
    model, params, sched, pyr = app_setup
    n = pyr.n_scales
    start = pyr.images[n - 2]
    outs = sample_scales(
        model, params, sched, pyr.sizes_hw, jax.random.PRNGKey(3),
        scale_factor=pyr.scale_factor, n_scales=n, batch_size=2,
        custom_scales=[n - 2, n - 1], custom_image_size_idxs=[n - 2, n - 1],
        custom_sample=True, start_noise=False, start_image=start,
        custom_t_list=[3] * (n - 1),
    )
    assert len(outs) == 2
    assert outs[0].shape == (2,) + start.shape
    h, w = pyr.sizes_hw[n - 1]
    assert outs[1].shape == (2, h, w, 3)


def test_roi_guidance_paste(app_setup):
    model, params, sched, pyr = app_setup
    n = pyr.n_scales
    target_bb = [2, 2, 12, 12]
    roi_bbs = [[0, 0, 12, 12]]
    fn = make_roi_guidance(
        pyr.images, target_bb, roi_bbs,
        scale_factor=pyr.scale_factor, n_scales=n, s=0,
    )
    assert fn is not None
    # finest scale gets no hook (reference models.py:430)
    assert make_roi_guidance(
        pyr.images, target_bb, roi_bbs,
        scale_factor=pyr.scale_factor, n_scales=n, s=n - 1,
    ) is None

    h0, w0 = pyr.sizes_hw[0]
    x = jnp.zeros((1, h0, w0, 3))
    out, _, _ = fn(x, x, jnp.asarray(5), 0, jax.random.PRNGKey(0), None)
    bb0 = rescale_bb(roi_bbs[0], pyr.scale_factor, n, 0)
    y, xx, hh, ww = bb0
    # pasted region = 0.8 * patch + 0.2 * 0
    assert float(jnp.abs(out[:, y : y + hh, xx : xx + ww]).max()) > 0
    # outside region untouched
    outside = np.asarray(out).copy()
    outside[:, y : y + hh, xx : xx + ww] = 0
    assert np.abs(outside).max() == 0


def test_image2image_harmonization(app_setup):
    from sinddm_tpu.apps.i2i import image2image

    model, params, sched, pyr = app_setup
    rng = np.random.default_rng(0)
    inp = rng.uniform(-1, 1, pyr.images[-1].shape).astype(np.float32)
    mask = np.zeros(pyr.images[-1].shape, np.float32)
    mask[10:30, 10:30] = 1.0
    final, outs = image2image(
        model, params, sched, pyr, inp, jax.random.PRNGKey(4),
        mode="harmonization", mask_img=mask, batch_size=2,
        custom_t=[0] * (pyr.n_scales - 1) + [5],
    )
    assert final.shape == (2,) + pyr.images[-1].shape
    f = np.asarray(final)
    assert f.min() >= 0.0 and f.max() <= 1.0
    # far from the mask the output equals the input (composite identity)
    input01 = np.clip((inp + 1) * 0.5, 0, 1)
    corner = f[0, -5:, -5:, :]
    np.testing.assert_allclose(corner, input01[-5:, -5:, :], atol=1e-3)


def test_image2image_style_transfer(app_setup):
    from sinddm_tpu.apps.i2i import image2image

    model, params, sched, pyr = app_setup
    rng = np.random.default_rng(1)
    inp = rng.uniform(-1, 1, (40, 50, 3)).astype(np.float32)
    final, outs = image2image(
        model, params, sched, pyr, inp, jax.random.PRNGKey(5),
        mode="style_transfer", batch_size=1,
        custom_t=[0] * (pyr.n_scales - 1) + [5],
    )
    assert final.shape == (1, 40, 50, 3)
    assert np.isfinite(np.asarray(final)).all()


def test_precompile_matches_sequential(app_setup):
    """precompile=True (concurrent warm-up) must not change results."""
    model, params, sched, pyr = app_setup
    kwargs = dict(
        scale_factor=pyr.scale_factor, n_scales=pyr.n_scales, batch_size=2,
        custom_sample=True, custom_t_list=[3] * (pyr.n_scales - 1),
    )
    ref = sample_scales(
        model, params, sched, pyr.sizes_hw, jax.random.PRNGKey(5), **kwargs
    )
    got = sample_scales(
        model, params, sched, pyr.sizes_hw, jax.random.PRNGKey(5),
        precompile=True, **kwargs,
    )
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_precompile_guided_matches_sequential(app_setup):
    from sinddm_tpu.apps.clip_apps import clip_sampling
    from sinddm_tpu.guidance.clip_extractor import ClipExtractor
    from sinddm_tpu.models.clip.convert import random_clip_params
    from sinddm_tpu.models.clip.model import tiny_clip_config

    model, params, sched, pyr = app_setup
    clip_model, clip_vars = random_clip_params(tiny_clip_config(), seed=0)
    extractor = ClipExtractor(clip_model, clip_vars, n_aug=2)
    kwargs = dict(
        text_input="x", strength=0.2, sample_batch_size=2,
        custom_t_list=[3] * (pyr.n_scales - 1),
        guidance_sub_iters=[0] + [1] * (pyr.n_scales - 1), quantile=0.5,
        llambda=0.1,
    )
    ref, _ = clip_sampling(
        model, params, sched, pyr, extractor, jax.random.PRNGKey(6), **kwargs
    )
    got, _ = clip_sampling(
        model, params, sched, pyr, extractor, jax.random.PRNGKey(6),
        precompile=True, **kwargs,
    )
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
