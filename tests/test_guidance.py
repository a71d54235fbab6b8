"""Guidance stack: augmentation views, thresholded gradients, CLIP hooks."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinddm_tpu.guidance.clip_extractor import (
    ClipExtractor,
    augment_views,
    get_augmentations_template,
    resize_output_size,
)
from sinddm_tpu.guidance.clip_guidance import (
    init_clip_carry,
    make_clip_guidance,
    resize_guidance_carry,
    thresholded_grad,
)
from sinddm_tpu.models.clip.model import tiny_clip_config


@pytest.fixture(scope="module")
def tiny_extractor():
    from sinddm_tpu.models.clip.convert import random_clip_params

    model, variables = random_clip_params(tiny_clip_config(), seed=0)
    return ClipExtractor(model, variables, n_aug=4)


def test_resize_output_size_torchvision_semantics():
    # short side -> 224 when long side stays under the cap
    assert resize_output_size(100, 100) == (224, 224)
    # long side capped at 320
    h, w = resize_output_size(100, 300)
    assert w == 320 and h == int(320 * 100 / 300)
    # portrait orientation
    h, w = resize_output_size(300, 100)
    assert h == 320 and w == int(320 * 100 / 300)


def test_augment_views_shapes_and_range():
    img = jnp.clip(jax.random.uniform(jax.random.PRNGKey(0), (40, 60, 3)), 0, 1)
    views = augment_views(jax.random.PRNGKey(1), img, n_aug=4)
    ch, cw = resize_output_size(40, 60)
    assert views.shape == (4, ch, cw, 3)
    v = np.asarray(views)
    assert v.min() >= 0.0 and v.max() <= 1.0
    # stochastic: views differ from each other
    assert not np.allclose(v[0], v[1])


def test_augment_views_differentiable():
    img = jnp.clip(jax.random.uniform(jax.random.PRNGKey(2), (24, 24, 3)), 0.2, 0.8)

    def f(x):
        return jnp.sum(augment_views(jax.random.PRNGKey(3), x, n_aug=2) ** 2)

    g = jax.grad(f)(img)
    assert g.shape == img.shape
    assert float(jnp.abs(g).max()) > 0
    assert np.isfinite(np.asarray(g)).all()


def test_mm_adjoint_matches_autodiff_scatter():
    """bilinear_sample_mm's matmul image-adjoint == autodiff's scatter.

    Random homographies (incl. strong perspective pushing taps out of
    bounds and a non-zero fill) through the full augment pipeline: the
    gradient w.r.t. the image must agree with the plain autodiff path to
    fp32 tolerance. The mm path is the guided-mode default — it removes
    the sort-based scatter that was 84% of a guided step on the TPU
    (benchmarks/guided_cost_breakdown.json)."""
    img = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(4), (30, 44, 3)), 0.0, 1.0
    )
    ch, cw = resize_output_size(30, 44)
    ct = jax.random.normal(jax.random.PRNGKey(5), (4, ch, cw, 3))

    def f(x, mm):
        views = augment_views(
            jax.random.PRNGKey(6), x, n_aug=4, fill=0.7, mm_adjoint=mm
        )
        return jnp.sum(views * ct)

    v_ref, g_ref = jax.value_and_grad(lambda x: f(x, False))(img)
    v_mm, g_mm = jax.value_and_grad(lambda x: f(x, True))(img)
    # forward is the same 4-tap math via matmuls; the hat-function tap
    # weights (ops/warp._soft_onehots) differ from the gather path's
    # floor/frac weights by at most 1 ulp (1-(r-y) vs y-floor(y)), so the
    # ~66k-term sum agrees to ~1e-6 relative, not bitwise
    np.testing.assert_allclose(float(v_mm), float(v_ref), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g_mm), np.asarray(g_ref), rtol=1e-5, atol=1e-5
    )


def test_mm_adjoint_raw_warp_oob_and_fill():
    """Direct warp_homography check with taps far out of bounds."""
    from sinddm_tpu.ops.warp import warp_homography

    img = jax.random.uniform(jax.random.PRNGKey(7), (17, 23, 3))
    # scale + shift pushing much of the output frame outside the image
    m = jnp.asarray(
        [[0.9, 0.15, -6.0], [-0.1, 1.4, 3.0], [1e-3, -2e-3, 1.0]]
    )
    ct = jax.random.normal(jax.random.PRNGKey(8), (20, 28, 3))

    def f(x, mm):
        return jnp.sum(
            warp_homography(x, m, (20, 28), fill=0.3, mm_adjoint=mm) * ct
        )

    g_ref = jax.grad(lambda x: f(x, False))(img)
    g_mm = jax.grad(lambda x: f(x, True))(img)
    np.testing.assert_allclose(
        np.asarray(g_mm), np.asarray(g_ref), rtol=1e-5, atol=1e-6
    )
    # per-pixel forward equality (matmul forward vs gather forward),
    # including the constant-fill region outside the image bounds
    out_ref = warp_homography(img, m, (20, 28), fill=0.3, mm_adjoint=False)
    out_mm = warp_homography(img, m, (20, 28), fill=0.3, mm_adjoint=True)
    np.testing.assert_allclose(
        np.asarray(out_mm), np.asarray(out_ref), rtol=1e-6, atol=1e-6
    )


def test_mm_adjoint_extractor_loss_grad_matches(tiny_extractor):
    """End-to-end guidance-loss gradients agree across adjoint paths."""
    x01 = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(9), (2, 26, 34, 3)), 0, 1
    )
    key = jax.random.PRNGKey(10)
    text = jax.random.normal(
        jax.random.PRNGKey(11), (5, tiny_extractor.model.cfg.embed_dim)
    )

    grads = {}
    for mm in (False, True):
        ex = ClipExtractor(
            tiny_extractor.model, tiny_extractor.variables,
            n_aug=4, mm_adjoint=mm,
        )
        grads[mm] = jax.grad(
            lambda x: ex.calculate_clip_loss(x, text, key)
        )(x01)
    np.testing.assert_allclose(
        np.asarray(grads[True]), np.asarray(grads[False]),
        rtol=1e-4, atol=1e-5,
    )


def test_save_views_remat_policy_grad_matches(tiny_extractor):
    """The named-residual remat policy (save 'warp_out'/'clip_views' so the
    backward replay skips the warp stage) is a scheduling change only —
    loss value and gradient must match the plain full-remat path."""
    x01 = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(19), (2, 26, 34, 3)), 0, 1
    )
    key = jax.random.PRNGKey(20)
    text = jax.random.normal(
        jax.random.PRNGKey(21), (5, tiny_extractor.model.cfg.embed_dim)
    )

    vals, grads = {}, {}
    for sv in (False, True):
        ex = ClipExtractor(
            tiny_extractor.model, tiny_extractor.variables,
            n_aug=4, view_chunk=2, save_views=sv,
        )
        vals[sv], grads[sv] = jax.value_and_grad(
            lambda x: ex.calculate_clip_loss(x, text, key)
        )(x01)
    np.testing.assert_allclose(float(vals[True]), float(vals[False]),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grads[True]), np.asarray(grads[False]),
        rtol=1e-5, atol=1e-6,
    )


def test_save_dots_remat_policy_grad_matches(tiny_extractor):
    """save_dots (keep every dot_general output as a remat residual so the
    tower replay is elementwise-only) is also a scheduling change only —
    loss value and gradient must match the default named-residual path."""
    x01 = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(29), (2, 26, 34, 3)), 0, 1
    )
    key = jax.random.PRNGKey(30)
    text = jax.random.normal(
        jax.random.PRNGKey(31), (5, tiny_extractor.model.cfg.embed_dim)
    )

    vals, grads = {}, {}
    for sd in (False, True):
        ex = ClipExtractor(
            tiny_extractor.model, tiny_extractor.variables,
            n_aug=4, view_chunk=2, save_dots=sd,
        )
        vals[sd], grads[sd] = jax.value_and_grad(
            lambda x: ex.calculate_clip_loss(x, text, key)
        )(x01)
    np.testing.assert_allclose(float(vals[True]), float(vals[False]),
                               rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grads[True]), np.asarray(grads[False]),
        rtol=1e-5, atol=1e-6,
    )


def test_thresholded_grad_quantile_semantics():
    rng = np.random.default_rng(0)
    grad = rng.normal(size=(2, 8, 8, 3)).astype(np.float32)
    sparse, mask = thresholded_grad(jnp.asarray(grad), quantile=0.75)
    sparse, mask = np.asarray(sparse), np.asarray(mask)
    energy = np.linalg.norm(grad, axis=-1)
    for b in range(2):
        q = np.quantile(energy[b].reshape(-1), 0.75, method="nearest")
        expected_mask = energy[b] > q
        np.testing.assert_array_equal(mask[b, :, :, 0], expected_mask)
        # sparse grad = relu(energy - q) * unit grad
        expected = np.clip(energy[b] - q, 0, None)[..., None] * (
            grad[b] / energy[b][..., None]
        )
        np.testing.assert_allclose(sparse[b], expected, atol=1e-5)
    # quantile 0: (almost) everything passes
    _, mask0 = thresholded_grad(jnp.asarray(grad), quantile=0.0)
    assert np.asarray(mask0).mean() > 0.9


def test_clip_guidance_hook_creates_mask(tiny_extractor):
    embeds = tiny_extractor.get_text_embedding(
        "a tree", get_augmentations_template("hr")
    )
    fn = make_clip_guidance(
        tiny_extractor, embeds, s=1, n_scales=3, sub_iters=1,
        strength=0.3, quantile=0.8, llambda=0.2, stop_guidance=3,
    )
    carry = init_clip_carry(1, (24, 24))
    # non-zero image: the update is norm-matched (||x*m||/||g*m||), so a
    # zero image would correctly produce a zero update
    x = 0.3 * jnp.ones((1, 24, 24, 3))
    out, carry2, aux = fn(x, x, jnp.asarray(5), 1, jax.random.PRNGKey(0), carry)
    assert out.shape == x.shape
    assert bool(carry2.has_mask)
    assert float(carry2.mask.sum()) > 0
    # ~20% of pixels editable at quantile 0.8
    frac = float(carry2.mask.mean())
    assert 0.05 < frac < 0.35
    assert "clip_score" in aux
    # the guided estimate changed inside the mask
    assert not np.allclose(np.asarray(out), np.asarray(x))


def test_clip_guidance_stop_gate(tiny_extractor):
    """At the finest scale, steps below stop_guidance are untouched."""
    embeds = tiny_extractor.get_text_embedding(
        "a tree", get_augmentations_template("hr")
    )
    fn = make_clip_guidance(
        tiny_extractor, embeds, s=2, n_scales=3, sub_iters=1,
        strength=0.3, quantile=0.0, llambda=0.0, stop_guidance=3,
    )
    carry = init_clip_carry(1, (24, 24))
    x = 0.1 * jnp.ones((1, 24, 24, 3))
    out_gated, carry_g, _ = fn(x, x, jnp.asarray(2), 2, jax.random.PRNGKey(0), carry)
    np.testing.assert_array_equal(np.asarray(out_gated), np.asarray(x))
    assert not bool(carry_g.has_mask)
    out_active, _, _ = fn(x, x, jnp.asarray(3), 2, jax.random.PRNGKey(0), carry)
    assert not np.allclose(np.asarray(out_active), np.asarray(x))


def test_resize_guidance_carry():
    carry = init_clip_carry(2, (10, 12))
    carry = carry._replace(
        mask=jnp.ones_like(carry.mask), has_mask=jnp.asarray(True)
    )
    out = resize_guidance_carry(carry, (20, 24))
    assert out.mask.shape == (2, 20, 24, 1)
    assert out.x_recon_prev.shape == (2, 20, 24, 3)
    assert bool(out.has_mask)
    dropped = resize_guidance_carry(carry, (20, 24), drop_mask=True)
    assert not bool(dropped.has_mask)
    assert float(dropped.mask.sum()) == 0.0


def test_clip_loss_and_grad(tiny_extractor):
    embeds = tiny_extractor.get_text_embedding(
        "a fire", get_augmentations_template("lr")
    )
    assert embeds.shape == (len(get_augmentations_template("lr")), 32)
    x01 = jnp.clip(jax.random.uniform(jax.random.PRNGKey(1), (2, 32, 32, 3)), 0, 1)
    loss = tiny_extractor.calculate_clip_loss(x01, embeds, jax.random.PRNGKey(2))
    assert np.isfinite(float(loss))
    g = jax.grad(
        lambda x: tiny_extractor.calculate_clip_loss(x, embeds, jax.random.PRNGKey(2))
    )(x01)
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).max()) > 0


def test_clip_sampling_end_to_end(tiny_extractor, tiny_pyramid):
    """Full guided pyramid run with a tiny CLIP + tiny denoiser."""
    from sinddm_tpu.apps.clip_apps import clip_sampling
    from sinddm_tpu.models import SinDDMNet
    from sinddm_tpu.schedules import make_schedules

    pyr = tiny_pyramid
    sched = make_schedules(
        timesteps=10, scale_losses=pyr.rescale_losses, n_scales=pyr.n_scales
    )
    model = SinDDMNet(dim=8)
    h0, w0 = pyr.sizes_hw[0]
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h0, w0, 3)),
        jnp.zeros((1,), jnp.int32), jnp.asarray(0.0),
    )["params"]

    outputs, aux = clip_sampling(
        model, params, sched, pyr, tiny_extractor, jax.random.PRNGKey(1),
        text_input="a forest", strength=0.3, sample_batch_size=1,
        custom_t_list=[2] * (pyr.n_scales - 1),
        guidance_sub_iters=[0] + [1] * (pyr.n_scales - 1),
        quantile=0.8, stop_guidance=1, llambda=0.2, reblurring=False,
    )
    assert len(outputs) == pyr.n_scales
    for s, out in enumerate(outputs):
        assert out.shape == (1,) + pyr.sizes_hw[s] + (3,)
        assert np.isfinite(np.asarray(out)).all()
    scores = [a for a in aux if isinstance(a, dict) and "clip_score" in a]
    assert scores, "guided scales must emit clip scores"


def test_clip_roi_sampling_end_to_end(tiny_extractor, tiny_pyramid):
    from sinddm_tpu.apps.clip_apps import clip_roi_sampling
    from sinddm_tpu.models import SinDDMNet
    from sinddm_tpu.schedules import make_schedules

    pyr = tiny_pyramid
    sched = make_schedules(
        timesteps=10, scale_losses=pyr.rescale_losses, n_scales=pyr.n_scales
    )
    model = SinDDMNet(dim=8)
    h, w = pyr.sizes_hw[-1]
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h, w, 3)),
        jnp.zeros((1,), jnp.int32), jnp.asarray(0.0),
    )["params"]
    final, scores, interm = clip_roi_sampling(
        model, params, sched, pyr, tiny_extractor, jax.random.PRNGKey(2),
        text_input="a fire", sample_batch_size=1, num_clip_iters=3,
        num_denoising_steps=2, clip_roi_bb=(4, 4, 16, 16),
        collect_interm=True,
    )
    assert final.shape == (1, h, w, 3)
    assert scores.shape == (3,)
    assert np.isfinite(np.asarray(final)).all()
    # save_interm plumbing: per-iter ascent patches + denoise frames
    # (reference trainer.py:427-434, models.py:540-546)
    assert interm["ascent"].shape == (3, 1, 16, 16, 3)
    assert interm["denoise"].shape == (2, 1, h, w, 3)
    assert np.isfinite(np.asarray(interm["ascent"])).all()
