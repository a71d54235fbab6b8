"""Shape-bucketed guided sampling: ONE compiled graph for every scale.

Motivation (VERDICT r2 / RESULTS.md): each guided pyramid scale is its own
XLA program — with a real ViT-B/32 in the loop, 4 via-scale compiles
dominate guided cold-start on this backend's remote compile service. The
reference has no analog (its Python loop pays per-step launches instead,
``SinDDM/trainer.py:226-285``).

Design: all via scales run on ONE padded canvas (the finest scale's
shape). Everything per-scale becomes a *traced value* instead of a static
shape:

* the scale index feeds the denoiser embedding as a traced float and
  gathers its gamma row dynamically (``p_sample_step(gammas_row=...,
  s_value=...)``),
* the previous scale's output is resized valid-region -> valid-region by
  a dynamic half-pixel bilinear gather over the static canvas
  (:func:`dynamic_resize_into_canvas`, torch-interpolate semantics),
* the reverse chain scans a STATIC ``max_t`` steps; steps with
  ``t >= total_t`` are skipped by ``lax.cond`` (the skipped branch costs
  nothing at runtime — XLA executes one branch),
* the denoiser runs in its validity-mask mode (padded compute bit-equal
  to unpadded, ``models/denoiser.py``),
* CLIP views warp only the valid region (dynamic crop homographies with a
  static view frame) and the thresholded-grad quantile is computed over
  valid pixels (``thresholded_grad(valid_mask=...)``).

Semantics vs the per-scale sampler: the stochastic process is identical;
the RNG *stream* differs (draws are canvas-shaped) and the CLIP view
frame is fixed to the canvas aspect instead of per-scale (the pyramid
preserves aspect, so the frames differ by <1%). When the canvas equals
the scale's own shape the outputs match the per-scale graph exactly
(tested).
"""

from __future__ import annotations

import functools
from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp

from sinddm_tpu.diffusion.core import p_sample_step, q_sample
from sinddm_tpu.schedules import GAMMA_SAMPLING_CLAMP, Schedules


def valid_mask_2d(canvas_hw: Tuple[int, int], valid_hw) -> jnp.ndarray:
    """[H, W] bool mask of the top-left valid region (valid_hw traced)."""
    h, w = canvas_hw
    ys = jnp.arange(h)[:, None] < valid_hw[0]
    xs = jnp.arange(w)[None, :] < valid_hw[1]
    return jnp.logical_and(ys, xs)


def dynamic_resize_into_canvas(
    x: jnp.ndarray, src_hw, dst_hw
) -> jnp.ndarray:
    """Bilinear-resize the top-left ``src_hw`` region of a padded canvas
    [B, H, W, C] to the top-left ``dst_hw`` region (zeros elsewhere).

    Half-pixel centers, no antialias — the same sampling as
    ``ops.resize.resize_bilinear`` / torch ``interpolate(bilinear)``, but
    with *traced* sizes over a static canvas.
    """
    B, H, W, C = x.shape
    sh = src_hw[0].astype(jnp.float32)
    sw = src_hw[1].astype(jnp.float32)
    dh = dst_hw[0].astype(jnp.float32)
    dw = dst_hw[1].astype(jnp.float32)

    yo = jnp.arange(H, dtype=jnp.float32)
    xo = jnp.arange(W, dtype=jnp.float32)
    ysrc = (yo + 0.5) * (sh / dh) - 0.5
    xsrc = (xo + 0.5) * (sw / dw) - 0.5
    # clamp into the valid source region (torch clamps edge samples)
    ysrc = jnp.clip(ysrc, 0.0, sh - 1.0)
    xsrc = jnp.clip(xsrc, 0.0, sw - 1.0)

    y0 = jnp.floor(ysrc)
    x0 = jnp.floor(xsrc)
    wy = (ysrc - y0)[None, :, None, None]
    wx = (xsrc - x0)[None, None, :, None]
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, (src_hw[0] - 1).astype(jnp.int32))
    x1 = jnp.minimum(x0 + 1, (src_hw[1] - 1).astype(jnp.int32))

    g = lambda yi, xi: x[:, yi, :, :][:, :, xi, :]
    out = (
        g(y0, x0) * (1 - wy) * (1 - wx)
        + g(y0, x1) * (1 - wy) * wx
        + g(y1, x0) * wy * (1 - wx)
        + g(y1, x1) * wy * wx
    )
    mask = valid_mask_2d((H, W), dst_hw)
    return out * mask[None, :, :, None]


def sample_via_scale_bucketed(
    model_fn_masked: Callable,
    sched: Schedules,
    prev_canvas: jnp.ndarray,
    key: jax.Array,
    *,
    prev_valid_hw,
    cur_valid_hw,
    s_index,
    total_t,
    max_t: int,
    reblurring: bool = True,
    omega: float = 0.0,
    guidance_builder: Optional[Callable] = None,
    guidance_carry: Any = None,
    guidance_params: Any = None,
    sub_iters: int = 0,
    x_carry: Optional[jnp.ndarray] = None,
    j_offset=None,
    seg_len: Optional[int] = None,
    t_min=None,
    sharding=None,
    collect_interm: bool = False,
) -> Tuple[jnp.ndarray, Any, jnp.ndarray, jax.Array, Optional[jnp.ndarray]]:
    """Reverse-denoise ONE scale on the shared canvas (jit-once for all).

    ``model_fn_masked(x, t_vec, s_value, mask)`` is the valid-mask
    denoiser; ``s_index``/``total_t`` are traced scalars; ``max_t`` is the
    static scan length (>= any total_t; inactive steps are cond-skipped).
    ``guidance_builder(valid_hw, valid_mask2d, n_valid) -> guidance_fn``
    constructs the CLIP hook with the traced canvas context.

    ``t_min`` (traced, default 0) stops the chain early — steps with
    ``t < t_min`` are cond-skipped, the --sample_limited_t semantics of
    the reference's every ``p_sample_loop`` (models.py:476-479).
    ``sharding``: optional NamedSharding for the canvas state; one
    constraint on the initial state propagates through the scan (batch
    over 'data', optionally H over 'spatial'). ``collect_interm`` (static)
    additionally stacks every post-step canvas state as a fifth return
    value [n_steps, B, H, W, 3] (t descending) — the functional form of
    the reference's per-step ``save_interm`` dumps (models.py:511-526).

    Segmented mode (``seg_len``/``j_offset``/``x_carry`` set): run only
    scan steps ``j_offset .. j_offset+seg_len-1`` of the same chain —
    at real CLIP scale one full chain is a multi-minute device call,
    which this tunneled backend's worker kills; the caller re-enters the
    SAME executable per window, threading (x, key, guidance_carry).
    The q_sample initialisation and the carry resize apply only when
    ``j_offset == 0``, and the PRNG key is consumed exactly as in the
    single-call path, so the segmented process is the same stochastic
    process (outputs agree to cross-program fp tolerance, ~5e-6).
    """
    h, w = prev_canvas.shape[1:3]
    vmask2d = valid_mask_2d((h, w), cur_valid_hw)
    n_valid = cur_valid_hw[0] * cur_valid_hw[1]
    mask4 = vmask2d[None, :, :, None].astype(prev_canvas.dtype)

    img_prev = dynamic_resize_into_canvas(
        prev_canvas, prev_valid_hw, cur_valid_hw
    )

    s_value = s_index.astype(jnp.float32)
    gammas_row = (
        jnp.clip(
            jnp.take(sched.gammas, s_index - 1, axis=0),
            0.0,
            GAMMA_SAMPLING_CLAMP,
        )
        if reblurring
        else None
    )

    def model_fn(x, t_vec, s_val):
        return model_fn_masked(x, t_vec, s_val, mask4)

    guidance_fn = None
    if guidance_builder is not None and sub_iters > 0:
        guidance_fn = guidance_builder(cur_valid_hw, vmask2d, n_valid)

    key_in = key
    key, kn = jax.random.split(key_in)
    noise = jax.random.normal(kn, img_prev.shape, dtype=img_prev.dtype)
    x = q_sample(sched, img_prev, jnp.asarray(total_t), noise) * mask4
    if sharding is not None:
        x = jax.lax.with_sharding_constraint(x, sharding)
    if j_offset is None:
        j0 = jnp.asarray(0, jnp.int32)
    else:
        j0 = jnp.asarray(j_offset, jnp.int32)
        first = j0 == 0
        x = jnp.where(first, x, x_carry)
        key = jnp.where(first, key, key_in)
    t_lo = jnp.asarray(0 if t_min is None else t_min, jnp.int32)

    def body(carry, jj):
        x, key, gcarry = carry
        j = j0 + jj
        t = total_t - 1 - j
        key, sub = jax.random.split(key)

        def active(args):
            x, gcarry, sub = args
            xn, gcarry, aux = p_sample_step(
                model_fn, sched, x, t, sub,
                s=1, reblurring=reblurring, img_prev=img_prev, omega=omega,
                guidance_fn=guidance_fn, guidance_carry=gcarry,
                guidance_params=guidance_params,
                gammas_row=gammas_row, s_value=s_value,
            )
            return xn * mask4, gcarry, aux.get(
                "clip_score", jnp.zeros((max(sub_iters, 1),))
            )

        def skip(args):
            x, gcarry, _ = args
            return x, gcarry, jnp.zeros((max(sub_iters, 1),))

        x, gcarry, score = jax.lax.cond(
            t >= t_lo, active, skip, (x, gcarry, sub)
        )
        out = (x, score) if collect_interm else score
        return (x, key, gcarry), out

    n_steps = max_t if seg_len is None else seg_len
    (x, key, guidance_carry), outs = jax.lax.scan(
        body, (x, key, guidance_carry), jnp.arange(n_steps)
    )
    if collect_interm:
        interm, scores = outs[0], outs[1]
    else:
        interm, scores = None, outs
    return x, guidance_carry, scores, key, interm


def place_on_canvas(x: jnp.ndarray, canvas_hw: Tuple[int, int]) -> jnp.ndarray:
    """Zero-pad [B, h, w, C] into the top-left of [B, H, W, C]."""
    B, h, w, C = x.shape
    H, W = canvas_hw
    return jnp.pad(x, ((0, 0), (0, H - h), (0, W - w), (0, 0)))


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "extractor", "max_t", "sub_iters", "n_scales", "frame_hw",
        "strength", "quantile", "llambda", "stop_guidance", "omega",
        "reblurring", "seg_len", "sharding", "collect_interm",
    ),
)
def jit_bucketed_scale(
    model,
    params,
    sched: Schedules,
    prev_canvas: jnp.ndarray,
    carry,
    key: jax.Array,
    prev_valid_hw,
    cur_valid_hw,
    s_index,
    total_t,
    text_embeds,
    clip_params=None,
    x_carry=None,
    j_offset=None,
    t_min=None,
    *,
    extractor=None,
    max_t: int,
    sub_iters: int,
    n_scales: int,
    frame_hw: Tuple[int, int],
    strength: float = 0.3,
    quantile: float = 0.7,
    llambda: float = 0.2,
    stop_guidance: int = 3,
    omega: float = 0.0,
    reblurring: bool = False,
    seg_len: Optional[int] = None,
    sharding=None,
    collect_interm: bool = False,
):
    """ONE executable for every guided via-scale (and any canvas-size run).

    Traced: canvas state, guidance carry, valid sizes, scale index, t
    budget, text embeddings, and ``clip_params`` (the CLIP tower variables
    — MUST be traced at real ViT-B/32 scale; closed-over weights become
    ~600 MB of HLO constants the remote compile service rejects).
    Static: scan length, guidance hyperparams, sharding, collect_interm.
    Returns (canvas state, carry, clip scores [n_steps, sub_iters], key,
    interm frames or None). ``t_min`` (traced) is the
    ``--sample_limited_t`` early stop; ``sharding`` shards the canvas
    state over a mesh; ``collect_interm`` stacks per-step frames.

    Segmented mode (static ``seg_len`` + traced ``j_offset``/``x_carry``):
    runs scan steps ``j_offset .. j_offset+seg_len-1`` only; re-enter the
    same executable with the returned (canvas, carry, key) threaded back
    in to continue the chain (see ``sample_via_scale_bucketed``).
    """
    from sinddm_tpu.guidance.clip_guidance import ClipCarry, make_clip_guidance

    def model_fn_masked(x, t_vec, s_val, mask4):
        return model.apply({"params": params}, x, t_vec, s_val, mask=mask4)

    # resize guidance state valid-region -> valid-region (reference
    # models.py:528-532; the s==0 mask drop never applies on via scales).
    # In segmented mode the resize belongs to the chain *start* only — a
    # carry re-entering for segment j>0 already lives on cur_valid.
    if carry is not None:
        resized = ClipCarry(
            mask=dynamic_resize_into_canvas(
                carry.mask, prev_valid_hw, cur_valid_hw
            ),
            x_recon_prev=dynamic_resize_into_canvas(
                carry.x_recon_prev, prev_valid_hw, cur_valid_hw
            ),
            has_mask=carry.has_mask,
        )
        if j_offset is not None:
            first = jnp.asarray(j_offset, jnp.int32) == 0
            carry = jax.tree.map(
                lambda a, b: jnp.where(first, a, b), resized, carry
            )
        else:
            carry = resized

    guidance_builder = None
    if sub_iters > 0:
        def guidance_builder(valid_hw, vmask2d, n_valid):
            return make_clip_guidance(
                extractor, text_embeds,
                s=1, n_scales=n_scales, sub_iters=sub_iters,
                strength=strength, quantile=quantile, llambda=llambda,
                stop_guidance=stop_guidance,
                bucketed_ctx={
                    "valid_hw": valid_hw,
                    "n_valid": n_valid,
                    "valid_mask": vmask2d,
                    "frame_hw": frame_hw,
                },
            )

    return sample_via_scale_bucketed(
        model_fn_masked, sched, prev_canvas, key,
        prev_valid_hw=prev_valid_hw, cur_valid_hw=cur_valid_hw,
        s_index=s_index, total_t=total_t, max_t=max_t,
        reblurring=reblurring, omega=omega,
        guidance_builder=guidance_builder, guidance_carry=carry,
        guidance_params=clip_params,
        sub_iters=sub_iters,
        x_carry=x_carry, j_offset=j_offset, seg_len=seg_len,
        t_min=t_min, sharding=sharding, collect_interm=collect_interm,
    )
