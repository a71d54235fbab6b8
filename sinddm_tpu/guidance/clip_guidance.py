"""CLIP-guided sampling hook: gradient edits of x_recon inside the scan.

Re-design of the reference's in-sampler CLIP branch
(``SinDDM/models.py:368-427``) as a pure guidance function threaded
through the reverse-diffusion ``lax.scan``:

* per guided timestep: clamp x_recon; if a mask exists, blend with the
  previous guided estimate (``x * (1-m) + ((1-l)*prev + l*x) * m``,
  models.py:373-375);
* ``guidance_sub_iters[s]`` gradient sub-iterations: score =
  -clip_loss((x+1)/2, text embeds — hr for s>0, lr for s=0); grad via
  ``jax.grad`` (replacing ``torch.autograd.grad``, models.py:387);
* on the first-ever iteration, :func:`thresholded_grad` sparsifies the
  gradient at an energy quantile (= 1 - fill_factor) and produces the
  persistent edit mask (models.py:389-392; ``functions.py:52-67``);
* norm-matched update ``x += strength * (||x*m|| / ||g*m||) * g * m``,
  clamp, repeat (models.py:406-412);
* guidance is gated off for the last ``stop_guidance`` steps of the
  finest scale (models.py:368) via ``lax.cond`` so the CLIP tower isn't
  even executed on gated steps.

Carry: (mask [B,H,W,1], x_recon_prev [B,H,W,3], has_mask flag). The app
layer resizes the carry between scales and drops a scale-0 mask
(models.py:528-534) — see :func:`resize_guidance_carry`.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from sinddm_tpu.guidance.clip_extractor import ClipExtractor
from sinddm_tpu.ops.resize import resize_bilinear


class ClipCarry(NamedTuple):
    mask: jnp.ndarray  # [B, H, W, 1]
    x_recon_prev: jnp.ndarray  # [B, H, W, 3]
    has_mask: jnp.ndarray  # bool scalar


def init_clip_carry(batch: int, size_hw: Tuple[int, int]) -> ClipCarry:
    h, w = size_hw
    return ClipCarry(
        mask=jnp.zeros((batch, h, w, 1), jnp.float32),
        x_recon_prev=jnp.zeros((batch, h, w, 3), jnp.float32),
        has_mask=jnp.asarray(False),
    )


def resize_guidance_carry(
    carry: ClipCarry, size_hw: Tuple[int, int], drop_mask: bool = False
) -> ClipCarry:
    """Bilinear-resize the guidance state to the next scale's size.

    ``drop_mask=True`` mirrors the reference discarding a mask created at
    scale 0 ("usually too noisy", models.py:533-534).
    """
    b = carry.mask.shape[0]
    return ClipCarry(
        mask=jnp.zeros((b, *size_hw, 1), carry.mask.dtype)
        if drop_mask
        else resize_bilinear(carry.mask, size_hw),
        x_recon_prev=resize_bilinear(carry.x_recon_prev, size_hw),
        has_mask=jnp.where(drop_mask, jnp.asarray(False), carry.has_mask),
    )


def thresholded_grad(
    grad: jnp.ndarray,
    quantile: float = 0.8,
    valid_mask: Optional[jnp.ndarray] = None,
    n_valid: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Soft-threshold CLIP gradients at an energy quantile.

    Reference ``functions.py:52-67``: energy = ||grad||_2 over channels;
    per-sample 'nearest' quantile of the flattened energy; returns
    (sparse_grad, boolean mask). Implements the paper's fill_factor.

    ``valid_mask`` ([H, W] bool) + ``n_valid`` (traced scalar) compute the
    quantile over the valid region of a padded canvas only (shape-bucketed
    sampler): invalid energies sort to +inf, and the 'nearest' index
    k = round(q * (n_valid - 1)) is a dynamic gather — equal to
    ``jnp.quantile(valid_values, q, method='nearest')`` (tested).
    """
    b = grad.shape[0]
    energy = jnp.linalg.norm(grad, axis=-1)  # [B, H, W]
    flat = energy.reshape(b, -1)
    if valid_mask is None:
        q = jnp.quantile(flat, quantile, axis=1, method="nearest")[:, None, None]
    else:
        vm = valid_mask.reshape(-1).astype(bool)
        srt = jnp.sort(jnp.where(vm[None, :], flat, jnp.inf), axis=1)
        # jnp.quantile 'nearest' rounds .5 virtual indices DOWN (measured
        # in-env; numpy rounds them up) — ceil(vi - 0.5) reproduces it
        k = jnp.ceil(quantile * (n_valid - 1) - 0.5).astype(jnp.int32)
        q = jnp.take(srt, k, axis=1)[:, None, None]
    delta = energy - q
    mask = (delta > 0)[..., None]  # [B, H, W, 1]
    if valid_mask is not None:
        mask = jnp.logical_and(mask, valid_mask[None, :, :, None])
    delta_clamped = jnp.clip(delta, 0.0, None)[..., None]
    unit = grad / energy[..., None]
    unit = jnp.nan_to_num(unit, nan=0.0, posinf=0.0, neginf=0.0)
    sparse = delta_clamped * unit
    if valid_mask is not None:
        sparse = sparse * valid_mask[None, :, :, None]
    return sparse, mask


def _vec_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Per-sample L2 norm over (H, W, C), keepdims (torch vector_norm parity)."""
    return jnp.sqrt(jnp.sum(x * x, axis=(1, 2, 3), keepdims=True))


def make_clip_guidance(
    extractor: ClipExtractor,
    text_embeds: jnp.ndarray,
    *,
    s: int,
    n_scales: int,
    sub_iters: int,
    strength: float,
    quantile: float,
    llambda: float,
    stop_guidance: int,
    bucketed_ctx: Optional[dict] = None,
):
    """Build the per-scale guidance hook (None when sub_iters == 0).

    ``bucketed_ctx`` (shape-bucketed sampler, ``diffusion/bucketed.py``)
    carries traced padded-canvas context: ``valid_hw`` [2], ``n_valid``
    scalar, ``valid_mask`` [H, W] bool, ``frame_hw`` static (ch, cw). The
    CLIP views then sample only the valid region and the energy quantile
    is computed over valid pixels.
    """
    if sub_iters <= 0:
        return None
    ctx = bucketed_ctx or {}
    valid_hw = ctx.get("valid_hw")
    frame_hw = ctx.get("frame_hw")
    valid_mask2d = ctx.get("valid_mask")
    n_valid = ctx.get("n_valid")

    def guided(args):
        x_recon, t, key, carry, clip_params = args
        mask, x_prev, has_mask = carry
        x = jnp.clip(x_recon, -1.0, 1.0)
        blended = x * (1.0 - mask) + ((1.0 - llambda) * x_prev + llambda * x) * mask
        x = jnp.where(has_mask, blended, x)

        scores = []
        for i in range(sub_iters):
            key, kl = jax.random.split(key)

            def loss_fn(xr):
                return -extractor.calculate_clip_loss(
                    (xr + 1.0) * 0.5, text_embeds, kl,
                    valid_hw=valid_hw, frame_hw=frame_hw,
                    variables=clip_params,
                )

            score, grad = jax.value_and_grad(loss_fn)(x)
            if valid_mask2d is not None:
                # bilinear taps at the valid-region edge can graze the
                # first padded row/col; keep the update strictly valid
                grad = grad * valid_mask2d[None, :, :, None]

            sparse_grad, new_mask = thresholded_grad(
                grad, quantile, valid_mask=valid_mask2d, n_valid=n_valid
            )
            use_sparse = jnp.logical_not(has_mask)
            mask = jnp.where(has_mask, mask, new_mask.astype(jnp.float32))
            grad_used = jnp.where(use_sparse, sparse_grad, grad)
            has_mask = jnp.asarray(True)

            division_norm = _vec_norm(x * mask) / jnp.maximum(
                _vec_norm(grad_used * mask), 1e-12
            )
            x = x + strength * division_norm * grad_used * mask
            x = jnp.clip(x, -1.0, 1.0)
            scores.append(score)

        carry = ClipCarry(mask, jax.lax.stop_gradient(x), has_mask)
        return x, carry, jnp.stack(scores)

    def not_guided(args):
        x_recon, t, key, carry, clip_params = args
        return x_recon, ClipCarry(*carry), jnp.zeros((sub_iters,))

    def guidance_fn(x_recon, x_t, t, s_, key, carry, clip_params=None):
        # ``clip_params`` (optional 7th arg, threaded by p_sample_step's
        # guidance_params) carries the CLIP tower as a TRACED pytree; when
        # None the extractor falls back to its constructor weights, which
        # then embed in the graph as constants (fine for the tiny test
        # fixture, fatal at ViT-B/32 scale — see clip_extractor.py).
        # gate: stop_guidance <= t or s < n_scales - 1 (models.py:368)
        operands = (x_recon, t, key, carry, clip_params)
        if bucketed_ctx is not None:
            # s_ is traced in the bucketed graph: same gate, dynamically
            gate = jnp.logical_or(s_ < n_scales - 1, t >= stop_guidance)
            x, carry, scores = jax.lax.cond(gate, guided, not_guided, operands)
        elif s < n_scales - 1:
            x, carry, scores = guided(operands)
        else:
            gate = t >= stop_guidance
            x, carry, scores = jax.lax.cond(gate, guided, not_guided, operands)
        return x, carry, {"clip_score": scores}

    return guidance_fn
