"""Cascaded multi-scale sampling — the pyramid driver.

Re-design of ``MultiscaleTrainer.sample_scales`` (reference
``SinDDM/trainer.py:226-285``) plus the size arithmetic of
``sample_via_scale`` (``SinDDM/models.py:549-568``): scale 0 from pure
noise (or from the training image / an injected image), then each finer
scale bilinearly upsamples the previous output, partially re-noises it and
denoises with the reblurring sampler.

Each scale is one jitted call (upsample + q_sample + the full reverse
``lax.scan`` fused into a single XLA program); JAX's jit cache gives one
compilation per (shape, t-count, scale) combination.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sinddm_tpu.diffusion.core import sample_scale0, sample_via_scale
from sinddm_tpu.models.denoiser import apply_denoiser_pallas
from sinddm_tpu.ops.resize import resize_bilinear
from sinddm_tpu.schedules import Schedules


def _make_model_fn(model, params, use_pallas: bool):
    if use_pallas:
        return lambda x, t, sc: apply_denoiser_pallas(params, x, t, sc)
    return lambda x, t, sc: model.apply({"params": params}, x, t, sc)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "shape", "s", "t_min", "omega", "guidance_fn", "sharding",
        "collect_interm", "use_pallas",
    ),
)
def jit_sample_scale0(
    model, params, sched: Schedules, key, shape, s, t_min, omega,
    guidance_fn=None, guidance_carry=None, sharding=None,
    collect_interm=False, use_pallas=False,
):
    model_fn = _make_model_fn(model, params, use_pallas)

    x, carry, aux = sample_scale0(
        model_fn, sched, shape, key, s=s, t_min=t_min, omega=omega,
        guidance_fn=guidance_fn, guidance_carry=guidance_carry,
        sharding=sharding, collect_interm=collect_interm,
    )
    return x, carry, aux


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "size_hw", "s", "total_t", "t_min", "reblurring", "omega",
        "guidance_fn", "sharding", "collect_interm", "use_pallas",
    ),
)
def jit_sample_via_scale(
    model, params, sched: Schedules, prev, key, size_hw, s, total_t, t_min,
    reblurring, omega, guidance_fn=None, guidance_carry=None, sharding=None,
    collect_interm=False, use_pallas=False,
):
    img_prev = resize_bilinear(prev, size_hw)
    model_fn = _make_model_fn(model, params, use_pallas)

    x, carry, aux = sample_via_scale(
        model_fn, sched, img_prev, key,
        s=s, total_t=total_t, t_min=t_min, reblurring=reblurring, omega=omega,
        guidance_fn=guidance_fn, guidance_carry=guidance_carry,
        sharding=sharding, collect_interm=collect_interm,
    )
    return x, carry, aux


def via_scale_size(
    sizes_hw: Sequence[Tuple[int, int]],
    *,
    s: int,
    n_scales: int,
    scale_factor: float,
    scale_mul: Tuple[float, float] = (1.0, 1.0),
    custom_sample: bool = False,
    custom_img_size_idx: int = 0,
    custom_image_size: Optional[Tuple[int, int]] = None,
) -> Tuple[int, int]:
    """Target (H, W) for a via-scale step. Reference models.py:554-565."""
    if custom_sample:
        if custom_img_size_idx >= n_scales:  # extrapolate past the pyramid
            size = sizes_hw[n_scales - 1]
            factor = scale_factor ** (custom_img_size_idx + 1 - n_scales)
            size = (int(size[0] * factor), int(size[1] * factor))
        else:
            size = sizes_hw[custom_img_size_idx]
    else:
        size = sizes_hw[s]
    image_size = (int(size[0] * scale_mul[0]), int(size[1] * scale_mul[1]))
    if custom_image_size is not None:
        image_size = custom_image_size
    return image_size


def sample_scales(
    model,
    params,
    sched: Schedules,
    sizes_hw: Sequence[Tuple[int, int]],
    key: jax.Array,
    *,
    scale_factor: float,
    n_scales: int,
    batch_size: int = 16,
    scale_mul: Tuple[float, float] = (1.0, 1.0),
    custom_t_list: Optional[Sequence[int]] = None,
    custom_scales: Optional[Sequence[int]] = None,
    custom_image_size_idxs: Optional[Sequence[int]] = None,
    custom_sample: bool = False,
    start_noise: bool = True,
    start_image: Optional[np.ndarray] = None,
    reblurring: bool = True,
    sample_limited_t: bool = False,
    omega: float = 0.0,
    guidance_factory: Optional[Callable[[int, Any, Tuple[int, int]], Tuple[Any, Any]]] = None,
    carry_transform: Optional[Callable[[int, Any, Tuple[int, int]], Any]] = None,
    collect_aux: Optional[List[Any]] = None,
    sharding=None,
    use_pallas: bool = False,
) -> List[jnp.ndarray]:
    """Run the full pyramid; returns the list of per-scale outputs [B,H,W,3].

    Args mirror the reference driver (trainer.py:226-285). ``start_image``
    (float [-1,1] HWC) replaces ``start_noise=False``'s training-image
    injection. ``guidance_factory(s, carry, size_hw) -> (guidance_fn,
    carry)`` builds the per-scale guidance hook (CLIP / ROI);
    ``carry_transform`` resizes guidance state between scales (reference
    models.py:528-534).
    """
    if custom_t_list is None:
        custom_t_list = list(sched.num_timesteps_ideal[1:])
    if custom_scales is None:
        custom_scales = list(range(n_scales))
    run_scales = len(custom_scales)
    if custom_image_size_idxs is None:
        custom_image_size_idxs = list(range(n_scales))

    outputs: List[jnp.ndarray] = []
    gcarry: Any = None

    for i in range(run_scales):
        s = int(custom_scales[i])
        key, sub = jax.random.split(key)
        if i == 0:
            if start_noise:
                size0 = sizes_hw[custom_image_size_idxs[0]]
                shape = (
                    batch_size,
                    int(size0[0] * scale_mul[0]),
                    int(size0[1] * scale_mul[1]),
                    3,
                )
                t_min = (
                    sched.num_timesteps_ideal[s + 1]
                    if (sample_limited_t and s < n_scales - 1)
                    else 0
                )
                gfn = None
                if guidance_factory is not None:
                    gfn, gcarry = guidance_factory(s, gcarry, shape[1:3])
                x, gcarry, aux = jit_sample_scale0(
                    model, params, sched, sub, shape, s, t_min, omega,
                    guidance_fn=gfn, guidance_carry=gcarry, sharding=sharding,
                    use_pallas=use_pallas,
                )
                if collect_aux is not None:
                    collect_aux.append(aux)
            else:
                # inject a start image at scale custom_scales[0]
                # (reference trainer.py:263-266)
                assert start_image is not None, "start_noise=False needs start_image"
                x = jnp.broadcast_to(
                    jnp.asarray(start_image, jnp.float32)[None],
                    (batch_size,) + np.asarray(start_image).shape,
                )
        else:
            size_hw = via_scale_size(
                sizes_hw,
                s=s,
                n_scales=n_scales,
                scale_factor=scale_factor,
                scale_mul=scale_mul,
                custom_sample=custom_sample,
                custom_img_size_idx=int(custom_image_size_idxs[i]),
            )
            total_t = int(custom_t_list[s - 1])
            t_min = (
                sched.num_timesteps_ideal[s + 1]
                if (sample_limited_t and s < n_scales - 1)
                else 0
            )
            gfn = None
            if carry_transform is not None and gcarry is not None:
                gcarry = carry_transform(s, gcarry, size_hw)
            if guidance_factory is not None:
                gfn, gcarry = guidance_factory(s, gcarry, size_hw)
            x, gcarry, aux = jit_sample_via_scale(
                model, params, sched, outputs[-1], sub, size_hw, s, total_t,
                t_min, reblurring, omega,
                guidance_fn=gfn, guidance_carry=gcarry, sharding=sharding,
                use_pallas=use_pallas,
            )
            if collect_aux is not None:
                collect_aux.append(aux)
        outputs.append(x)
    return outputs
