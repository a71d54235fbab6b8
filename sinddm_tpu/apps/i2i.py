"""Image-to-image applications: harmonization and style transfer.

Reference: ``MultiscaleTrainer.image2image`` (``SinDDM/trainer.py:287-361``)
and the mode wiring in ``main.py:294-320``:

* style transfer: histogram-match the input to the finest training image,
  inject at the finest scale with a small starting t (default 15),
* harmonization: dilate+feather the user mask, inject the composite at the
  finest scale with starting t (default 5), then re-composite
  ``mask * sample + (1 - mask) * input`` at the end,
* both zero the entry scale's gamma row (no reblur mixing at injection —
  the reference mutates the buffer in place, ``trainer.py:326-327``; here
  it is a functional ``Schedules.zero_gamma_row``).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sinddm_tpu.apps.sampling import jit_sample_via_scale
from sinddm_tpu.ops.image import dilate_mask, match_histograms
from sinddm_tpu.pyramid import Pyramid
from sinddm_tpu.schedules import Schedules


def image2image(
    model,
    params,
    sched: Schedules,
    pyramid: Pyramid,
    input_img: np.ndarray,
    key: jax.Array,
    *,
    mode: str,  # 'harmonization' | 'style_transfer'
    mask_img: Optional[np.ndarray] = None,
    start_s: Optional[int] = None,
    custom_t: Optional[Sequence[int]] = None,
    batch_size: int = 16,
    scale_mul: Tuple[float, float] = (1.0, 1.0),
    use_hist: Optional[bool] = None,
    omega: float = 0.0,
    sample_limited_t: bool = False,
    sharding=None,
    collect_aux: Optional[List] = None,
    collect_interm: bool = False,
) -> Tuple[jnp.ndarray, List[jnp.ndarray]]:
    """Run i2i; returns (final composite [B,H,W,3] in [0,1], per-scale raw).

    ``input_img``: [H, W, 3] float in [-1, 1] (already auto_scale-capped by
    :func:`sinddm_tpu.pyramid.load_external_image`). ``mask_img``: raw
    [H, W, C] float in [0, 1] mask (harmonization only; resized+dilated
    here, reference trainer.py:300-306). ``collect_interm=True`` appends
    each run scale's per-step frame stack to ``collect_aux`` (reference
    dumps them in the via-scale loop, models.py:511-526).
    """
    n_scales = pyramid.n_scales
    if start_s is None:
        start_s = n_scales - 1  # reference main.py:299,306
    if use_hist is None:
        use_hist = mode == "style_transfer"
    if custom_t is None:
        custom_t = list(sched.num_timesteps_ideal)

    h_in, w_in = input_img.shape[:2]

    if mode == "harmonization" and mask_img is not None:
        from PIL import Image

        m = Image.fromarray(
            np.clip(np.asarray(mask_img) * 255, 0, 255).astype(np.uint8)
        ).resize((w_in, h_in), Image.LANCZOS)
        mask = dilate_mask(np.asarray(m, np.float32) / 255.0, mode=mode)
        mask = jnp.asarray(mask)[None]  # [1, H, W, 1]
    else:
        mask = jnp.asarray(1.0)

    if use_hist:
        # match to the scale_{start_s} training image (reference main.py:314)
        ref_u8 = np.clip(
            (np.asarray(pyramid.images[start_s]) + 1) * 0.5 * 255 + 0.5, 0, 255
        ).astype(np.uint8)
        in_u8 = np.clip((np.asarray(input_img) + 1) * 0.5 * 255 + 0.5, 0, 255).astype(
            np.uint8
        )
        matched = match_histograms(in_u8, ref_u8)
        input_img = (matched.astype(np.float32) / 255.0) * 2.0 - 1.0

    input_batch = jnp.broadcast_to(
        jnp.asarray(input_img, jnp.float32)[None], (batch_size, h_in, w_in, 3)
    )
    from sinddm_tpu.parallel.mesh import (
        DATA_AXIS,
        SPATIAL_AXIS,
        batch_sharding,
        require_named_sharding,
    )

    sharding = require_named_sharding(sharding)
    if sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        mesh = sharding.mesh
        data_n = mesh.shape.get(DATA_AXIS, 1)
        if batch_size % data_n != 0:
            raise ValueError(
                f"batch_size ({batch_size}) must be divisible by the mesh "
                f"'{DATA_AXIS}' axis ({data_n})"
            )
        if h_in % mesh.shape.get(SPATIAL_AXIS, 1) != 0:
            # external images have arbitrary heights; device_put needs
            # divisibility, so fall back to batch-only sharding rather than
            # failing (the jitted sampler re-constrains internally)
            sharding = batch_sharding(mesh, spatial=False)
        input_batch = jax.device_put(input_batch, sharding)
        params = jax.device_put(
            params, NamedSharding(mesh, PartitionSpec())
        )

    # no reblur mixing at the entry scale (reference trainer.py:326-327)
    sched_run = sched.zero_gamma_row(start_s) if start_s > 0 else sched

    outputs: List[jnp.ndarray] = []
    prev = input_batch
    for i in range(n_scales - start_s):
        s = i + start_s
        ds_factor = pyramid.scale_factor ** (n_scales - s - 1)
        cur_size = (int(h_in / ds_factor), int(w_in / ds_factor))
        t_min = (
            int(sched.num_timesteps_ideal[s + 1])
            if (sample_limited_t and s < n_scales - 1)
            else 0
        )
        key, sub = jax.random.split(key)
        x, _, aux = jit_sample_via_scale(
            model, params, sched_run, prev, sub, cur_size, s,
            int(custom_t[s]), t_min, True, omega, sharding=sharding,
            collect_interm=collect_interm,
        )
        if collect_aux is not None:
            collect_aux.append(aux)
        outputs.append(x)
        prev = x

    final01 = (outputs[-1] + 1.0) * 0.5
    input01 = jnp.clip((input_batch + 1.0) * 0.5, 0.0, 1.0)
    final = mask * final01 + (1.0 - mask) * input01
    return final, outputs
