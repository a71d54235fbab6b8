"""ROI-guided generation driver.

Reference ``MultiscaleTrainer.roi_guided_sampling`` (``trainer.py:470-488``):
run the normal pyramid sampler with the ROI paste hook active at every
scale below the finest. Boxes come in as [y, x, h, w] at finest-scale
coordinates (headless flags here; the reference pops an OpenCV window,
``main.py:257-292`` — see cli.py for the optional interactive path).
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from sinddm_tpu.apps.sampling import sample_scales
from sinddm_tpu.guidance.roi import make_roi_guidance
from sinddm_tpu.pyramid import Pyramid
from sinddm_tpu.schedules import Schedules


def roi_guided_sampling(
    model,
    params,
    sched: Schedules,
    pyramid: Pyramid,
    key: jax.Array,
    *,
    target_roi: Sequence[int],
    roi_bb_list: Sequence[Sequence[int]],
    custom_t_list: Optional[Sequence[int]] = None,
    batch_size: int = 4,
    scale_mul: Tuple[float, float] = (1.0, 1.0),
    reblurring: bool = True,
    sample_limited_t: bool = False,
    omega: float = 0.0,
    sharding=None,
    precompile: bool = False,
    collect_aux=None,
    collect_interm: bool = False,
) -> List[jnp.ndarray]:
    def guidance_factory(s, size_hw):
        fn = make_roi_guidance(
            pyramid.images,
            target_roi,
            roi_bb_list,
            scale_factor=pyramid.scale_factor,
            n_scales=pyramid.n_scales,
            s=s,
        )
        return fn, None  # ROI guidance is stateless

    return sample_scales(
        model, params, sched, pyramid.sizes_hw, key,
        scale_factor=pyramid.scale_factor, n_scales=pyramid.n_scales,
        batch_size=batch_size, scale_mul=scale_mul,
        custom_t_list=custom_t_list, custom_sample=False,
        reblurring=reblurring, omega=omega,
        sample_limited_t=sample_limited_t,
        guidance_factory=guidance_factory, sharding=sharding,
        precompile=precompile,
        collect_aux=collect_aux, collect_interm=collect_interm,
    )
