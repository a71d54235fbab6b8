"""ROI-guided sampling: paste a user-selected patch during denoising.

Reference behavior (``SinDDM/models.py:291-298,430-431`` +
``trainer.py:470-488``): the user picks a source bounding box on the
finest-scale training image and one or more target boxes; at every
denoising step of every scale **below the finest**, the per-scale
downsampled source patch is nearest-resized into each target box and
blended with weight eta=0.8 into the current x_recon estimate.

Here this is a pure guidance hook: all boxes and patches are static, so
the pastes compile to static dynamic-update-slices inside the sampler's
scan.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from sinddm_tpu.ops.resize import resize_nearest


def rescale_bb(bb: Sequence[int], scale_factor: float, n_scales: int, s: int) -> List[int]:
    """Rescale a finest-scale [y, x, h, w] box to scale s (models.py:294)."""
    f = np.power(scale_factor, n_scales - s - 1)
    return [int(v / f) for v in bb]


def extract_patch(image_hwc: np.ndarray, bb: Sequence[int]) -> np.ndarray:
    """[y, x, h, w] crop. Reference ``functions.py:45-48``."""
    y, x, h, w = bb
    return image_hwc[y : y + h, x : x + w]


def stat_from_bb(image_hwc: np.ndarray, bb: Sequence[int]):
    """Per-channel (mean, std) of a box. Reference ``functions.py:38-42``
    (declared for roi_bbs_stat; unused by the reference's own sampler but
    part of its helper surface)."""
    patch = extract_patch(np.asarray(image_hwc), bb)
    return (
        patch.mean(axis=(0, 1), keepdims=True),
        patch.std(axis=(0, 1), ddof=1, keepdims=True),
    )


def make_roi_guidance(
    pyramid_images: Sequence[np.ndarray],
    target_bb: Sequence[int],
    roi_bbs: Sequence[Sequence[int]],
    *,
    scale_factor: float,
    n_scales: int,
    s: int,
    eta: float = 0.8,
):
    """Build the guidance hook for scale s (no-op at the finest scale).

    ``pyramid_images[s]`` is the scale-s training image [H, W, 3] in
    [-1, 1]; ``target_bb`` / ``roi_bbs`` are finest-scale [y, x, h, w].
    """
    if s >= n_scales - 1:
        return None

    tgt_bb_s = rescale_bb(target_bb, scale_factor, n_scales, s)
    target_patch = jnp.asarray(
        extract_patch(np.asarray(pyramid_images[s]), tgt_bb_s), jnp.float32
    )[None]  # [1, h, w, 3]

    pastes: List[Tuple[int, int, jnp.ndarray]] = []
    for bb in roi_bbs:
        y, x, h, w = rescale_bb(bb, scale_factor, n_scales, s)
        patch = resize_nearest(target_patch, (h, w))  # reference models.py:296
        pastes.append((y, x, patch))

    def guidance_fn(x_recon, x_t, t, s_, key, carry):
        for y, x, patch in pastes:
            h, w = patch.shape[1:3]
            region = x_recon[:, y : y + h, x : x + w, :]
            blended = eta * patch + (1.0 - eta) * region
            x_recon = x_recon.at[:, y : y + h, x : x + w, :].set(blended)
        return x_recon, carry, {}

    return guidance_fn
