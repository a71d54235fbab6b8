"""Host-side image operations: mask dilation, histogram matching.

The reference depends on scikit-image for these
(``SinDDM/functions.py:21-33`` uses ``skimage.morphology`` +
``skimage.filters``; ``trainer.py:310-314`` uses
``skimage.exposure.match_histograms``). This image has no skimage, so the
exact semantics are implemented here on numpy/scipy:

* ``dilate_mask``: binary dilation with a disk structuring element
  (radius 7 for harmonization, 20 for editing), gaussian blur sigma=5
  (nearest-edge mode, truncate 4.0 — skimage defaults), then min-max
  renormalization.
* ``match_histograms``: per-channel quantile mapping, the exact
  scikit-image algorithm (unique values + CDF interpolation).

These run on host before sampling (they prepare constant inputs), so
numpy is the right tool — no reason to burn XLA compiles on them.
"""

from __future__ import annotations

import numpy as np
from scipy import ndimage


def disk(radius: int) -> np.ndarray:
    """Boolean disk structuring element (skimage.morphology.disk parity)."""
    y, x = np.mgrid[-radius : radius + 1, -radius : radius + 1]
    return (x * x + y * y) <= radius * radius


def dilate_mask(mask_hwc: np.ndarray, mode: str = "harmonization") -> np.ndarray:
    """Dilate + feather a binary mask. Reference ``functions.py:21-33``.

    Args:
      mask_hwc: [H, W, C] float mask in [0, 1] (channel 0 is used).
    Returns:
      [H, W, 1] float32 mask in [0, 1].
    """
    if mode == "harmonization":
        element = disk(7)
    elif mode == "editing":
        element = disk(20)
    else:
        raise ValueError(f"unknown dilate mode {mode!r}")
    m = np.asarray(mask_hwc)[:, :, 0]
    m = ndimage.binary_dilation(m.astype(bool), structure=element)
    m = ndimage.gaussian_filter(m.astype(np.float64), sigma=5, mode="nearest", truncate=4.0)
    m = (m - m.min()) / (m.max() - m.min())
    return m[:, :, None].astype(np.float32)


def _match_channel(source: np.ndarray, template: np.ndarray) -> np.ndarray:
    """scikit-image _match_cumulative_cdf semantics for one channel."""
    src_values, src_unique_indices, src_counts = np.unique(
        source.ravel(), return_inverse=True, return_counts=True
    )
    tmpl_values, tmpl_counts = np.unique(template.ravel(), return_counts=True)
    src_quantiles = np.cumsum(src_counts) / source.size
    tmpl_quantiles = np.cumsum(tmpl_counts) / template.size
    interp = np.interp(src_quantiles, tmpl_quantiles, tmpl_values)
    return interp[src_unique_indices].reshape(source.shape)


def match_histograms(image: np.ndarray, reference: np.ndarray) -> np.ndarray:
    """Per-channel histogram matching ([H, W, C] arrays, channel_axis=2).

    Reference usage: ``trainer.py:310-314`` matches the style-transfer
    input to the training image before sampling.
    """
    image = np.asarray(image)
    reference = np.asarray(reference)
    if image.shape[-1] != reference.shape[-1]:
        raise ValueError("channel count mismatch")
    out = np.empty_like(image, dtype=np.float64)
    for c in range(image.shape[-1]):
        out[..., c] = _match_channel(image[..., c], reference[..., c])
    return out.astype(image.dtype)
