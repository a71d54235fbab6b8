"""Image resizing with the reference's interpolation semantics.

The reference uses ``torch.nn.functional.interpolate`` with
``mode='bilinear'`` (align_corners=False, no antialias) for scale-to-scale
upsampling (``SinDDM/models.py:567``) and guidance-state resizing
(``models.py:531-532``), and ``mode='nearest'`` for ROI patch resizing
(``models.py:296``).

* bilinear/align_corners=False/no-antialias == half-pixel-center linear
  sampling without a widened kernel, which is exactly
  ``jax.image.resize(method='linear', antialias=False)``.
* torch 'nearest' uses the legacy floor(dst * in/out) index map, which
  differs from jax's rounded half-pixel nearest — implemented here by
  explicit gathers.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp


def resize_bilinear(x: jnp.ndarray, size_hw: Tuple[int, int]) -> jnp.ndarray:
    """Bilinear resize of NHWC (or HWC) images to (H, W), torch semantics."""
    h, w = int(size_hw[0]), int(size_hw[1])
    if x.ndim == 4:
        shape = (x.shape[0], h, w, x.shape[3])
    elif x.ndim == 3:
        shape = (h, w, x.shape[2])
    else:
        raise ValueError(f"expected HWC or NHWC, got shape {x.shape}")
    return jax.image.resize(x, shape, method="linear", antialias=False)


def resize_nearest(x: jnp.ndarray, size_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest resize of NHWC (or HWC) with torch's floor index map."""
    h, w = int(size_hw[0]), int(size_hw[1])
    in_h = x.shape[-3]
    in_w = x.shape[-2]
    rows = jnp.floor(jnp.arange(h) * (in_h / h)).astype(jnp.int32)
    cols = jnp.floor(jnp.arange(w) * (in_w / w)).astype(jnp.int32)
    rows = jnp.clip(rows, 0, in_h - 1)
    cols = jnp.clip(cols, 0, in_w - 1)
    x = jnp.take(x, rows, axis=-3)
    x = jnp.take(x, cols, axis=-2)
    return x
