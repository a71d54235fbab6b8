"""Functional equivalents of the reference's extra augmentation utilities.

The reference vendors five Text2LIVE transforms in
``text2live_util/aug_utils.py`` that **no SinDDM code path imports**
(SURVEY §2.1 #13: "Text2LIVE leftovers; not imported by any SinDDM
path"). They are provided here as differentiable functional versions for
1:1 surface completeness — built on the same homography machinery as the
live augmentation pipeline (``ops/warp.py``).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from sinddm_tpu.ops.warp import (
    crop_resize_matrix,
    perspective_matrix,
    warp_homography,
)


def random_scale(
    key: jax.Array, img: jnp.ndarray, out_hw: Tuple[int, int],
    min_scale: float = 0.8, max_scale: float = 1.2,
) -> jnp.ndarray:
    """Rescale by s ~ U(min, max) into a fixed frame (aug_utils.py:22-37).

    Static output shape: the scaled content is sampled into out_hw (the
    torchvision original returns dynamic sizes, which TPU can't trace).
    """
    h, w = img.shape[0], img.shape[1]
    s = jax.random.uniform(key, minval=min_scale, maxval=max_scale)
    m = crop_resize_matrix(0.0, 0.0, h / s, w / s, out_hw)
    return warp_homography(img, m, out_hw, fill=0.0)


def random_size_crop(
    key: jax.Array, img: jnp.ndarray, out_hw: Tuple[int, int],
    min_cover: float = 0.5,
) -> jnp.ndarray:
    """Random crop of size factor U(min_cover, 1), resampled to out_hw
    (aug_utils.py:40-55, made static-shape)."""
    h, w = img.shape[0], img.shape[1]
    ks, ky, kx = jax.random.split(key, 3)
    f = jax.random.uniform(ks, minval=min_cover, maxval=1.0)
    ch, cw = h * f, w * f
    y0 = jax.random.uniform(ky) * (h - ch)
    x0 = jax.random.uniform(kx) * (w - cw)
    return warp_homography(
        img, crop_resize_matrix(y0, x0, ch, cw, out_hw), out_hw, fill=0.0
    )


def divisible_crop(img: jnp.ndarray, d: int) -> jnp.ndarray:
    """Center-crop H and W down to multiples of d (aug_utils.py:58-71)."""
    h, w = img.shape[-3], img.shape[-2]
    nh, nw = (h // d) * d, (w // d) * d
    y0, x0 = (h - nh) // 2, (w - nw) // 2
    return img[..., y0 : y0 + nh, x0 : x0 + nw, :]


def to_tensor_safe(img) -> jnp.ndarray:
    """PIL/ndarray/jnp -> float32 [H, W, C] in [0, 1] (aug_utils.py:74-81)."""
    import numpy as np

    arr = jnp.asarray(np.asarray(img), jnp.float32)
    if arr.max() > 1.5:  # uint8-ranged input
        arr = arr / 255.0
    if arr.ndim == 2:
        arr = arr[:, :, None]
    return arr


def borderless_random_perspective(
    key: jax.Array, img: jnp.ndarray, distortion_scale: float = 0.5,
) -> jnp.ndarray:
    """Perspective warp whose corners move only INWARD, so no fill border
    appears (aug_utils.py:84-149's purpose), then resampled full-frame."""
    h, w = img.shape[0], img.shape[1]
    half_h, half_w = h // 2, w // 2
    kx, ky = jax.random.split(key)
    dx = jax.random.uniform(kx, (4,)) * (distortion_scale * half_w)
    dy = jax.random.uniform(ky, (4,)) * (distortion_scale * half_h)
    corners = jnp.asarray(
        [[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], jnp.float32
    )
    signs = jnp.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], jnp.float32)
    inner = corners + signs * jnp.stack([dx, dy], axis=-1)
    # sample the INNER quad onto the full frame: out->in maps corners->inner
    m = perspective_matrix(inner, corners)
    return warp_homography(img, m, (h, w), fill=0.0)
