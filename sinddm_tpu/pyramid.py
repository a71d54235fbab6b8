"""Multi-scale image pyramid construction.

Behavioral spec from the reference ``SinDDM/functions.py:130-192``
(`create_img_scales`):

* the training image is capped at ``auto_scale`` pixels (50,000 by default,
  reference ``main.py:74``),
* the scale-0 short side is chosen so the denoiser receptive field covers
  ~40% of the scale-0 area (``area_scale_0 = 3110``), clamped to [42, 55]
  (reference ``functions.py:160-166``),
* ``n_scales`` is solved from the requested scale factor and the exact
  factor is re-derived so the pyramid lands exactly on the full size
  (reference ``functions.py:169-170``),
* each scale is a LANCZOS downsample of the *original* image; each
  "recon" image is a BILINEAR upsample of scale i to scale i+1's size
  (reference ``functions.py:172-190``),
* ``rescale_losses[i] = ||down(i+1) - up(down(i))||_F / npix``. The
  reference computes the difference with ``np.subtract`` on PIL images,
  i.e. **uint8 arithmetic with wraparound** (reference
  ``functions.py:186``). This quirk is load-bearing: it produces the
  published per-scale starting timesteps (e.g. [100, 52, 41, 31, 22] for
  'balloons'), so we replicate it bit-exactly by default and expose
  ``exact_diff=True`` for the mathematically-true float difference.

Images are held as float32 NHWC arrays in [-1, 1] (TPU-friendly layout);
sizes are reported as (H, W) — the reference keeps PIL (W, H) and flips at
the diffusion constructor (``SinDDM/models.py:222-223``); we flip once here.
"""

from __future__ import annotations

import dataclasses
import os
from pathlib import Path
from typing import List, Optional, Tuple

import numpy as np
from PIL import Image

AREA_SCALE_0 = 3110  # ~40% receptive-field coverage for rf_net = 35
SCALE_0_DIM_MIN = 42
SCALE_0_DIM_MAX = 55
DEFAULT_AUTO_SCALE = 50000
DEFAULT_SCALE_FACTOR = 1.411


def _to_pm1(img: Image.Image) -> np.ndarray:
    """PIL RGB -> float32 HWC in [-1, 1]."""
    arr = np.asarray(img.convert("RGB"), dtype=np.float32) / 255.0
    return arr * 2.0 - 1.0


@dataclasses.dataclass(frozen=True)
class Pyramid:
    """Immutable pyramid of one training image.

    Attributes:
      sizes_hw: per-scale (H, W), coarse -> fine.
      sizes_wh: per-scale (W, H) as the reference reports them.
      images: per-scale float32 [H, W, 3] in [-1, 1] (LANCZOS downsamples).
      recon_images: for s >= 1, the BILINEAR upsample of scale s-1 to scale
        s's size, float32 [H, W, 3] in [-1, 1]. recon_images[0] is the
        scale-0 image itself (the reference duplicates scale 0 as a
        clean/clean pair, ``trainer.py:131-132``).
      rescale_losses: per-scale-transition upsampling error (n_scales - 1).
      scale_factor: the exact re-derived factor.
      n_scales: number of scales.
    """

    sizes_hw: Tuple[Tuple[int, int], ...]
    sizes_wh: Tuple[Tuple[int, int], ...]
    images: Tuple[np.ndarray, ...]
    recon_images: Tuple[np.ndarray, ...]
    rescale_losses: Tuple[float, ...]
    scale_factor: float
    n_scales: int

    def save(self, folder: str, filename: str) -> None:
        """Write scale_i/ and scale_i_recon/ dirs (reference on-disk layout)."""
        stem = filename.rsplit(".", 1)[0] + ".png"
        for i in range(self.n_scales):
            d = Path(folder) / f"scale_{i}"
            d.mkdir(parents=True, exist_ok=True)
            _save_pm1(self.images[i], d / stem)
            if i > 0:
                dr = Path(folder) / f"scale_{i}_recon"
                dr.mkdir(parents=True, exist_ok=True)
                _save_pm1(self.recon_images[i], dr / stem)


def _save_pm1(arr: np.ndarray, path: Path) -> None:
    u8 = np.clip((arr + 1.0) * 0.5 * 255.0 + 0.5, 0, 255).astype(np.uint8)
    Image.fromarray(u8).save(path)


def compute_pyramid_geometry(
    image_size_wh: Tuple[int, int],
    scale_factor: float = DEFAULT_SCALE_FACTOR,
    auto_scale: Optional[int] = DEFAULT_AUTO_SCALE,
) -> Tuple[Tuple[int, int], List[Tuple[int, int]], float, int]:
    """Pure geometry: capped size, per-scale sizes (W, H), exact factor, n_scales.

    Mirrors reference ``functions.py:148-174``.
    """
    image_size = tuple(image_size_wh)
    if auto_scale is not None:
        scaler = np.sqrt((image_size[0] * image_size[1]) / auto_scale)
        if scaler > 1:
            image_size = (int(image_size[0] / scaler), int(image_size[1] / scaler))

    s_dim = min(image_size[0], image_size[1])
    l_dim = max(image_size[0], image_size[1])
    scale_0_dim = int(round(np.sqrt(AREA_SCALE_0 * s_dim / l_dim)))
    scale_0_dim = min(max(scale_0_dim, SCALE_0_DIM_MIN), SCALE_0_DIM_MAX)
    min_val_image = min(image_size[0], image_size[1])
    n_scales = int(round((np.log(min_val_image / scale_0_dim)) / np.log(scale_factor)) + 1)
    exact_factor = float(np.exp((np.log(min_val_image / scale_0_dim)) / (n_scales - 1)))

    sizes_wh = []
    for i in range(n_scales):
        sizes_wh.append(
            (
                int(round(image_size[0] / np.power(exact_factor, n_scales - i - 1))),
                int(round(image_size[1] / np.power(exact_factor, n_scales - i - 1))),
            )
        )
    return image_size, sizes_wh, exact_factor, n_scales


def build_pyramid(
    image_path: str,
    scale_factor: float = DEFAULT_SCALE_FACTOR,
    image_size_wh: Optional[Tuple[int, int]] = None,
    auto_scale: Optional[int] = DEFAULT_AUTO_SCALE,
    exact_diff: bool = False,
    save_to: Optional[str] = None,
) -> Pyramid:
    """Build the multi-scale pyramid of a single training image.

    Args:
      image_path: path to the training image.
      scale_factor: requested downscaling step (re-derived exactly).
      image_size_wh: optional forced (W, H) before auto_scale.
      auto_scale: max pixel count cap (None disables).
      exact_diff: if True, compute rescale losses with true float
        differences instead of the reference's uint8-wraparound arithmetic.
      save_to: if given, also write the reference-compatible on-disk layout
        (scale_i/, scale_i_recon/) into this folder.
    """
    orig_image = Image.open(image_path).convert("RGB")
    size_wh = image_size_wh if image_size_wh is not None else orig_image.size
    _, sizes_wh, exact_factor, n_scales = compute_pyramid_geometry(
        size_wh, scale_factor=scale_factor, auto_scale=auto_scale
    )

    downscaled: List[Image.Image] = []
    for i in range(n_scales):
        downscaled.append(orig_image.resize(sizes_wh[i], Image.LANCZOS))

    recons: List[Optional[Image.Image]] = [None]
    rescale_losses: List[float] = []
    for i in range(n_scales - 1):
        recon = downscaled[i].resize(sizes_wh[i + 1], Image.BILINEAR)
        recons.append(recon)
        if exact_diff:
            diff = np.asarray(downscaled[i + 1], dtype=np.float64) - np.asarray(
                recon, dtype=np.float64
            )
        else:
            # reference functions.py:186 — uint8 wraparound subtract.
            diff = np.subtract(downscaled[i + 1], recon)
        rescale_losses.append(float(np.linalg.norm(diff) / np.asarray(recon).size))

    images = tuple(_to_pm1(im) for im in downscaled)
    recon_images = (images[0],) + tuple(_to_pm1(im) for im in recons[1:])
    sizes_hw = tuple((h, w) for (w, h) in sizes_wh)

    pyr = Pyramid(
        sizes_hw=sizes_hw,
        sizes_wh=tuple(tuple(s) for s in sizes_wh),
        images=images,
        recon_images=recon_images,
        rescale_losses=tuple(rescale_losses),
        scale_factor=exact_factor,
        n_scales=n_scales,
    )
    if save_to is not None:
        pyr.save(save_to, os.path.basename(image_path))
    return pyr


def load_external_image(
    path: str, auto_scale: Optional[int] = DEFAULT_AUTO_SCALE
) -> np.ndarray:
    """Load an external (i2i / harmonization) image with the auto_scale cap.

    Mirrors reference ``trainer.py:290-298``. Returns float32 HWC in [-1, 1].
    """
    img = Image.open(path).convert("RGB")
    image_size = img.size
    if auto_scale is not None:
        scaler = np.sqrt((image_size[0] * image_size[1]) / auto_scale)
        if scaler > 1:
            image_size = (int(image_size[0] / scaler), int(image_size[1] / scaler))
            img = img.resize(image_size, Image.LANCZOS)
    return _to_pm1(img)
