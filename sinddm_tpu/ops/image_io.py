"""Host-side image IO helpers (grids, PNG save) — outside jit.

Replaces the reference's torchvision ``utils.save_image`` calls
(``trainer.py:221,279`` etc.): images are float arrays in [0, 1] (callers
denormalize from [-1, 1]), arranged into an nrow-column grid with 2px
padding, exactly torchvision's default layout.
"""

from __future__ import annotations

import os
from pathlib import Path
from typing import Union

import numpy as np
from PIL import Image


def to_uint8(img01: np.ndarray) -> np.ndarray:
    return np.clip(np.asarray(img01) * 255.0 + 0.5, 0, 255).astype(np.uint8)


def make_grid(batch01: np.ndarray, nrow: int = 4, padding: int = 2) -> np.ndarray:
    """[B, H, W, C] in [0,1] -> grid [H', W', C] in [0,1]."""
    batch01 = np.asarray(batch01)
    b, h, w, c = batch01.shape
    ncol = min(nrow, b)
    nrows = (b + ncol - 1) // ncol
    grid = np.zeros(
        (padding + nrows * (h + padding), padding + ncol * (w + padding), c),
        dtype=batch01.dtype,
    )
    for i in range(b):
        r, col = divmod(i, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y : y + h, x : x + w] = batch01[i]
    return grid


def save_image(img01: np.ndarray, path: Union[str, Path], nrow: int = 4) -> None:
    """Save [B,H,W,C] (as a grid) or [H,W,C] image in [0,1] to PNG.

    Multi-host: a no-op on every process but 0 — sampled arrays are
    global, exactly one process owns the PNG artifacts
    (parallel/distributed.py)."""
    import jax

    if jax.process_index() != 0:
        return
    img01 = np.asarray(img01)
    if img01.ndim == 4:
        img01 = make_grid(img01, nrow=nrow)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    Image.fromarray(to_uint8(img01)).save(path)


def save_interm_frames(
    frames: np.ndarray,
    out_dir: Union[str, Path],
    *,
    s: int,
    t_min: int = 0,
) -> None:
    """Dump a per-step frame stack in the reference's ``save_interm`` layout.

    ``frames``: [n_steps, B, H, W, 3] in [-1, 1], t DESCENDING (the
    ``lax.scan`` order) — written as ``output_t-{t:03}_s-{s}.png`` grids
    under ``out_dir`` (reference models.py:480-486,540-546 saves one
    grid per reverse step, t counting down to ``t_min``).
    """
    frames = np.asarray(frames)
    n_steps = frames.shape[0]
    out_dir = Path(out_dir)
    for j in range(n_steps):
        t_val = t_min + n_steps - 1 - j
        save_image(
            (frames[j] + 1.0) * 0.5,
            out_dir / f"output_t-{t_val:03d}_s-{s}.png",
        )
