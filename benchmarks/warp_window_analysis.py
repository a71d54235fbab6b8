"""Measure source-window extents of the guidance view homographies.

The matmul warp (ops/warp.py) spends 2*N*H*W FLOPs per channel because the
soft-one-hot A [N, H] / B [N, W] matrices address the WHOLE source image.
But each small tile of output pixels only touches a small window of source
rows/cols: an output x-run of T pixels maps to a source segment whose
y-extent is |dy/dx|*T and x-extent |dx/dx|*T (plus the 2-tap bilinear
footprint). This script Monte-Carlo-bounds those extents over the REAL
augmentation distribution (crop U(0.6,1) x hflip x affine(+-15deg, t 0.1)
x perspective(0.4) — clip_extractor._augs_matrix_and_color) at the bench
shape (balloons finest canvas -> 224x299 view frame), to pick static
window sizes for the windowed warp kernel.

Two tilings are measured:

* ``--flat`` (the shipped kernel's tiling, ops/pallas_warp.py): tiles are
  TQ-runs of the row-major FLATTENED pixel stream, so a tile may straddle
  output rows — each row jump adds ~|dy/dy_out| to the y-span. This is
  what the windowed kernel's WY bound must cover.
* row-aligned x-runs (default): tiles never span output rows, padded at
  row ends — the tighter bound, at the cost of x-padding overhead.

Measured (balloons finest 186x248 -> 224x299 frame, n=20000):
row tile=128: y-span 69.1  | tile=256: y-span 113.1
flat TQ=512:  max y-span 133.3 -> a single WY=128 window does NOT cover
the tail (needs span <= WY-2-7 = 119 after floor/bilinear/8-alignment
slack); the windowed kernel therefore runs a second pl.when-guarded
window for overflow tiles. --hist reports how often that branch fires.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src_h", type=int, default=186)
    ap.add_argument("--src_w", type=int, default=248)
    ap.add_argument("--tile", type=int, default=128)
    ap.add_argument("--n", type=int, default=20000)
    ap.add_argument("--flat", action="store_true",
                    help="tile the row-major FLATTENED stream (kernel tiling)")
    args = ap.parse_args()

    jax.config.update("jax_platforms", "cpu")

    from sinddm_tpu.guidance.clip_extractor import (
        _augs_matrix_and_color,
        resize_output_size,
    )
    from sinddm_tpu.ops import warp as W

    h, w = args.src_h, args.src_w
    ch, cw = resize_output_size(h, w)
    print(f"src {h}x{w} frame {ch}x{cw} tile {args.tile}", file=sys.stderr)

    ys, xs = jnp.meshgrid(
        jnp.arange(ch, dtype=jnp.float32),
        jnp.arange(cw, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    grid = jnp.stack([xs, ys, ones], axis=-1)  # [ch, cw, 3]

    T = args.tile
    n_tx = -(-(ch * cw) // T) if args.flat else -(-cw // T)

    def one(key):
        kc, ka = jax.random.split(key)
        # crop stage (view i>0): scale U(0.6, 1)
        s = jax.random.uniform(kc, minval=0.6, maxval=1.0)
        crop_h = jnp.floor(h * s)
        crop_w = jnp.floor(w * s)
        ky, kx = jax.random.split(jax.random.fold_in(kc, 1))
        y0 = jnp.floor(jax.random.uniform(ky) * (h - crop_h + 1))
        x0 = jnp.floor(jax.random.uniform(kx) * (w - crop_w + 1))
        crop = W.crop_resize_matrix(y0, x0, crop_h, crop_w, (ch, cw))
        m_augs, _ = _augs_matrix_and_color(ka, (ch, cw))
        m = crop @ m_augs

        src = grid @ m.T
        z = src[..., 2:3]
        src = src[..., :2] / jnp.maximum(jnp.abs(z), 1e-8) * jnp.sign(z)
        sx, sy = src[..., 0], src[..., 1]
        if args.flat:
            # the kernel's tiling: TQ-runs of the flattened stream,
            # zero-pad tail (clipped to valid range below, span-neutral
            # as long as (0,0) is inside the clip box — it is)
            pad = n_tx * T - ch * cw
            sx = jnp.pad(sx.reshape(-1), (0, pad), mode="edge").reshape(-1, T)
            sy = jnp.pad(sy.reshape(-1), (0, pad), mode="edge").reshape(-1, T)
        else:
            # pad x to tile multiple with edge values (span-neutral)
            pad = n_tx * T - cw
            sx = jnp.pad(sx, ((0, 0), (0, pad)), mode="edge")
            sy = jnp.pad(sy, ((0, 0), (0, pad)), mode="edge")
            sx = sx.reshape(ch * n_tx, T)
            sy = sy.reshape(ch * n_tx, T)
        # extents of IN-BOUNDS-relevant coords only: out-of-image taps
        # contribute nothing, so clip to the valid coordinate range first
        sx = jnp.clip(sx, -1.0, w * 1.0)
        sy = jnp.clip(sy, -1.0, h * 1.0)
        spans_y = jnp.max(sy, 1) - jnp.min(sy, 1)
        y_span = jnp.max(spans_y)
        x_span = jnp.max(jnp.max(sx, 1) - jnp.min(sx, 1))
        # fraction of tiles whose taps overflow one 8-aligned WY=128
        # window (the windowed kernel's second-matmul branch fires)
        over = jnp.mean((spans_y > 128.0 - 2.0 - 7.0).astype(jnp.float32))
        return y_span, x_span, over

    batch = 500
    fn = jax.jit(jax.vmap(one))
    y_max, x_max = 0.0, 0.0
    over_sum = 0.0
    n_rounds = args.n // batch
    for i in range(n_rounds):
        keys = jax.random.split(jax.random.PRNGKey(1000 + i), batch)
        ysp, xsp, over = fn(keys)
        y_max = max(y_max, float(ysp.max()))
        x_max = max(x_max, float(xsp.max()))
        over_sum += float(over.mean())
    # +2 for the 2-tap bilinear footprint and floor alignment
    print(
        f"tile={T}{' flat' if args.flat else ''}: max y-span {y_max:.1f} "
        f"(window >= {int(np.ceil(y_max))+2}), max x-span {x_max:.1f}, "
        f"tiles overflowing one 8-aligned WY=128 window: "
        f"{100.0 * over_sum / n_rounds:.2f}%"
    )


if __name__ == "__main__":
    main()
