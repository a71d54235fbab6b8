"""Does HIGH-precision warp matmul change the guidance direction?

warp_variants_r3.jsonl shows Precision.HIGH cuts warp f+b 170->123 ms
per 64-view chunk but carries ~5% max-elementwise gradient error vs the
fp32-exact path (it lowers to a single-pass bf16 product on this
backend). The guidance update never uses raw gradient magnitudes: it
thresholds by energy quantile and norm-matches the step
(reference SinDDM/models.py:406-412), so the DIRECTION is what matters.

This script computes the full guided-step gradient (calculate_clip_loss
through the ViT-B/32-shape tower, batch 16, 16 views) twice — warp at
HIGHEST and at HIGH — with identical RNG, and reports:

  * cosine similarity of the two gradients (global and per-image worst),
  * thresholded_grad mask IoU at quantile 0.9 (clip_content runs at
    quantile 0, where the mask is everything),
  * warm full-step ms for both, the actual end-to-end lever.

One process, ~2 extra remote compiles. Run exclusively.
"""

from __future__ import annotations

import os as _os, sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _REPO)

import argparse
import dataclasses
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--n_aug", type=int, default=16)
    ap.add_argument("--view_chunk", type=int, default=4)
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--force_cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sinddm_tpu import build_pyramid
    from sinddm_tpu.guidance.clip_extractor import ClipExtractor
    from sinddm_tpu.guidance.clip_guidance import thresholded_grad
    from sinddm_tpu.models.clip.convert import random_clip_params
    from sinddm_tpu.models.clip.model import VIT_B_32
    from sinddm_tpu.ops import warp as Wmod

    pyr = build_pyramid("/root/reference/datasets/balloons/balloons.png")
    H, W = pyr.sizes_hw[-1]
    B = args.batch

    cfg = dataclasses.replace(VIT_B_32, compute_dtype="bfloat16")
    clip_model, clip_vars = random_clip_params(cfg, seed=0)
    extractor = ClipExtractor(
        clip_model, clip_vars, n_aug=args.n_aug, view_chunk=args.view_chunk,
    )

    key = jax.random.PRNGKey(0)
    x01 = jax.random.uniform(key, (B, H, W, 3))
    text_emb = jax.random.normal(key, (14, cfg.embed_dim))

    def sync(v):
        return float(jnp.asarray(v).sum())

    def run(precision):
        Wmod._MM_PRECISION = precision

        @jax.jit
        def full_fb(x, variables):
            def loss(xx):
                return extractor.calculate_clip_loss(
                    xx, text_emb, jax.random.PRNGKey(7), variables=variables
                )
            return jax.grad(loss)(x)

        g = full_fb(x01, clip_vars)
        sync(g)  # warm
        ts = []
        for _ in range(args.repeats):
            t0 = time.time()
            sync(full_fb(x01, clip_vars))
            ts.append(time.time() - t0)
        return np.asarray(g), float(np.median(ts)) * 1000.0

    g_hi, ms_hi = run("highest")
    print(f"highest: {ms_hi:.1f} ms/step", file=_sys.stderr)
    g_lo, ms_lo = run("high")
    print(f"high:    {ms_lo:.1f} ms/step", file=_sys.stderr)

    def cos(a, b):
        a, b = a.reshape(-1), b.reshape(-1)
        return float(
            np.dot(a, b)
            / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-30)
        )

    per_img = [cos(g_hi[i], g_lo[i]) for i in range(B)]

    # mask agreement of the sparse guidance support at a harsh quantile
    # (clip_content itself runs at quantile 0 = dense mask)
    ious = []
    for q in (0.5, 0.9):
        _, m_hi = thresholded_grad(jnp.asarray(g_hi), quantile=q)
        _, m_lo = thresholded_grad(jnp.asarray(g_lo), quantile=q)
        m_hi = np.asarray(m_hi) > 0
        m_lo = np.asarray(m_lo) > 0
        inter = float(np.logical_and(m_hi, m_lo).sum())
        union = float(np.logical_or(m_hi, m_lo).sum())
        ious.append({"quantile": q, "iou": inter / max(union, 1.0)})

    out = {
        "metric": "warp_high_guidance_eval",
        "batch": B, "n_aug": args.n_aug, "view_chunk": args.view_chunk,
        "canvas_hw": [H, W],
        "full_fb_ms_highest": round(ms_hi, 1),
        "full_fb_ms_high": round(ms_lo, 1),
        "grad_cosine_global": cos(g_hi, g_lo),
        "grad_cosine_worst_image": min(per_img),
        "mask_iou": ious,
        "max_abs_rel_diff": float(
            np.max(np.abs(g_hi - g_lo)) / np.max(np.abs(g_hi))
        ),
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
