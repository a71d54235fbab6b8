"""Where does the guided-step cost go? Tower vs warp-VJP vs denoiser.

The round-3 guided measurements show 4.19 s per guided timestep at
batch 16 / 16 views / ViT-B/32, *independent of the tower dtype*
(fp32 600.5 s vs bf16 599.5 s end-to-end) — so the MXU matmuls are not
the bottleneck. This script times the three candidate cost centers in
isolation on the chip (warm, scalar-synced):

  tower_fb   — grad of sum(encode_image(views)) wrt fixed view tensors
               (pure ViT forward+backward, no warps), one view-chunk's
               load [B*c, 224, 224, 3];
  warp_fb    — grad through augment_views_subset alone (the composed
               homography warp + color pipeline and its scatter-add VJP),
               same load, no tower;
  full_fb    — grad of calculate_clip_loss wrt x01 (everything: warps,
               tower, cosine loss) at B=16, n_aug=16, view_chunk=4;
  denoiser   — one denoiser forward at the finest balloons scale,
               batch 16 (the non-guidance part of a guided step).

Prints one JSON line with per-piece warm ms and the implied shares.
Run exclusively (one TPU process); ~4 remote compiles.
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
    ap.add_argument("--clip_dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--mm_adjoint", action="store_true",
                    help="matmul image-adjoint for the view warps instead "
                         "of autodiff's sort-based scatter")
    ap.add_argument("--no_save_views", action="store_true",
                    help="disable the remat policy that keeps the view "
                         "tensors as residuals (i.e. re-run the warp in "
                         "the backward replay, the pre-round-3 behavior)")
    ap.add_argument("--force_cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sinddm_tpu import build_pyramid
    from sinddm_tpu.guidance.clip_extractor import (
        ClipExtractor,
        augment_views_subset,
        resize_output_size,
    )
    from sinddm_tpu.models import SinDDMNet
    from sinddm_tpu.models.clip.convert import random_clip_params
    from sinddm_tpu.models.clip.model import VIT_B_32, clip_normalize

    pyr = build_pyramid("/root/reference/datasets/balloons/balloons.png")
    H, W = pyr.sizes_hw[-1]  # finest scale canvas (the costliest guided one)
    B, n_aug, c = args.batch, args.n_aug, args.view_chunk
    ch, cw = resize_output_size(H, W)

    cfg = dataclasses.replace(
        VIT_B_32,
        compute_dtype=None if args.clip_dtype == "float32" else args.clip_dtype,
    )
    clip_model, clip_vars = random_clip_params(cfg, seed=0)
    extractor = ClipExtractor(
        clip_model, clip_vars, n_aug=n_aug, view_chunk=c,
        mm_adjoint=args.mm_adjoint, save_views=not args.no_save_views,
    )

    key = jax.random.PRNGKey(0)
    x01 = jax.random.uniform(key, (B, H, W, 3))
    views_fixed = jax.random.uniform(key, (B * c, ch, cw, 3))
    text_emb = jax.random.normal(key, (14, cfg.embed_dim))

    def sync(v):
        return float(jnp.asarray(v).sum())

    def timeit(fn, *a):
        sync(fn(*a))  # compile + warm
        ts = []
        for _ in range(args.repeats):
            t0 = time.time()
            sync(fn(*a))
            ts.append(time.time() - t0)
        return float(np.median(ts)) * 1000.0

    out = {
        "metric": "guided_cost_breakdown",
        "batch": B, "n_aug": n_aug, "view_chunk": c,
        "clip_dtype": args.clip_dtype, "canvas_hw": [H, W],
        "view_hw": [ch, cw], "mm_adjoint": bool(args.mm_adjoint),
        "save_views": not args.no_save_views,
    }

    # ---- tower-only forward+backward on one chunk's view load -----------
    @jax.jit
    def tower_fb(v, variables):
        def loss(vv):
            e = clip_model.apply(
                variables, clip_normalize(vv),
                method=clip_model.encode_image,
            )
            return jnp.sum(e)
        return jax.grad(loss)(v)

    out["tower_fb_chunk_ms"] = round(
        timeit(tower_fb, views_fixed, clip_vars), 1
    )
    print(f"tower f+b [{B*c},{ch},{cw}]: {out['tower_fb_chunk_ms']} ms",
          file=_sys.stderr)

    # ---- warp-only forward+backward, same load ---------------------------
    idc = jnp.arange(c)
    kmat = jax.vmap(lambda k: jax.random.split(k, 2 * n_aug))(
        jax.random.split(key, B)
    )
    kcs, kas = kmat[:, :c], kmat[:, n_aug:n_aug + c]

    @jax.jit
    def warp_fb(x):
        def loss(xx):
            views = jax.vmap(
                lambda img, kcb, kab: augment_views_subset(
                    kcb, kab, idc, img, 1.0, mm_adjoint=args.mm_adjoint
                )
            )(xx, kcs, kas)
            return jnp.sum(views * views)
        return jax.grad(loss)(x)

    out["warp_fb_chunk_ms"] = round(timeit(warp_fb, x01), 1)
    print(f"warp f+b  [{B},{c} views]: {out['warp_fb_chunk_ms']} ms",
          file=_sys.stderr)

    @jax.jit
    def warp_fwd(x):
        views = jax.vmap(
            lambda img, kcb, kab: augment_views_subset(
                kcb, kab, idc, img, 1.0, mm_adjoint=args.mm_adjoint
            )
        )(x, kcs, kas)
        return jnp.sum(views * views)

    out["warp_fwd_chunk_ms"] = round(timeit(warp_fwd, x01), 1)
    out["warp_bwd_chunk_ms"] = round(
        out["warp_fb_chunk_ms"] - out["warp_fwd_chunk_ms"], 1
    )
    print(f"warp fwd  [{B},{c} views]: {out['warp_fwd_chunk_ms']} ms "
          f"(=> bwd ~{out['warp_bwd_chunk_ms']} ms)", file=_sys.stderr)

    # gather-only forward (no color pipeline): same view count/shapes,
    # fixed homographies — isolates the bilinear gather from the
    # jitter/grayscale color ops inside the 'warp fwd' number
    from sinddm_tpu.ops import warp as Wmod

    mats = jnp.tile(
        jnp.asarray(
            [[0.83, 0.02, 1.0], [-0.02, 0.83, 2.0], [1e-5, -1e-5, 1.0]]
        )[None],
        (B * c, 1, 1),
    )

    @jax.jit
    def gather_fwd(x):
        imgs = jnp.repeat(x, c, axis=0)  # [B*c, H, W, 3]
        views = jax.vmap(
            lambda img, m: Wmod.warp_homography(img, m, (ch, cw), fill=1.0)
        )(imgs, mats)
        return jnp.sum(views * views)

    out["gather_fwd_chunk_ms"] = round(timeit(gather_fwd, x01), 1)
    print(f"gather-only fwd [{B*c} views]: {out['gather_fwd_chunk_ms']} ms",
          file=_sys.stderr)

    # ---- full guidance loss f+b (all n_aug views, chunked) ---------------
    @jax.jit
    def full_fb(x, variables):
        def loss(xx):
            return extractor.calculate_clip_loss(
                xx, text_emb, jax.random.PRNGKey(7), variables=variables
            )
        return jax.grad(loss)(x)

    out["full_fb_step_ms"] = round(timeit(full_fb, x01, clip_vars), 1)
    print(f"full guidance f+b ({n_aug} views): {out['full_fb_step_ms']} ms",
          file=_sys.stderr)

    # ---- denoiser forward at the same scale ------------------------------
    model = SinDDMNet(dim=160)
    params = model.init(
        key, jnp.zeros((1, H, W, 3)), jnp.zeros((1,), jnp.int32),
        jnp.asarray(0.0),
    )["params"]

    @jax.jit
    def denoise(p, x):
        return model.apply(
            {"params": p}, x,
            jnp.full((B,), 5, jnp.int32), jnp.asarray(4.0),
        )

    out["denoiser_fwd_ms"] = round(timeit(denoise, params, x01), 1)
    print(f"denoiser fwd [{B},{H},{W}]: {out['denoiser_fwd_ms']} ms",
          file=_sys.stderr)

    n_chunks = n_aug // c
    tower_all = out["tower_fb_chunk_ms"] * n_chunks
    warp_all = out["warp_fb_chunk_ms"] * n_chunks
    out["tower_fb_all_chunks_ms"] = round(tower_all, 1)
    out["warp_fb_all_chunks_ms"] = round(warp_all, 1)
    out["unexplained_ms"] = round(
        out["full_fb_step_ms"] - tower_all - warp_all, 1
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
