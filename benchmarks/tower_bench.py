"""ViT-B/32 tower f+b microbenchmark: isolate the guidance tower's cost.

The guided step's FLOP split is warp 48% / ViT 44% / denoiser 8.5%
(RESULTS.md r4) and the ViT runs at ~15% of bf16 peak. This bench times
ONLY the tower under the exact remat regime the guidance chunk uses —
value_and_grad w.r.t. the input images of a mean-embedding loss through
``jax.checkpoint(encode)`` — so remat-policy variants can be compared
in isolation (full guided runs take ~100 s each; this takes ~2 s warm):

* policy=views    — replay the whole tower forward in backward (r4 default)
* policy=dots     — save every dot_general output; elementwise-only replay
* policy=none     — no checkpoint: store all residuals (memory permitting)

Prints one JSON line per policy with ms/iter and achieved TFLOP/s.
Run exclusively (one TPU process). Reference analog: the per-view CLIP
encode+backward inside the guided hot loop (SinDDM/models.py:368-427).
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--views", type=int, default=128,
                    help="tower batch = sample batch x view_chunk "
                         "(bench default 16 x 8)")
    ap.add_argument("--res", type=int, default=224)
    ap.add_argument("--clip_dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--policies", nargs="+",
                    default=["views", "dots", "none"])
    ap.add_argument("--iters", type=int, default=10)
    ap.add_argument("--attn_impl", default="einsum",
                    choices=["einsum", "skip"],
                    help="'skip' drops the softmax(qk^T)v math entirely "
                         "(numerically wrong) — the einsum-vs-skip delta "
                         "upper-bounds any fused-attention win (VERDICT "
                         "r4 weak #3 / next #2)")
    args = ap.parse_args()

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sinddm_tpu.models.clip.model import VIT_B_32, clip_normalize
    from sinddm_tpu.models.clip.convert import random_clip_params
    from sinddm_tpu.utils.flops import mfu_fields, vit_b32_flops

    cfg = dataclasses.replace(
        VIT_B_32,
        compute_dtype=None if args.clip_dtype == "float32" else args.clip_dtype,
        attn_impl=args.attn_impl,
    )
    model, variables = random_clip_params(cfg, seed=0)

    B, R = args.views, args.res
    x = jnp.clip(
        jax.random.uniform(jax.random.PRNGKey(0), (B, R, R, 3)), 0, 1
    )

    # f+b = 3x fwd (MFU convention); the remat re-forward is NOT counted,
    # so 'views' reports lower achieved TFLOP/s for the same hardware work
    flops_fb = 3 * vit_b32_flops((R, R)) * B

    def make_fn(policy):
        # the tower weights are a TRACED argument: closing over them bakes
        # ~600 MB of constants into the HLO, which the remote compile
        # service rejects (HTTP 413) — same rule as embed_image_views
        def encode(xx, tower):
            emb = model.apply(
                tower, clip_normalize(xx), method=model.encode_image
            )
            return (emb / jnp.linalg.norm(emb, axis=-1, keepdims=True)).mean()

        if policy == "views":
            pol = jax.checkpoint_policies.save_only_these_names(
                "warp_out", "clip_views", "vit_patches"
            )
            encode = jax.checkpoint(encode, policy=pol)
        elif policy == "dots":
            pol = jax.checkpoint_policies.save_from_both_policies(
                jax.checkpoint_policies.save_only_these_names(
                    "warp_out", "clip_views", "vit_patches"
                ),
                jax.checkpoint_policies.dots_saveable,
            )
            encode = jax.checkpoint(encode, policy=pol)
        elif policy != "none":
            raise SystemExit(f"unknown policy {policy}")
        return jax.jit(jax.grad(encode))

    for policy in args.policies:
        fn = make_fn(policy)
        try:
            g = fn(x, variables)
            float(g.sum())  # sync (block_until_ready returns at enqueue)
        except Exception as e:  # OOM etc. — record and continue
            print(json.dumps({
                "metric": "vit_tower_fb", "policy": policy,
                "views": B, "clip_dtype": args.clip_dtype,
                "error": f"{type(e).__name__}: {str(e)[:200]}",
            }))
            continue
        t0 = time.time()
        for _ in range(args.iters):
            g = fn(x, variables)
        float(g.sum())
        dt = (time.time() - t0) / args.iters
        print(json.dumps({
            "metric": "vit_tower_fb", "policy": policy,
            "views": B, "res": R, "clip_dtype": args.clip_dtype,
            "attn_impl": args.attn_impl,
            "ms_per_iter": round(dt * 1000, 1),
            **mfu_fields(flops_fb, dt),
        }))


if __name__ == "__main__":
    main()
