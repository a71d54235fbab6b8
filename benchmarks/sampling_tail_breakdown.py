"""Per-step cost breakdown of the finest sampling scales (VERDICT r4 #5/#4).

The 2.08 s bf16 headline spends 1.32 s in the finest two scales (s3
0.56 s / 55 steps/s, s4 0.76 s / 29 steps/s) at 24% of bf16 peak, but no
one has said WHERE a via-scale step goes: denoiser conv forward, posterior
algebra (predict_start + reblur mix + omega posterior + noise), the
inter-scale resize, or scan/dispatch fixed cost. This measures each by
construction (no trace parsing):

* ``fwd``      — the jitted denoiser forward alone at the scale's canvas
                 (its MFU = how well the convs map to the MXU);
* ``algebra``  — the same reverse scan with the denoiser replaced by
                 identity (posterior math + RNG + carries, zero conv);
* ``step``     — the real fused via-scale scan, per step;
* ``resize``   — the prev-scale -> canvas bilinear resize (once/scale);
* residual ``step - fwd - algebra`` — fusion overlap (negative) or
  scan/dispatch overhead (positive).

Decision rule (VERDICT r4 next #4): if fwd >= ~70% of the step, the
headline tail is conv-bound and 2.08 s is the chip's answer for this
program; otherwise the gap is addressable. Prints one JSON line per
scale. Run exclusively (one TPU process). Reference analog: the via-scale
hot loop, /root/reference/SinDDM/models.py:501-547.
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scales", type=int, nargs="+", default=[3, 4])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--scan_reps", type=int, default=3)
    ap.add_argument("--out", default="benchmarks/sampling_tail_breakdown.jsonl")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from sinddm_tpu import build_pyramid, make_schedules
    from sinddm_tpu.apps.sampling import (
        jit_sample_scale0,
        jit_sample_via_scale,
        via_scale_size,
    )
    from sinddm_tpu.diffusion.core import sample_via_scale
    from sinddm_tpu.models import SinDDMNet
    from sinddm_tpu.ops import resize_bilinear
    from sinddm_tpu.utils.flops import denoiser_flops_per_pixel, mfu_fields

    pyr = build_pyramid("/root/reference/datasets/balloons/balloons.png")
    sched = make_schedules(
        timesteps=100, scale_losses=pyr.rescale_losses, n_scales=pyr.n_scales
    )
    dt_ = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    model = SinDDMNet(dim=160, compute_dtype=dt_)
    key = jax.random.PRNGKey(0)
    h0, w0 = pyr.sizes_hw[0]
    B = args.batch
    params = model.init(
        key, jnp.zeros((1, h0, w0, 3)), jnp.zeros((1,), jnp.int32),
        jnp.asarray(0.0),
    )["params"]
    t_list = list(sched.num_timesteps_ideal[1:])
    per_px = denoiser_flops_per_pixel(160)

    def sync(x):
        float(jnp.sum(x))

    def timeit(fn, n):
        fn()  # warm (compile)
        sync_out = fn()
        sync(sync_out)
        t0 = time.time()
        for _ in range(n):
            out = fn()
        sync(out)
        return (time.time() - t0) / n

    # warm chain state: run scales 0..s-1 once to get prev at each scale
    prev, _, _ = jit_sample_scale0(
        model, params, sched, jax.random.PRNGKey(1), (B, h0, w0, 3), 0, 0, 0.0
    )
    prevs = {1: prev}
    for s in range(1, pyr.n_scales):
        size_hw = via_scale_size(
            pyr.sizes_hw, s=s, n_scales=pyr.n_scales,
            scale_factor=pyr.scale_factor, custom_sample=True,
            custom_img_size_idx=s,
        )
        x, _, _ = jit_sample_via_scale(
            model, params, sched, prevs[s], jax.random.PRNGKey(2), size_hw,
            s, int(t_list[s - 1]), 0, True, 0.0,
        )
        prevs[s + 1] = x
    sync(prevs[max(prevs)])

    # identity "denoiser": same reverse scan, zero conv work
    @functools.partial(jax.jit, static_argnames=("size_hw", "s", "total_t"))
    def algebra_scan(prev_img, key, size_hw, s, total_t):
        img_prev = resize_bilinear(prev_img, size_hw)
        x, _, _ = sample_via_scale(
            lambda xx, tt, ss: xx, sched, img_prev, key,
            s=s, total_t=total_t, t_min=0, reblurring=True, omega=0.0,
        )
        return x

    for s in args.scales:
        steps = int(t_list[s - 1])
        size_hw = via_scale_size(
            pyr.sizes_hw, s=s, n_scales=pyr.n_scales,
            scale_factor=pyr.scale_factor, custom_sample=True,
            custom_img_size_idx=s,
        )
        H, W = size_hw
        prev_img = prevs[s]

        # 1) denoiser forward alone at the canvas
        x_in = jnp.zeros((B, H, W, 3), jnp.float32)
        t_in = jnp.full((B,), steps // 2, jnp.int32)

        @jax.jit
        def fwd(x, t):
            return model.apply({"params": params}, x, t,
                               jnp.asarray(float(s)))

        fwd_s = timeit(lambda: fwd(x_in, t_in), args.iters)
        fwd_flops = B * H * W * per_px
        fwd_mfu = mfu_fields(fwd_flops, fwd_s)

        # 2) real fused scan, per step
        def real():
            x, _, _ = jit_sample_via_scale(
                model, params, sched, prev_img, jax.random.PRNGKey(3),
                size_hw, s, steps, 0, True, 0.0,
            )
            return x

        step_s = timeit(real, args.scan_reps) / steps

        # 3) algebra-only scan, per step
        def alg():
            return algebra_scan(prev_img, jax.random.PRNGKey(3), size_hw,
                                s, steps)

        alg_s = timeit(alg, args.scan_reps) / steps

        # 4) the inter-scale resize alone
        rs = jax.jit(lambda p: resize_bilinear(p, size_hw))
        resize_s = timeit(lambda: rs(prev_img), args.iters)

        residual = step_s - fwd_s - alg_s
        rec = {
            "metric": "sampling_tail_breakdown",
            "scale": s,
            "canvas_hw": [H, W],
            "batch": B,
            "dtype": args.dtype,
            "steps": steps,
            "ms_step": round(step_s * 1000, 3),
            "ms_fwd": round(fwd_s * 1000, 3),
            "ms_algebra": round(alg_s * 1000, 3),
            "ms_residual": round(residual * 1000, 3),
            "ms_resize_once_per_scale": round(resize_s * 1000, 3),
            "fwd_frac_of_step": round(fwd_s / step_s, 3),
            "algebra_frac_of_step": round(alg_s / step_s, 3),
            "fwd_mfu": fwd_mfu,
        }
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
