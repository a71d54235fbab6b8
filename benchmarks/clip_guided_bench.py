"""CLIP-guided sampling benchmark at REAL ViT-B/32 scale (TPU).

VERDICT r2 missing #1: every guided number so far used the tiny CLIP
fixture; guided-mode *performance* needs no trained weights, so this
drives the full clip_content pipeline (16 augmented views per guided
timestep, forward+backward through a random-init ViT-B/32 —
reference workload: ``SinDDM/models.py:368-427`` +
``text2live_util/clip_extractor.py:134-147``) on 'balloons' and reports:

* cold wall-clock (compile-inclusive) and warm end-to-end wall-clock,
* the marginal per-guided-step cost vs an unguided run of the same
  t-list,
* knobs: --clip_dtype bfloat16 (MXU-rate tower, the analog of the
  reference's fp16 CLIP), --precompile, --batch, --n_aug.

One process per measurement series (remote-compile backend; see
.claude/skills/verify/SKILL.md). Prints one JSON line.
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
    ap.add_argument("--clip_dtype", default="float32",
                    choices=["float32", "bfloat16"])
    ap.add_argument("--precompile", action="store_true")
    ap.add_argument("--bucketed", action="store_true",
                    help="route via scales through the shape-bucketed "
                         "sampler (1 compile for all guided scales)")
    ap.add_argument("--view_chunk", type=int, default=4,
                    help="views encoded+differentiated per sequential "
                         "chunk (0 = all at once; OOMs at batch>=8)")
    ap.add_argument("--seg_len", type=int, default=0,
                    help="bucketed only: split each scale's chain into "
                         "device calls of <= seg_len steps (0 = one call; "
                         "the tunneled worker kills multi-minute calls)")
    ap.add_argument("--save_dots", action="store_true",
                    help="save dot_general outputs as remat residuals "
                         "(elementwise-only tower replay)")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--skip_unguided", action="store_true")
    ap.add_argument("--t_list", type=int, nargs="+", default=None,
                    help="override per-scale t budgets (smoke tests)")
    ap.add_argument("--force_cpu", action="store_true")
    ap.add_argument("--text", default="colorful hot air balloons at sunset")
    args = ap.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from sinddm_tpu import build_pyramid, make_schedules
    from sinddm_tpu.apps.clip_apps import clip_sampling
    from sinddm_tpu.apps.sampling import sample_scales
    from sinddm_tpu.guidance.clip_extractor import ClipExtractor
    from sinddm_tpu.models import SinDDMNet
    from sinddm_tpu.models.clip.convert import random_clip_params
    from sinddm_tpu.models.clip.model import VIT_B_32

    t0 = time.time()
    pyr = build_pyramid("/root/reference/datasets/balloons/balloons.png")
    sched = make_schedules(
        timesteps=100, scale_losses=pyr.rescale_losses, n_scales=pyr.n_scales
    )
    n = pyr.n_scales
    model = SinDDMNet(dim=160)
    import jax.numpy as jnp

    key = jax.random.PRNGKey(0)
    h0, w0 = pyr.sizes_hw[0]
    params = model.init(
        key, jnp.zeros((1, h0, w0, 3)), jnp.zeros((1,), jnp.int32),
        jnp.asarray(0.0),
    )["params"]
    cfg = dataclasses.replace(
        VIT_B_32,
        compute_dtype=None if args.clip_dtype == "float32" else args.clip_dtype,
    )
    clip_model, clip_vars = random_clip_params(cfg, seed=0)
    extractor = ClipExtractor(
        clip_model, clip_vars, n_aug=args.n_aug,
        view_chunk=args.view_chunk or None, save_dots=args.save_dots,
    )
    n_params = sum(x.size for x in jax.tree.leaves(clip_vars))
    print(
        f"setup {time.time()-t0:.1f}s  ViT-B/32 params={n_params/1e6:.1f}M "
        f"dtype={args.clip_dtype} devices={jax.devices()}",
        file=_sys.stderr,
    )

    t_list = (
        list(args.t_list)
        if args.t_list
        else list(sched.num_timesteps_ideal[1:])
    )
    # clip_content settings (reference main.py:163-174)
    guided_kwargs = dict(
        text_input=args.text,
        strength=0.3,
        sample_batch_size=args.batch,
        custom_t_list=t_list,
        guidance_sub_iters=[0] + [1] * (n - 1),
        quantile=0.7,  # fill_factor 0.3
        llambda=0.2,
        stop_guidance=3,
    )
    stop = guided_kwargs["stop_guidance"]
    n_guided_steps = sum(t_list[:-1]) + max(t_list[-1] - stop, 0)

    def run_guided(seed):
        outs, aux = clip_sampling(
            model, params, sched, pyr, extractor, jax.random.PRNGKey(seed),
            precompile=args.precompile, bucketed=args.bucketed,
            seg_len=args.seg_len or None,
            **guided_kwargs,
        )
        float(outs[-1].sum())  # scalar sync (block_until_ready lies here)
        return outs

    t0 = time.time()
    outs = run_guided(0)
    cold_s = time.time() - t0
    assert np.isfinite(np.asarray(outs[-1])).all()
    print(f"guided cold (incl. compile) {cold_s:.1f}s", file=_sys.stderr)

    warm = []
    for i in range(args.repeats):
        t0 = time.time()
        run_guided(i + 1)
        warm.append(round(time.time() - t0, 3))
    guided_warm = float(np.median(warm))
    print(f"guided warm runs: {warm}", file=_sys.stderr)

    out = {
        "metric": "clip_guided_content_balloons_vitb32",
        "batch": args.batch,
        "n_aug": args.n_aug,
        "clip_dtype": args.clip_dtype,
        "precompile": bool(args.precompile),
        "bucketed": bool(args.bucketed),
        "view_chunk": args.view_chunk,
        "save_dots": bool(args.save_dots),
        "seg_len": args.seg_len,
        "cold_s": round(cold_s, 1),
        "warm_s": guided_warm,
        "warm_runs_s": warm,
        "n_guided_steps": n_guided_steps,
        "t_list": t_list,
    }

    if not args.skip_unguided:
        def run_plain(seed):
            outs = sample_scales(
                model, params, sched, pyr.sizes_hw, jax.random.PRNGKey(seed),
                scale_factor=pyr.scale_factor, n_scales=n,
                batch_size=args.batch, custom_sample=True,
                custom_t_list=t_list,
            )
            float(outs[-1].sum())

        run_plain(0)  # compile
        t0 = time.time()
        run_plain(1)
        unguided_warm = time.time() - t0
        out["unguided_warm_s"] = round(unguided_warm, 3)
        out["guided_overhead_ms_per_step"] = round(
            (guided_warm - unguided_warm) / n_guided_steps * 1000, 1
        )

    print(json.dumps(out))


if __name__ == "__main__":
    main()
