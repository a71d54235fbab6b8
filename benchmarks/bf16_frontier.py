"""Quantify the bf16 sampling frontier on the 120k flagships (VERDICT r3 #3).

``--compute_dtype bfloat16`` samples ~9% faster than fp32 (2.08 vs
2.28 s), but the quality side of that trade was unmeasured. This script
pins it per scene, fixed seed, on the chip:

* per-pixel drift of the bf16 pyramid sample vs the fp32 one (same keys,
  same checkpoint — the ONLY difference is the denoiser's activation
  compute dtype, models/denoiser.py:61-71);
* conv-proxy SIFID (metrics.py, ranking validated against paper-SIFID in
  benchmarks/sifid_correlation.json) of both variants against the
  training image — the decision metric: bf16 is quality-neutral iff its
  SIFID lands within the fp32 batch's seed noise (std over seeds);
* wall-clock of both (median of --repeats warm runs).

One JSON line per scene + a summary line; feeds the RESULTS.md frontier
table. Run exclusively (one TPU process). Reference analog: the fp16
apex hooks the reference ships but never exercises
(/root/reference/SinDDM/trainer.py:143-148).
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import time

SCENES = {
    "balloons": ("checkpoints/balloons-120k",
                 "/root/reference/datasets/balloons/balloons.png"),
    "forest": ("checkpoints/forest-120k",
               "/root/reference/datasets/forest/forest.png"),
    "night_sky": ("checkpoints/night_sky-120k",
                  "/root/reference/datasets/night_sky/night_sky.png"),
    "pyramids": ("checkpoints/pyramids-120k",
                 "/root/reference/datasets/pyramids/pyramids.png"),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", nargs="*", default=list(SCENES))
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--seeds", type=int, default=4,
                    help="fp32 seeds for the SIFID noise band")
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--out", default="benchmarks/bf16_frontier.json")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from sinddm_tpu import build_pyramid, make_schedules
    from sinddm_tpu.apps import sample_scales
    from sinddm_tpu.config import DiffusionConfig, TrainConfig
    from sinddm_tpu.metrics import conv_feature_extractor, sifid_batch
    from sinddm_tpu.models import SinDDMNet
    from sinddm_tpu.training import MultiscaleTrainer

    feat = conv_feature_extractor()
    results = {}

    for scene in args.scenes:
        ckpt, img = SCENES[scene]
        pyr = build_pyramid(img)
        sched = make_schedules(
            timesteps=100, scale_losses=pyr.rescale_losses,
            n_scales=pyr.n_scales,
        )
        model32 = SinDDMNet(dim=160)
        model16 = SinDDMNet(dim=160, compute_dtype=jnp.bfloat16)
        tr = MultiscaleTrainer(
            model32, sched, pyr, TrainConfig(), DiffusionConfig(),
            "/tmp/bf16_frontier",
        )
        tr.load_path(ckpt)  # flagship dirs ARE single orbax checkpoints
        params = tr.state.ema_params

        def run(model, seed):
            outs = sample_scales(
                model, params, sched, pyr.sizes_hw,
                jax.random.PRNGKey(seed), scale_factor=pyr.scale_factor,
                n_scales=pyr.n_scales, batch_size=args.batch,
                custom_sample=True,
            )
            return np.asarray(outs[-1])

        def timed(model):
            run(model, 0)  # compile + warm
            ts = []
            for _ in range(args.repeats):
                t0 = time.time()
                run(model, 0)
                ts.append(time.time() - t0)
            return float(np.median(ts))

        real = pyr.images[-1]
        x32 = run(model32, 0)
        x16 = run(model16, 0)
        drift = np.abs(x16 - x32)
        s32 = sifid_batch(real, x32, feat)
        s16 = sifid_batch(real, x16, feat)
        # fp32 seed-noise band for the SIFID decision
        seed_means = [float(s32.mean())]
        for seed in range(1, args.seeds):
            seed_means.append(
                float(sifid_batch(real, run(model32, seed), feat).mean())
            )
        t32 = timed(model32)
        t16 = timed(model16)
        rec = {
            "step": int(tr.state.step),
            "batch": args.batch,
            "drift_max": round(float(drift.max()), 4),
            "drift_mean": round(float(drift.mean()), 5),
            "sifid_fp32_mean": round(float(s32.mean()), 4),
            "sifid_fp32_std_imgs": round(float(s32.std()), 4),
            "sifid_bf16_mean": round(float(s16.mean()), 4),
            "sifid_bf16_std_imgs": round(float(s16.std()), 4),
            "sifid_fp32_seed_means": [round(m, 4) for m in seed_means],
            "sifid_fp32_seed_band": [
                round(min(seed_means), 4), round(max(seed_means), 4)
            ],
            # decision: bf16 is quality-neutral iff its SIFID is NOT WORSE
            # than the fp32 seed band's top (lower SIFID = better, so a
            # below-band bf16 mean passes)
            "bf16_not_worse": bool(float(s16.mean()) <= max(seed_means)),
            "time_fp32_s": round(t32, 3),
            "time_bf16_s": round(t16, 3),
            "speedup": round(t32 / t16, 3),
        }
        results[scene] = rec
        print(json.dumps({scene: rec}), flush=True)

    n_ok = sum(r["bf16_not_worse"] for r in results.values())
    summary = {
        "metric": "bf16_frontier",
        "scenes_quality_neutral": f"{n_ok}/{len(results)}",
        "median_speedup": round(
            float(np.median([r["speedup"] for r in results.values()])), 3
        ),
        "scenes": results,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1)
    print(json.dumps({k: v for k, v in summary.items() if k != "scenes"}))


if __name__ == "__main__":
    main()
