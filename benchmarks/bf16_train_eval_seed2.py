"""Second-seed bf16-vs-fp32 TRAINING neutrality run (settles r4's open call).

``benchmarks/bf16_train_eval.py`` (seed 0) measured bf16 training at
proxy-SIFID 0.203 vs the fp32 flagship's 0.177 — a 0.13 sigma(image)
gap, "within run-to-run noise but not provably neutral from one run"
(RESULTS.md r4). This harness trains BOTH dtypes from scratch at a
fresh seed (default 1) under identical schedules and reports the
two-seed picture: if the per-dtype SIFID ranges overlap, bf16 training
is quality-neutral at 20k and can be promoted; if bf16 loses at both
seeds, the fp32 default stands with evidence.

Reference analog: the apex fp16 hooks the reference ships but never
enables (/root/reference/SinDDM/trainer.py:143-148). Run exclusively
(one TPU process).
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json
import shutil
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--image", default="/root/reference/datasets/seascape/seascape.png"
    )
    ap.add_argument("--steps", type=int, default=20000)
    ap.add_argument("--seed", type=int, default=1)
    ap.add_argument("--workdir", default="/tmp/bf16_train_seed2")
    ap.add_argument("--out", default="benchmarks/bf16_train_eval_seed2.json")
    ap.add_argument("--steps_per_chunk", type=int, default=250)
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

    pyr = build_pyramid(args.image)
    sched = make_schedules(
        timesteps=100, scale_losses=pyr.rescale_losses, n_scales=pyr.n_scales
    )
    feat = conv_feature_extractor()
    real = pyr.images[-1]

    def sample_sifid(model, params, seed=42):
        outs = sample_scales(
            model, params, sched, pyr.sizes_hw, jax.random.PRNGKey(seed),
            scale_factor=pyr.scale_factor, n_scales=pyr.n_scales,
            batch_size=16, custom_sample=True,
        )
        return sifid_batch(real, np.asarray(outs[-1]), feat)

    def train_one(dtype_name):
        dtype = jnp.bfloat16 if dtype_name == "bf16" else jnp.float32
        wd = f"{args.workdir}_{dtype_name}"
        shutil.rmtree(wd, ignore_errors=True)
        model = SinDDMNet(dim=160, compute_dtype=dtype)
        tr = MultiscaleTrainer(
            model, sched, pyr,
            TrainConfig(train_num_steps=args.steps,
                        steps_per_chunk=args.steps_per_chunk),
            DiffusionConfig(), wd, seed=args.seed,
        )
        losses = []
        t0 = time.time()
        done = 0
        while done < args.steps:
            k = min(args.steps_per_chunk, args.steps - done)
            losses.extend(np.asarray(tr.train_chunk_grouped(k)).tolist())
            done += k
            if done % 2000 == 0:
                print(f"{dtype_name} seed{args.seed} train "
                      f"{done}/{args.steps} "
                      f"loss~{np.mean(losses[-500:]):.4f} "
                      f"({done / (time.time() - t0):.1f} steps/s)",
                      flush=True)
        sps = args.steps / (time.time() - t0)
        s = sample_sifid(model, tr.state.ema_params)
        return {
            "sifid_mean": round(float(s.mean()), 4),
            "sifid_std": round(float(s.std()), 4),
            "train_steps_per_s": round(sps, 1),
            "final_loss": round(float(np.mean(losses[-500:])), 5),
        }

    res16 = train_one("bf16")
    res32 = train_one("fp32")

    rec = {
        "metric": "bf16_train_eval_seed2",
        "image": args.image,
        "steps": args.steps,
        "seed": args.seed,
        "bf16": res16,
        "fp32": res32,
        # seed-0 anchors from benchmarks/bf16_train_eval.json
        "seed0_bf16_sifid_mean": 0.2033,
        "seed0_fp32_sifid_mean": 0.177,
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
