"""bf16 TRAINING quality: 20k-step seascape run vs the fp32 flagship.

The sampling side of the bf16 frontier is covered by
``benchmarks/bf16_frontier.py``; this script covers training: run the
full fused-chunk trainer for 20k steps with the denoiser's activations in
bfloat16 (``SinDDMNet(compute_dtype=bfloat16)`` — parameters, optimizer
state and the loss stay fp32, the standard mixed-precision recipe), then
compare conv-proxy SIFID of 16 fixed-seed samples against the
fp32-trained ``checkpoints/seascape-20k`` at the same step count. Also
reports the measured train steps/s of both dtypes on the chip.

Reference analog: the apex fp16 hooks the reference ships but never
enables (/root/reference/SinDDM/trainer.py:143-148) — here the frontier
is measured instead of left dormant. Run exclusively (one TPU process).
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
    ap.add_argument("--fp32_ckpt", default="checkpoints/seascape-20k")
    ap.add_argument("--workdir", default="/tmp/bf16_train")
    ap.add_argument("--out", default="benchmarks/bf16_train_eval.json")
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

    # ---- bf16 training run ------------------------------------------------
    shutil.rmtree(args.workdir, ignore_errors=True)
    model16 = SinDDMNet(dim=160, compute_dtype=jnp.bfloat16)
    tr16 = MultiscaleTrainer(
        model16, sched, pyr,
        TrainConfig(train_num_steps=args.steps,
                    steps_per_chunk=args.steps_per_chunk),
        DiffusionConfig(), args.workdir,
    )
    losses = []
    t0 = time.time()
    done = 0
    while done < args.steps:
        k = min(args.steps_per_chunk, args.steps - done)
        losses.extend(np.asarray(tr16.train_chunk_grouped(k)).tolist())
        done += k
        if done % 2000 == 0:
            print(f"bf16 train {done}/{args.steps} "
                  f"loss~{np.mean(losses[-500:]):.4f} "
                  f"({done / (time.time() - t0):.1f} steps/s)", flush=True)
    bf16_sps = args.steps / (time.time() - t0)
    tr16.save(0)
    s16 = sample_sifid(model16, tr16.state.ema_params)

    # ---- fp32 flagship at the same step count ------------------------------
    model32 = SinDDMNet(dim=160)
    tr32 = MultiscaleTrainer(
        model32, sched, pyr, TrainConfig(), DiffusionConfig(),
        "/tmp/bf16_train_fp32ref",
    )
    tr32.load_path(args.fp32_ckpt)
    s32 = sample_sifid(model32, tr32.state.ema_params)

    # fp32 train throughput anchor (500 steps, warm)
    model32b = SinDDMNet(dim=160)
    tr32b = MultiscaleTrainer(
        model32b, sched, pyr,
        TrainConfig(steps_per_chunk=args.steps_per_chunk),
        DiffusionConfig(), "/tmp/bf16_train_fp32sps",
    )
    tr32b.train_chunk_grouped(args.steps_per_chunk)  # compile + warm
    t0 = time.time()
    tr32b.train_chunk_grouped(args.steps_per_chunk)
    tr32b.train_chunk_grouped(args.steps_per_chunk)
    float(jax.tree.leaves(tr32b.state.params)[0].sum())
    fp32_sps = 2 * args.steps_per_chunk / (time.time() - t0)

    rec = {
        "metric": "bf16_train_eval",
        "image": args.image,
        "steps": args.steps,
        "bf16_sifid_mean": round(float(s16.mean()), 4),
        "bf16_sifid_std": round(float(s16.std()), 4),
        "fp32_sifid_mean": round(float(s32.mean()), 4),
        "fp32_sifid_std": round(float(s32.std()), 4),
        "bf16_train_steps_per_s": round(bf16_sps, 1),
        "fp32_train_steps_per_s_warm": round(fp32_sps, 1),
        "bf16_final_loss": round(float(np.mean(losses[-500:])), 5),
    }
    with open(args.out, "w") as f:
        json.dump(rec, f, indent=1)
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
