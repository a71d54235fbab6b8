"""Quantify PARITY deviation 2: grouped vs padded fused training.

The default fused executor ('grouped') visits scales in equal per-chunk
counts at true shapes; 'padded' reproduces the reference's i.i.d.
multinomial scale draw exactly (on one padded canvas). Identical
marginals — this script measures whether the *visit-order* deviation
affects training outcomes: same seed, same schedule, both modes trained
to the same step count, then tail-window loss and proxy-SIFID of sampled
pyramids are compared.

Usage:
  python benchmarks/fused_mode_equivalence.py [--force_cpu] [--steps 3000]
      [--dim 16] [--image ...]   # prints one JSON line
"""

from __future__ import annotations

import os as _os, sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
_sys.path.insert(0, _REPO)

import argparse
import json
import shutil
import tempfile
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--image", default="/root/reference/datasets/balloons/balloons.png"
    )
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--chunk", type=int, default=250)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--tail", type=int, default=1000,
                    help="loss tail window (steps) for the final-loss stat")
    ap.add_argument("--seeds", type=int, default=3,
                    help="independent training runs per mode: the two "
                         "executors consume the RNG stream differently, so "
                         "a single seed cannot separate a mode effect from "
                         "training noise")
    ap.add_argument("--force_cpu", action="store_true")
    ap.add_argument("--out", default="benchmarks/fused_mode_equivalence.json")
    args = ap.parse_args()

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
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

    results = {}
    for mode in ("grouped", "padded"):
        per_seed = []
        for seed in range(args.seeds):
            model = SinDDMNet(dim=args.dim)
            tmp = tempfile.mkdtemp(prefix=f"fused_eq_{mode}_")
            try:
                tr = MultiscaleTrainer(
                    model, sched, pyr,
                    TrainConfig(
                        train_batch_size=args.batch,
                        steps_per_chunk=args.chunk,
                        fused_mode=mode,
                    ),
                    DiffusionConfig(), tmp, seed=seed,
                )
                losses = []
                t0 = time.time()
                while tr.step < args.steps:
                    n = min(args.chunk, args.steps - tr.step)
                    if mode == "grouped":
                        ls = tr.train_chunk_grouped(n)
                    else:
                        ls = tr.train_chunk(n)
                    losses.append(np.asarray(ls))
                wall = time.time() - t0
                losses = np.concatenate(losses)
                outs = sample_scales(
                    model, tr.state.ema_params, sched, pyr.sizes_hw,
                    jax.random.PRNGKey(42 + seed),
                    scale_factor=pyr.scale_factor,
                    n_scales=pyr.n_scales, batch_size=8, custom_sample=True,
                )
                vals = sifid_batch(real, np.asarray(outs[-1]), feat)
                per_seed.append({
                    "seed": seed,
                    "steps": int(tr.step),
                    "wall_s": round(wall, 1),
                    "tail_loss_mean": round(
                        float(losses[-args.tail :].mean()), 5
                    ),
                    "sifid_mean": round(float(vals.mean()), 4),
                    "sifid_std": round(float(vals.std()), 4),
                })
                print(json.dumps({mode: per_seed[-1]}), file=_sys.stderr)
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        sifids = np.asarray([r["sifid_mean"] for r in per_seed])
        tails = np.asarray([r["tail_loss_mean"] for r in per_seed])
        results[mode] = {
            "runs": per_seed,
            "tail_loss_mean": round(float(tails.mean()), 5),
            "tail_loss_seed_std": round(float(tails.std(ddof=1)), 5)
            if len(per_seed) > 1 else None,
            "sifid_mean": round(float(sifids.mean()), 4),
            "sifid_seed_std": round(float(sifids.std(ddof=1)), 4)
            if len(per_seed) > 1 else None,
        }

    g, p = results["grouped"], results["padded"]
    # gaps between mode means in units of the across-seed spread: the two
    # executors consume RNG differently, so seed variation is the noise
    # floor any real mode effect must clear
    if args.seeds > 1:
        tl_sd = max(g["tail_loss_seed_std"], p["tail_loss_seed_std"], 1e-9)
        sf_sd = max(g["sifid_seed_std"], p["sifid_seed_std"], 1e-9)
        results["tail_loss_gap_in_seed_sd"] = round(
            abs(g["tail_loss_mean"] - p["tail_loss_mean"]) / tl_sd, 3
        )
        results["sifid_gap_in_seed_sd"] = round(
            abs(g["sifid_mean"] - p["sifid_mean"]) / sf_sd, 3
        )
    with open(args.out, "w") as f:
        json.dump(results, f, indent=1)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
