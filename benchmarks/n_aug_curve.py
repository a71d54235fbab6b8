"""Quality-vs-n_aug curve for CLIP guidance (VERDICT r4 next-round #2).

The guided step's kernel levers are exhausted (~0.62-0.64 s/step at
n_aug=16); the remaining frontier is algorithmic. The reference hardcodes
16 augmented views per guided timestep (/root/reference/main.py:158 and
text2live_util/clip_extractor.py:36) — a default, not a law. Each view
costs one warp fwd+adjoint and one ViT-B/32 fwd+bwd, so the guided step
cost is ~linear in n_aug; if 8 views steers as well as 16, the step
halves with zero kernel work.

Protocol (balloons-120k flagship denoiser, random-init ViT-B/32 tower —
the tower defines a fixed, consistent objective; quality proxies follow
the bf16_frontier.py pattern):

For n_aug in {16, 8, 4} (+ unguided baseline):
* run clip_content sampling (bucketed, seg_len, reference settings),
  1 cold + ``--repeats`` warm runs -> wall + ms/guided-step;
* in-run clip-score trajectory from aux (per-scale first/last);
* post-hoc APPLES-TO-APPLES endpoint: the final images scored by a FIXED
  16-view evaluator (mean cosine of view embeddings vs the mean text
  embedding, averaged over --eval_keys view draws) — how far each
  configuration actually pushed the shared objective;
* conv-proxy SIFID vs the training image (ranking validated,
  benchmarks/sifid_correlation.json) — distribution damage;
* per-pixel drift vs the n_aug=16 output (same seed).

One JSON line per config + a summary with the default decision inputs.
Run exclusively (one TPU process).
"""

from __future__ import annotations

import os as _os, sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import dataclasses
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_augs", type=int, nargs="+", default=[16, 8, 4])
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--repeats", type=int, default=2)
    ap.add_argument("--eval_keys", type=int, default=3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--view_chunk", type=int, default=8)
    ap.add_argument("--seg_len", type=int, default=13)
    ap.add_argument("--text", default="colorful hot air balloons at sunset")
    ap.add_argument("--skip_unguided", action="store_true")
    ap.add_argument("--out", default="benchmarks/n_aug_curve.jsonl")
    ap.add_argument("--force_cpu", action="store_true")
    ap.add_argument("--smoke", action="store_true",
                    help="CPU logic check: tiny CLIP, tiny pyramid, "
                         "random dim=8 denoiser, t_list=[2,...]")
    args = ap.parse_args()
    if args.smoke:
        args.force_cpu = True

    import jax

    if args.force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sinddm_tpu import build_pyramid, make_schedules
    from sinddm_tpu.apps.clip_apps import clip_sampling
    from sinddm_tpu.apps.sampling import sample_scales
    from sinddm_tpu.config import DiffusionConfig, TrainConfig
    from sinddm_tpu.guidance.clip_extractor import (
        ClipExtractor,
        get_augmentations_template,
    )
    from sinddm_tpu.metrics import conv_feature_extractor, sifid_batch
    from sinddm_tpu.models import SinDDMNet
    from sinddm_tpu.models.clip.convert import random_clip_params
    from sinddm_tpu.models.clip.model import VIT_B_32
    from sinddm_tpu.training import MultiscaleTrainer

    t0 = time.time()
    if args.smoke:
        import tempfile

        from PIL import Image

        from sinddm_tpu.models.clip.model import tiny_clip_config

        rng = np.random.default_rng(0)
        with tempfile.TemporaryDirectory(prefix="n_aug_smoke_") as tmp:
            p = _os.path.join(tmp, "t.png")
            Image.fromarray(
                rng.uniform(0, 255, (96, 128, 3)).astype(np.uint8)
            ).save(p)
            pyr = build_pyramid(p, auto_scale=50000)
        sched = make_schedules(
            timesteps=100, scale_losses=pyr.rescale_losses,
            n_scales=pyr.n_scales,
        )
        model = SinDDMNet(dim=8)
        h0, w0 = pyr.sizes_hw[0]
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, h0, w0, 3)),
            jnp.zeros((1,), jnp.int32), jnp.asarray(0.0),
        )["params"]
        clip_model, clip_vars = random_clip_params(tiny_clip_config(), seed=0)
        args.batch = min(args.batch, 2)
        # clamp to tiny view counts but keep at least two DISTINCT ones
        # so the drift-vs-anchor path is exercised too
        clamped = sorted({max(min(a, 4), 2) for a in args.n_augs},
                         reverse=True) or [4]
        if len(clamped) == 1:
            clamped.append(max(clamped[0] // 2, 1))
        args.n_augs = clamped
        t_list = [2] * (pyr.n_scales - 1)
        stop = 1
    else:
        pyr = build_pyramid("/root/reference/datasets/balloons/balloons.png")
        sched = make_schedules(
            timesteps=100, scale_losses=pyr.rescale_losses,
            n_scales=pyr.n_scales,
        )
        model = SinDDMNet(dim=160)
        tr = MultiscaleTrainer(
            model, sched, pyr, TrainConfig(), DiffusionConfig(),
            "/tmp/n_aug_curve",
        )
        tr.load_path("checkpoints/balloons-120k")
        params = tr.state.ema_params
        cfg = dataclasses.replace(VIT_B_32, compute_dtype="bfloat16")
        clip_model, clip_vars = random_clip_params(cfg, seed=0)
        t_list = list(sched.num_timesteps_ideal[1:])
        stop = 3
    n = pyr.n_scales
    feat = conv_feature_extractor()
    real = pyr.images[-1]
    n_guided = sum(t_list[:-1]) + max(t_list[-1] - stop, 0)
    print(f"setup {time.time()-t0:.1f}s devices={jax.devices()} "
          f"t_list={t_list} n_guided={n_guided}", file=_sys.stderr)

    # fixed 16-view endpoint evaluator (the n_aug sweep below builds its
    # own per-config extractors; this one only scores final images)
    evaluator = ClipExtractor(
        clip_model, clip_vars, n_aug=16, view_chunk=args.view_chunk or None
    )
    txt = evaluator.get_text_embedding(
        args.text, get_augmentations_template("hr"), average_embeddings=True
    )
    txt_n = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)

    def eval_score(x_final) -> float:
        """Mean cos(view emb, mean text emb) under the FIXED 16-view
        evaluator, averaged over eval_keys independent view draws."""
        x01 = (x_final + 1.0) * 0.5
        scores = []
        for k in range(args.eval_keys):
            embs = evaluator.embed_image_views(
                x01, jax.random.PRNGKey(10_000 + k)
            )
            embs = embs / jnp.linalg.norm(embs, axis=-1, keepdims=True)
            cos = jnp.einsum("bvd,td->bvt", embs, txt_n).mean()
            scores.append(float(cos))
        return float(np.mean(scores))

    guided_kwargs = dict(
        text_input=args.text,
        strength=0.3,
        sample_batch_size=args.batch,
        custom_t_list=t_list,
        guidance_sub_iters=[0] + [1] * (n - 1),
        quantile=0.7,
        llambda=0.2,
        stop_guidance=stop,
        bucketed=True,
        seg_len=args.seg_len or None,
    )

    records = []

    def emit(rec):
        records.append(rec)
        with open(args.out, "a") as f:
            f.write(json.dumps(rec) + "\n")
        print(json.dumps(rec), flush=True)

    # ---- unguided baseline (objective floor + SIFID anchor) -------------
    if not args.skip_unguided:
        outs = sample_scales(
            model, params, sched, pyr.sizes_hw, jax.random.PRNGKey(args.seed),
            scale_factor=pyr.scale_factor, n_scales=pyr.n_scales,
            batch_size=args.batch, custom_sample=True,
        )
        xu = np.asarray(outs[-1])
        emit({
            "config": "unguided",
            "eval_clip_score_16view": round(eval_score(outs[-1]), 5),
            "sifid_mean": round(float(sifid_batch(real, xu, feat).mean()), 4),
        })

    x16 = None
    for n_aug in args.n_augs:
        extractor = ClipExtractor(
            clip_model, clip_vars, n_aug=n_aug,
            view_chunk=min(args.view_chunk, n_aug) or None,
        )

        def run(seed):
            outs, aux = clip_sampling(
                model, params, sched, pyr, extractor,
                jax.random.PRNGKey(seed), **guided_kwargs,
            )
            float(outs[-1].sum())  # scalar sync (block_until_ready lies)
            return outs, aux

        t0 = time.time()
        outs, aux = run(args.seed)
        cold_s = time.time() - t0
        xg = np.asarray(outs[-1])
        assert np.isfinite(xg).all()
        warm = []
        for i in range(args.repeats):
            t0 = time.time()
            run(args.seed + 100 + i)
            warm.append(round(time.time() - t0, 3))
        warm_s = float(np.median(warm)) if warm else None

        # in-run trajectory: per guided scale, first/last mean clip score.
        # The bucketed scan pads every scale to the bucket's max_t and the
        # padded steps (lax.cond skip) emit clip_score = 0.0, as do the
        # final stop_guidance steps of the finest scale — trim to each
        # scale's real guided step count before taking the endpoint.
        valid_counts = list(t_list[:-1]) + [max(t_list[-1] - stop, 0)]
        traj = []
        gi = 0
        for a in aux:
            if isinstance(a, dict) and "clip_score" in a:
                s = np.asarray(a["clip_score"])
                s = s.reshape(s.shape[0], -1).mean(axis=1)
                nv = valid_counts[gi] if gi < len(valid_counts) else s.size
                gi += 1
                s = s[:nv]
                if s.size:
                    traj.append([round(float(s[0]), 5),
                                 round(float(s[-1]), 5)])
        drift = None
        if x16 is None and n_aug == max(args.n_augs):
            # anchor at the largest view count (16 in the real protocol;
            # the smoke run's clamped maximum otherwise)
            x16 = xg
        elif x16 is not None:
            drift = {
                "max": round(float(np.abs(xg - x16).max()), 4),
                "mean": round(float(np.abs(xg - x16).mean()), 5),
            }
        rec = {
            "config": f"n_aug={n_aug}",
            "n_aug": n_aug,
            "batch": args.batch,
            "cold_s": round(cold_s, 1),
            "warm_s": warm_s,
            "warm_runs_s": warm,
            "ms_per_guided_step": (
                round(warm_s / n_guided * 1000, 1) if warm_s else None
            ),
            "eval_clip_score_16view": round(eval_score(outs[-1]), 5),
            "sifid_mean": round(float(sifid_batch(real, xg, feat).mean()), 4),
            "score_traj_first_last_per_scale": traj,
            "drift_vs_naug16": drift,
        }
        emit(rec)

    summary = {
        "metric": "n_aug_quality_curve",
        "scene": "balloons-120k",
        "records": [
            {k: r.get(k) for k in
             ("config", "warm_s", "ms_per_guided_step",
              "eval_clip_score_16view", "sifid_mean")}
            for r in records
        ],
    }
    with open(args.out, "a") as f:
        f.write(json.dumps(summary) + "\n")
    print(json.dumps(summary), flush=True)


if __name__ == "__main__":
    main()
