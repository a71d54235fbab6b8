"""Benchmark: the BASELINE.md metric set on one TPU chip.

Prints ONE JSON line whose primary fields are the headline metric
(full-pyramid 16-image sample of 'balloons', target < 5 s on v5e-1,
``vs_baseline`` = 5.0 / value) and whose extra fields carry the rest of
the BASELINE.md targets table:

* ``per_scale_sample`` — p_sample steps/s per pyramid scale (scale 0 runs
  the full T=100 reverse chain; finer scales run num_timesteps_ideal[s]),
* ``train_steps_per_s`` — fused-grouped training throughput at the
  reference schedule shape (dim=160, batch 32, 250 steps/device call),
* ``ref_cpu`` + speedups — the PyTorch reference measured on this host's
  CPU by ``benchmarks/ref_cpu_baseline.py`` (committed as
  ``benchmarks/ref_cpu.json``; sampling cost is weight-independent), the
  denominator for the ">=20x PyTorch-CPU" north star.

The model is the reference-default denoiser (dim=160); random-init EMA
weights time identically to trained ones. Compile time is excluded (one
warm-up run per computation); compile and extra stats go to stderr.

Resilience contract (round 5): the JSON line is printed INCREMENTALLY —
first as soon as the headline + per-scale + MFU exist, then re-printed
(enriched) after the train section and after the guided section. A
consumer that takes the *last parseable line* always gets the maximum
information captured before any external kill; a consumer that takes the
first gets the headline. A coarse wall-clock budget (default 1380 s,
`SINDDM_BENCH_BUDGET_S`) skips the train/guided sections with a stderr
note instead of letting a cold compile service run the process into an
external timeout mid-section (round 4's official capture died that way:
rc=124, no JSON, killed ~1340-1530 s in — so the driver timeout is
~1440-1500 s and the default budget sits just under it; raise the env
var for unconstrained validation runs).

Env knobs (dev only; the driver runs plain `python bench.py`):
  SINDDM_BENCH_BUDGET_S=N         coarse wall-clock budget in seconds
                                  (default 1380; sections that cannot
                                  finish within it are skipped).
  SINDDM_BENCH_SKIP_TRAIN=1       skip the train-throughput section.
  SINDDM_BENCH_SKIP_CLIP=1        skip the ViT-B/32 guided section.
  SINDDM_BENCH_CLIP_DTYPE=float32 guided CLIP tower dtype (default bfloat16).
  SINDDM_BENCH_CLIP_VIEW_CHUNK=N  views per sequential guidance chunk
                                  (default 8; 0 = all at once, OOMs at B=16).
  SINDDM_BENCH_CLIP_SAVE_DOTS=1   keep dot_general outputs as remat
                                  residuals (elementwise-only tower replay).
  SINDDM_BENCH_TRAIN_DTYPE=float32 train-section compute dtype (default
                                  bfloat16; three-seed quality-neutral).
  SINDDM_BENCH_CLIP_SEG_LEN=N     max scan steps per guided device call
                                  (default 13; 0 = whole chain in one call,
                                  which the tunneled worker kills at ~4 min).
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    import jax
    import numpy as np

    t_start = time.time()
    budget_s = float(os.environ.get("SINDDM_BENCH_BUDGET_S", "1380"))

    def remaining() -> float:
        return budget_s - (time.time() - t_start)

    from sinddm_tpu import build_pyramid, make_schedules
    from sinddm_tpu.apps import sample_scales
    from sinddm_tpu.apps.sampling import (
        jit_sample_scale0,
        jit_sample_via_scale,
        via_scale_size,
    )
    from sinddm_tpu.models import SinDDMNet

    t_setup = time.time()
    pyr = build_pyramid("/root/reference/datasets/balloons/balloons.png")
    sched = make_schedules(
        timesteps=100, scale_losses=pyr.rescale_losses, n_scales=pyr.n_scales
    )
    # headline dtype: bfloat16 — measured quality-neutral on all four
    # 120k flagships (conv-proxy SIFID at or below the fp32 4-seed band,
    # benchmarks/bf16_frontier.json) at a ~1.12x median speedup. fp32
    # remains the cross-parity mode (SINDDM_BENCH_DTYPE=float32).
    bench_dtype = os.environ.get("SINDDM_BENCH_DTYPE", "bfloat16")
    model = SinDDMNet(
        dim=160,
        compute_dtype=(
            jax.numpy.bfloat16 if bench_dtype == "bfloat16"
            else jax.numpy.float32
        ),
    )
    key = jax.random.PRNGKey(0)
    h0, w0 = pyr.sizes_hw[0]
    params = model.init(
        key,
        jax.numpy.zeros((1, h0, w0, 3)),
        jax.numpy.zeros((1,), jax.numpy.int32),
        jax.numpy.asarray(0.0),
    )["params"]
    print(f"setup {time.time()-t_setup:.1f}s devices={jax.devices()}", file=sys.stderr)

    B = 16
    t_list = list(sched.num_timesteps_ideal[1:])

    def run(seed: int, precompile: bool = False):
        outs = sample_scales(
            model, params, sched, pyr.sizes_hw, jax.random.PRNGKey(seed),
            scale_factor=pyr.scale_factor, n_scales=pyr.n_scales,
            batch_size=B, custom_sample=True, precompile=precompile,
        )
        # force execution with a scalar device->host sync:
        # block_until_ready() returns early on the tunneled axon backend
        float(outs[-1].sum())
        return outs

    t_c = time.time()
    # concurrent per-scale compiles: measured 77.3 -> 48.2 s cold on this
    # backend (benchmarks/measure_precompile.py)
    outs = run(0, precompile=True)
    compile_s = time.time() - t_c
    assert np.isfinite(np.asarray(outs[-1])).all()
    print(f"compile+first run {compile_s:.1f}s", file=sys.stderr)

    times = []
    for i in range(5):
        t0 = time.time()
        run(i + 1)
        times.append(time.time() - t0)
    value = float(np.median(times))
    print(f"headline runs: {[round(t, 4) for t in times]}", file=sys.stderr)

    # ---- utilization: closed-form model FLOPs -> MFU ---------------------
    from sinddm_tpu.utils.flops import (
        mfu_fields,
        sample_pyramid_flops,
        train_step_flops,
        vit_b32_flops,
        warp_mm_flops,
    )

    sample_flops = sample_pyramid_flops(pyr.sizes_hw, t_list, B, 160)
    sample_mfu = mfu_fields(sample_flops, value)
    print(f"sampling MFU: {sample_mfu}", file=sys.stderr)

    # ---- per-scale p_sample steps/s (warm jit cache from run()) ---------
    per_scale = {}
    prev = None
    for s in range(pyr.n_scales):
        reps = []
        steps = 100 if s == 0 else int(t_list[s - 1])
        for rep in range(3):
            sub = jax.random.PRNGKey(1000 + rep)
            t0 = time.time()
            if s == 0:
                x, _, _ = jit_sample_scale0(
                    model, params, sched, sub, (B, h0, w0, 3), 0, 0, 0.0
                )
            else:
                size_hw = via_scale_size(
                    pyr.sizes_hw, s=s, n_scales=pyr.n_scales,
                    scale_factor=pyr.scale_factor, custom_sample=True,
                    custom_img_size_idx=s,
                )
                x, _, _ = jit_sample_via_scale(
                    model, params, sched, prev, sub, size_hw, s, steps, 0,
                    True, 0.0,
                )
            float(x.sum())
            reps.append(time.time() - t0)
        prev = x
        dt = float(np.median(reps))
        per_scale[f"s{s}"] = {
            "steps": steps,
            "hw": list(x.shape[1:3]),
            "s_per_scale": round(dt, 4),
            "steps_per_s": round(steps / dt, 1),
        }
    print(f"per-scale: {per_scale}", file=sys.stderr)

    # ---- incremental JSON: headline is safe from this point on ----------
    # Every subsequent section enriches `out` and re-prints it; the last
    # parseable stdout line always carries everything captured so far.
    ref = None
    ref_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "benchmarks", "ref_cpu.json")
    if os.path.exists(ref_path):
        with open(ref_path) as f:
            ref = json.load(f)

    out = {
        "metric": "full_pyramid_sample_batch16_balloons",
        "value": round(value, 4),
        "unit": "s",
        "vs_baseline": round(5.0 / value, 2),
        "dtype": bench_dtype,
        "utilization": sample_mfu,
        "per_scale_sample": per_scale,
    }
    if ref is not None:
        ref_s = ref["full_pyramid_sample_batch16_balloons_s"]
        out["ref_cpu_sample_s"] = ref_s
        out["speedup_vs_ref_cpu_sample"] = round(ref_s / value, 1)

    def emit() -> None:
        print(json.dumps(out), flush=True)

    emit()

    # ---- train throughput (fused grouped chunks, reference shape) -------
    train_sps = None
    train_mfu = None
    # ~60 s warm-service budget for the train section; a cold compile
    # service can take many minutes, so guard generously.
    if remaining() < 240:
        print(f"budget: skipping train section ({remaining():.0f}s left "
              f"of {budget_s:.0f})", file=sys.stderr)
    elif not os.environ.get("SINDDM_BENCH_SKIP_TRAIN"):
        import shutil
        import tempfile

        from sinddm_tpu.config import DiffusionConfig, TrainConfig
        from sinddm_tpu.training import MultiscaleTrainer

        tmp = tempfile.mkdtemp(prefix="bench_train_")
        try:
            # bfloat16 training is the headline: quality-neutral across
            # THREE seeds (conv-proxy SIFID bf16 vs fp32 — seed 0:
            # 0.203/0.177, seed 1: 0.162/0.191, seed 2: 0.122/0.132;
            # bf16 wins 2/3, means 0.162 vs 0.167, per-dtype ranges fully
            # overlap, seed noise >> dtype gap; bf16_train_eval*.json)
            # and ~27% faster (15.0 vs 11.8 steps/s, bench_r4b_prelim).
            # SINDDM_BENCH_TRAIN_DTYPE=float32 restores the parity mode
            # (still the CLI default).
            train_dtype = os.environ.get("SINDDM_BENCH_TRAIN_DTYPE",
                                         "bfloat16")
            train_model = SinDDMNet(
                dim=160,
                compute_dtype=(
                    jax.numpy.bfloat16 if train_dtype == "bfloat16"
                    else jax.numpy.float32
                ),
            )
            tr = MultiscaleTrainer(
                train_model, sched, pyr,
                TrainConfig(train_batch_size=32, steps_per_chunk=250),
                DiffusionConfig(), tmp,
            )
            t0 = time.time()
            tr.train_chunk_grouped(250)  # compiles all 5 per-scale chunk fns
            float(jax.tree.leaves(tr.state.params)[0].sum())
            print(f"train compile+chunk {time.time()-t0:.1f}s", file=sys.stderr)
            t0 = time.time()
            for _ in range(2):
                tr.train_chunk_grouped(250)
            float(jax.tree.leaves(tr.state.params)[0].sum())
            train_sps = 500.0 / (time.time() - t0)
            train_mfu = mfu_fields(
                train_step_flops(pyr.sizes_hw, 32, 160) * 500.0,
                500.0 / train_sps,
            )
            print(f"train {train_sps:.1f} steps/s MFU: {train_mfu}",
                  file=sys.stderr)
        except Exception as e:  # noqa: BLE001 — deliberate best-effort
            train_sps = None
            print(f"train section failed (non-fatal): {e!r}", file=sys.stderr)
        finally:
            shutil.rmtree(tmp, ignore_errors=True)

    if train_sps is not None:
        out["train_steps_per_s"] = round(train_sps, 1)
        out["train_dtype"] = train_dtype
        out["train_utilization"] = train_mfu
        if ref is not None and ref.get("train_steps_per_s"):
            out["ref_cpu_train_steps_per_s"] = ref["train_steps_per_s"]
            out["speedup_vs_ref_cpu_train"] = round(
                train_sps / ref["train_steps_per_s"], 1
            )
        emit()

    # ---- guided sampling at real ViT-B/32 shape (weights-free) ----------
    # VERDICT r2 missing #1: the guided stack's cost is dominated by 16
    # augmented ViT-B/32 forwards+backwards per guided timestep; perf needs
    # no trained weights. Uses the shape-bucketed sampler (2 compiles
    # total) so the bench's compile bill stays bounded.
    # The whole section is best-effort: a TPU-worker crash mid-guided-run
    # (observed once on this backend) must not cost the headline metric,
    # which is already measured by this point — catch, report on stderr,
    # and still print the one-line JSON.
    clip_guided = None
    try:
      if remaining() < 600:
        # Guided cold is ~225-280 s on a warm compile service and far more
        # on a cold one; entering it with less than 600 s of budget is how
        # round 4's capture died (rc=124 mid-section, no JSON printed).
        print(f"budget: skipping guided section ({remaining():.0f}s left "
              f"of {budget_s:.0f})", file=sys.stderr)
      elif not os.environ.get("SINDDM_BENCH_SKIP_CLIP"):
        import dataclasses

        from sinddm_tpu.apps.clip_apps import clip_sampling
        from sinddm_tpu.guidance.clip_extractor import ClipExtractor
        from sinddm_tpu.models.clip.convert import random_clip_params
        from sinddm_tpu.models.clip.model import VIT_B_32

        clip_dtype = os.environ.get("SINDDM_BENCH_CLIP_DTYPE", "bfloat16")
        cfg = dataclasses.replace(
            VIT_B_32,
            compute_dtype=None if clip_dtype == "float32" else clip_dtype,
        )
        clip_model, clip_vars = random_clip_params(cfg, seed=0)
        # view_chunk=8: with the windowed Pallas warp (no HBM tap-matrix
        # buffers) 8-view chunks fit and measure 97.8 s vs 107.1 s at 4
        # (benchmarks, round 4); 16 still OOMs HBM by 5 GB
        view_chunk = int(os.environ.get("SINDDM_BENCH_CLIP_VIEW_CHUNK", "8"))
        save_dots = os.environ.get("SINDDM_BENCH_CLIP_SAVE_DOTS", "0") == "1"
        extractor = ClipExtractor(
            clip_model, clip_vars, n_aug=16, view_chunk=view_chunk or None,
            save_dots=save_dots,
        )
        # seg_len=13: bounds each guided device call to ~1 min at batch 16
        # (the tunneled worker kills ~4-min calls mid-run)
        seg_len = int(os.environ.get("SINDDM_BENCH_CLIP_SEG_LEN", "13"))
        guided_kwargs = dict(
            text_input="colorful hot air balloons",
            strength=0.3, sample_batch_size=B, custom_t_list=t_list,
            guidance_sub_iters=[0] + [1] * (pyr.n_scales - 1),
            quantile=0.7, llambda=0.2, stop_guidance=3, bucketed=True,
            seg_len=seg_len or None,
        )

        def run_guided(seed):
            outs, _ = clip_sampling(
                model, params, sched, pyr, extractor,
                jax.random.PRNGKey(seed), **guided_kwargs,
            )
            float(outs[-1].sum())

        t0 = time.time()
        run_guided(0)
        guided_cold = time.time() - t0
        print(f"clip-guided cold (incl. compile) {guided_cold:.1f}s",
              file=sys.stderr)
        # One warm repeat: three committed r4 runs show <2% spread
        # (benchmarks/guided_r4_in_context.jsonl), and the second repeat
        # is what pushed round 4's capture past the driver timeout.
        gtimes = []
        for i in range(1):
            t0 = time.time()
            run_guided(i + 1)
            gtimes.append(time.time() - t0)
        guided_warm = float(np.median(gtimes))
        n_guided = sum(t_list[:-1]) + max(t_list[-1] - 3, 0)
        # guided-run model FLOPs (no remat recompute, MFU convention):
        # every bucketed step runs the denoiser on the finest-scale canvas;
        # each guided step adds 16 views x (warp fwd+adjoint + ViT fwd+bwd)
        from sinddm_tpu.guidance.clip_extractor import resize_output_size
        from sinddm_tpu.utils.flops import denoiser_flops_per_pixel

        canvas = pyr.sizes_hw[-1]
        frame = resize_output_size(canvas[0], canvas[1])
        per_px = denoiser_flops_per_pixel(160)
        h0_, w0_ = pyr.sizes_hw[0]
        den_flops = (
            sum(t_list) * B * canvas[0] * canvas[1] * per_px
            + 100 * B * h0_ * w0_ * per_px
        )
        warp1 = warp_mm_flops(frame[0] * frame[1], canvas)
        vit1 = vit_b32_flops(frame)
        warp_flops = n_guided * B * 16 * 2 * warp1   # fwd + adjoint
        vit_flops = n_guided * B * 16 * 3 * vit1     # fwd + ~2x bwd
        guided_total = den_flops + warp_flops + vit_flops
        guided_mfu = mfu_fields(guided_total, guided_warm)
        guided_mfu["flops_split"] = {
            "warp": round(warp_flops / guided_total, 3),
            "vit": round(vit_flops / guided_total, 3),
            "denoiser": round(den_flops / guided_total, 3),
        }
        print(f"guided MFU: {guided_mfu}", file=sys.stderr)
        clip_guided = {
            "utilization": guided_mfu,
            "warm_s": round(guided_warm, 3),
            "cold_s": round(guided_cold, 1),
            "clip_dtype": clip_dtype,
            "view_chunk": view_chunk,
            "seg_len": seg_len,
            "bucketed": True,
            "batch": B,
            "n_aug": 16,
            "n_guided_steps": n_guided,
            "ms_per_guided_step": round(guided_warm / n_guided * 1000, 1),
        }
        print(f"clip-guided warm runs: {[round(t, 3) for t in gtimes]}",
              file=sys.stderr)
    except Exception as e:  # noqa: BLE001 — deliberate best-effort section
        clip_guided = None
        print(f"clip-guided section failed (non-fatal): {e!r}",
              file=sys.stderr)

    # Final enriched emit — `out` already carries headline (+train if it
    # ran); add the guided section and re-print so the last line wins.
    if clip_guided is not None:
        out["clip_guided_vitb32"] = clip_guided
    emit()


if __name__ == "__main__":
    main()
