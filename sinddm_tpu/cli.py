"""Command-line interface — flag surface and mode dispatch.

Mirrors the reference ``main.py:11-327``: same flags, same defaults, same
nine modes (train, sample, clip_content, clip_style_gen, clip_style_trans,
clip_roi, roi, harmonization, style_transfer). Differences by design:

* ROI boxes are accepted headlessly via ``--roi_bb`` / ``--target_roi``
  flags ([y x h w]); the OpenCV selector pops up only with
  ``--interactive`` (the reference always requires a GUI, main.py:241-243).
* per-mode hardcoded hyperparameters of the reference (strength, llambda,
  stop_guidance, ...) are exposed as flags with those values as defaults.
"""

from __future__ import annotations

import argparse
import datetime
import os
from pathlib import Path

import numpy as np


def _positive_int(v: str) -> int:
    n = int(v)
    if n < 1:
        raise argparse.ArgumentTypeError(f"must be >= 1, got {n}")
    return n


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser("sinddm_tpu")
    p.add_argument("--scope", default="forest", help="training scope name")
    p.add_argument(
        "--mode",
        required=True,
        choices=[
            "train", "sample", "clip_content", "clip_style_gen",
            "clip_style_trans", "clip_roi", "harmonization",
            "style_transfer", "roi",
        ],
    )
    # i2i
    p.add_argument("--input_image", default="seascape_composite_dragon.png")
    p.add_argument("--start_t_harm", default=5, type=int)
    p.add_argument("--start_t_style", default=15, type=int)
    p.add_argument("--harm_mask", default="seascape_mask_dragon.png")
    # clip
    p.add_argument("--clip_text", default="Fire in the Forest")
    p.add_argument("--fill_factor", type=float)
    p.add_argument("--strength", type=float)
    p.add_argument("--roi_n_tar", default=1, type=int)
    # dataset
    p.add_argument("--dataset_folder", default="./datasets/forest/")
    p.add_argument("--image_name", default="forest.jpeg")
    p.add_argument("--results_folder", default="./results/")
    # net
    p.add_argument("--dim", default=160, type=int)
    # diffusion
    p.add_argument("--scale_factor", default=1.411, type=float)
    # training
    p.add_argument("--timesteps", default=100, type=int)
    p.add_argument("--train_batch_size", default=32, type=int)
    p.add_argument("--grad_accumulate", default=1, type=int)
    p.add_argument("--train_num_steps", default=120001, type=int)
    p.add_argument("--save_and_sample_every", default=10000, type=int)
    p.add_argument("--avg_window", default=100, type=int)
    p.add_argument("--train_lr", default=1e-3, type=float)
    p.add_argument(
        "--sched_k_milestones", nargs="+", default=[20, 40, 70, 80, 90, 110],
        type=int,
    )
    p.add_argument("--load_milestone", default=0, type=int)
    # sampling
    p.add_argument("--sample_batch_size", default=16, type=int)
    p.add_argument("--scale_mul", nargs="+", default=[1, 1], type=float)
    p.add_argument("--sample_t_list", nargs="+", type=int)
    # device
    p.add_argument("--device_num", default=0, type=int,
                   help="index into jax.devices() to run on (reference "
                        "main.py:53 selects the CUDA device; out-of-range "
                        "indices warn and fall back to device 0)")
    p.add_argument("--coordinator", default=None,
                   help="multi-host: coordinator address host:port; every "
                        "process runs the same CLI with --num_processes/"
                        "--process_id (or SINDDM_COORDINATOR/_NUM_PROCESSES/"
                        "_PROCESS_ID env) and the mesh spans all hosts over "
                        "DCN (parallel/distributed.py)")
    p.add_argument("--num_processes", default=None, type=int,
                   help="multi-host: total number of processes")
    p.add_argument("--process_id", default=None, type=int,
                   help="multi-host: this process's index")
    p.add_argument("--mesh_data", default=1, type=int,
                   help="devices on the 'data' (batch) mesh axis; "
                        "mesh_data*mesh_spatial devices are used (1 1 = no mesh)")
    p.add_argument("--mesh_spatial", default=1, type=int,
                   help="devices on the 'spatial' (image H) mesh axis")
    # dev
    p.add_argument("--sample_limited_t", action="store_true")
    p.add_argument("--omega", default=0, type=float)
    p.add_argument("--loss_factor", default=1, type=float)
    # TPU-native extensions
    p.add_argument("--seed", default=0, type=int)
    p.add_argument("--steps_per_chunk", default=100, type=int,
                   help="train steps fused per device call (0 = per-step)")
    p.add_argument("--fused_mode", default="grouped",
                   choices=["grouped", "padded"],
                   help="fused-chunk strategy (see TrainConfig)")
    # NOTE: alternative conv executors (Pallas fused blocks, dot-formulated
    # convs) exist as library-level R&D paths (ops/pallas_conv.py,
    # models/fast_denoiser.py, `fast_mode=`/`use_pallas=` in
    # apps/sampling.py) but are NOT CLI flags: measured on a real v5e chip
    # they do not beat XLA's conv emitter (benchmarks/tpu_conv_experiments.py,
    # RESULTS.md), and a slower path must not ship as a user-facing option.
    p.add_argument("--compute_dtype", default="float32",
                   choices=["float32", "bfloat16"])
    p.add_argument("--precompile", action="store_true",
                   help="compile all per-scale sampler executables "
                        "concurrently before the pyramid walk (measured "
                        "1.6x faster cold plain sampling on this backend; "
                        "no benefit measured for guided runs)")
    p.add_argument("--roi_bb", nargs="+", type=int, action="append",
                   help="target ROI box 'y x h w' (repeatable; headless)")
    p.add_argument("--target_roi", nargs=4, type=int,
                   help="source ROI box 'y x h w' (headless)")
    p.add_argument("--interactive", action="store_true",
                   help="use the OpenCV ROI selector instead of flags")
    p.add_argument("--save_interm", action="store_true",
                   help="dump every intermediate denoised state as PNG "
                        "grids under interm_samples_scale_{s}/ (and "
                        "interm_samples_clip_roi/ for clip_roi) — all "
                        "sampling modes (reference models.py:469-475,"
                        "511-526, trainer.py:427-434)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the mode's device "
                        "work into DIR (open with TensorBoard); wraps the "
                        "whole mode body in jax.profiler.trace")
    p.add_argument("--clip_weights", default=None,
                   help="path to CLIP ViT-B/32 weights (.pt or converted)")
    p.add_argument("--clip_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="CLIP vision-tower compute dtype (bfloat16 = "
                        "MXU-rate guidance, the analog of the reference's "
                        "fp16 CLIP)")
    p.add_argument("--warp_precision", default="highest",
                   choices=["highest", "high"],
                   help="MXU precision of the guidance view-warp matmuls: "
                        "'highest' is fp32-exact vs the gather path; "
                        "'high' is ~28%% faster per warp but bf16-rate "
                        "(guidance-direction impact measured in "
                        "benchmarks/warp_high_guidance_eval.py)")
    p.add_argument("--n_aug", type=_positive_int, default=16,
                   help="augmented CLIP views per guided image (reference "
                        "hardcodes 16, main.py:158). Guided wall scales "
                        "~linearly: 16 -> 0.637 s/step, 8 -> 0.359, "
                        "4 -> 0.225 on v5e-1; a fixed-evaluator quality "
                        "curve (random-init ViT-B/32 tower) keeps ~65%% of "
                        "the guidance signal at 8 views "
                        "(benchmarks/n_aug_curve.jsonl), so 16 stays the "
                        "parity default and 8 is the documented fast mode")
    p.add_argument("--clip_view_chunk", type=int, default=8,
                   help="guidance views encoded+differentiated per "
                        "sequential chunk (0 = all at once). 8 is the "
                        "measured optimum with the windowed Pallas warp "
                        "(97.8 vs 107.1 s at 4; 16 OOMs HBM); drop to 4 "
                        "if a large canvas falls back to the XLA matmul "
                        "warp and OOMs")
    p.add_argument("--warp_impl", default=None,
                   choices=["mm", "pallas", "pallas_win", "pallas_winx",
                            "pallas_winb"],
                   help="guidance view-warp executor (default: auto — "
                        "'pallas_winx', the transposed-reduction windowed "
                        "Pallas kernel, on TPU when the source fits, else "
                        "the XLA matmul path). 'mm' forces the XLA matmul "
                        "path; 'pallas_win'/'pallas_winb' are the plain / "
                        "channel-batched windowed variants; see "
                        "ops/pallas_warp.py for the measured comparison")
    p.add_argument("--bucketed_guidance", action="store_true",
                   help="run all guided via scales through ONE compiled "
                        "graph on the finest-scale canvas (all four CLIP "
                        "modes, incl. style-trans injection, under any "
                        "mesh; cuts guided cold-start compiles from "
                        "n_scales to 2). Same sampling process but "
                        "different noise draws than the per-scale graphs "
                        "(noise is drawn at the canvas shape), and "
                        "non-finest scales encode CLIP views at the "
                        "finest-scale frame — per-sample outputs differ, "
                        "distributions match")
    p.add_argument("--guidance_seg_len", type=int, default=0,
                   help="with --bucketed_guidance: cap each device call "
                        "at N denoise steps (0 = whole scale per call); "
                        "bounds call duration at real CLIP scale")
    p.add_argument("--load_reference_ckpt", default=None,
                   help="import a reference PyTorch model-{milestone}.pt "
                        "(denoiser + EMA weights) instead of --load_milestone")
    p.add_argument("--load_checkpoint", default=None,
                   help="load an orbax checkpoint directory by path "
                        "(e.g. checkpoints/balloons-60k)")
    return p


def main(argv=None) -> None:
    args = build_parser().parse_args(argv)
    _run(args)


def _run(args) -> None:
    # multi-host entry MUST precede the first backend touch (jax.devices)
    from sinddm_tpu.parallel import distributed as dist

    dist.initialize(
        coordinator_address=args.coordinator,
        num_processes=args.num_processes,
        process_id=args.process_id,
    )

    if args.profile:
        # the trace context may touch the backend, so it must start AFTER
        # jax.distributed.initialize for --profile + multi-host runs
        from sinddm_tpu.utils.profiling import trace

        with trace(args.profile):
            _run_modes(args)
        print(f"profiler trace written to {args.profile}")
        return
    _run_modes(args)


def _run_modes(args) -> None:
    import jax
    import jax.numpy as jnp

    from sinddm_tpu.apps.sampling import sample_scales
    from sinddm_tpu.parallel import distributed as dist
    from sinddm_tpu.config import DiffusionConfig, TrainConfig
    from sinddm_tpu.models import SinDDMNet
    from sinddm_tpu.ops.image_io import save_image
    from sinddm_tpu.pyramid import build_pyramid, load_external_image
    from sinddm_tpu.schedules import make_schedules
    from sinddm_tpu.training import MultiscaleTrainer

    print(
        f"devices: {jax.devices()}"
        + (
            f" (process {jax.process_index()}/{jax.process_count()})"
            if dist.is_initialized()
            else ""
        )
    )
    if args.device_num:
        devs = jax.devices()
        if 0 <= args.device_num < len(devs):
            # computations without explicit shardings run here (the
            # reference's --device_num selects the CUDA device, main.py:53)
            jax.config.update("jax_default_device", devs[args.device_num])
            print(f"default device: {devs[args.device_num]}")
        else:
            print(
                f"--device_num {args.device_num} out of range "
                f"({len(devs)} devices); using device 0"
            )
    from sinddm_tpu.config import MeshConfig

    mesh_cfg = MeshConfig(data=args.mesh_data, spatial=args.mesh_spatial)
    mesh = None
    sample_sharding = None
    try:
        mesh = mesh_cfg.build()
        if args.mode == "train":
            mesh_cfg.validate_batch(args.train_batch_size, "--train_batch_size")
        mesh_cfg.validate_batch(args.sample_batch_size, "--sample_batch_size")
    except ValueError as e:
        raise SystemExit(str(e))
    if mesh is not None:
        from sinddm_tpu.parallel.mesh import batch_sharding

        sample_sharding = batch_sharding(mesh)
        print(f"mesh: {dict(zip(mesh.axis_names, mesh.devices.shape))}")
    scale_mul = (args.scale_mul[0], args.scale_mul[1])
    results_folder = os.path.join(args.results_folder, args.scope)

    pyramid = build_pyramid(
        os.path.join(args.dataset_folder, args.image_name),
        scale_factor=args.scale_factor,
        auto_scale=50000,
        save_to=args.dataset_folder if os.access(args.dataset_folder, os.W_OK) else None,
    )
    sched = make_schedules(
        timesteps=args.timesteps,
        scale_losses=pyramid.rescale_losses,
        n_scales=pyramid.n_scales,
        loss_factor=args.loss_factor,
        train_full_t=True,
    )
    sample_t_list = (
        list(sched.num_timesteps_ideal[1:])
        if args.sample_t_list is None
        else list(args.sample_t_list)
    )

    model = SinDDMNet(
        dim=args.dim,
        compute_dtype=jnp.bfloat16 if args.compute_dtype == "bfloat16" else jnp.float32,
    )
    train_cfg = TrainConfig(
        train_batch_size=args.train_batch_size,
        train_lr=args.train_lr,
        train_num_steps=args.train_num_steps,
        grad_accumulate=args.grad_accumulate,
        save_and_sample_every=args.save_and_sample_every,
        avg_window=args.avg_window,
        sched_milestones=tuple(v * 1000 for v in args.sched_k_milestones),
        steps_per_chunk=args.steps_per_chunk,
        fused_mode=args.fused_mode,
    )
    diff_cfg = DiffusionConfig(
        timesteps=args.timesteps,
        scale_factor=args.scale_factor,
        loss_factor=args.loss_factor,
        sample_limited_t=args.sample_limited_t,
        omega=args.omega,
    )
    trainer = MultiscaleTrainer(
        model, sched, pyramid, train_cfg, diff_cfg, results_folder,
        seed=args.seed, mesh=mesh,
    )
    if args.load_reference_ckpt:
        from sinddm_tpu.models.convert_reference import load_reference_checkpoint

        ref_params, ref_ema, ref_step = load_reference_checkpoint(
            args.load_reference_ckpt
        )
        trainer.state = trainer.state.replace(
            params=ref_params, ema_params=ref_ema,
            step=jnp.asarray(ref_step, jnp.int32),
        )
        print(f"imported reference checkpoint at step {ref_step}")
    elif args.load_checkpoint:
        trainer.load_path(args.load_checkpoint)
    elif args.load_milestone > 0 or args.load_milestone == -1:
        trainer.load(args.load_milestone)  # -1 = resume latest

    key = jax.random.PRNGKey(args.seed + 777)

    def dump_interm(aux_list, scales=None):
        # per-step frame dumps, reference layout interm_samples_scale_{s}/
        # output_t-{t:03}_s-{s}.png (models.py:469-475,511-526)
        if not dist.is_primary():
            return
        from sinddm_tpu.ops.image_io import save_interm_frames

        if scales is None:
            scales = list(range(len(aux_list)))
        for s, aux in zip(scales, aux_list):
            if not isinstance(aux, dict) or aux.get("interm") is None:
                continue
            t_min = (
                sched.num_timesteps_ideal[s + 1]
                if (args.sample_limited_t and s < pyramid.n_scales - 1)
                else 0
            )
            save_interm_frames(
                aux["interm"],
                Path(results_folder) / f"interm_samples_scale_{s}",
                s=s, t_min=t_min,
            )

    def run_sample(desc: str, **kw):
        interm_aux = [] if args.save_interm else None
        outs = sample_scales(
            model, trainer.state.ema_params, sched, pyramid.sizes_hw, key,
            scale_factor=pyramid.scale_factor, n_scales=pyramid.n_scales,
            batch_size=args.sample_batch_size, scale_mul=scale_mul,
            custom_t_list=sample_t_list, sample_limited_t=args.sample_limited_t,
            omega=args.omega, sharding=sample_sharding,
            precompile=args.precompile,
            collect_interm=args.save_interm,
            collect_aux=interm_aux,
            **kw,
        )
        if interm_aux is not None:
            dump_interm(interm_aux)
        final_dir = Path(results_folder) / "final_samples"
        stamp = str(datetime.datetime.now()).replace(":", "_").replace(" ", "_")
        for i, out in enumerate(outs):
            save_image(
                dist.fetch((out + 1) * 0.5),
                final_dir / f"out_s{i}_{desc}_{stamp}.png",
            )
        unb = Path(results_folder) / f"final_samples_unbatched_{desc}_{stamp}"
        fin01 = dist.fetch((outs[-1] + 1) * 0.5)
        for b in range(fin01.shape[0]):
            save_image(fin01[b], unb / f"out_b{b}.png")
        return outs

    if args.mode == "train":

        def on_milestone(milestone, tr):
            from sinddm_tpu.apps.sampling import jit_sample_scale0

            k = jax.random.PRNGKey(milestone)
            h0, w0 = pyramid.sizes_hw[0]
            x, _, _ = jit_sample_scale0(
                model, tr.state.ema_params, sched, k, (16, h0, w0, 3), 0, 0,
                args.omega,
            )
            save_image(
                dist.fetch((x + 1) * 0.5),
                Path(results_folder) / f"sample-{milestone}.png",
            )

        trainer.train(
            fused=args.steps_per_chunk > 0, on_milestone=on_milestone
        )
        run_sample("post_train", custom_sample=True)

    elif args.mode == "sample":
        run_sample("sample", custom_sample=True)

    elif args.mode in ("harmonization", "style_transfer"):
        from sinddm_tpu.apps.i2i import image2image

        i2i_folder = os.path.join(args.dataset_folder, "i2i")
        input_img = load_external_image(
            os.path.join(i2i_folder, args.input_image), auto_scale=50000
        )
        mask_img = None
        if args.mode == "harmonization":
            from PIL import Image

            mask_img = (
                np.asarray(
                    Image.open(os.path.join(i2i_folder, args.harm_mask)).convert(
                        "RGB"
                    ),
                    np.float32,
                )
                / 255.0
            )
        start_t = (
            args.start_t_harm if args.mode == "harmonization" else args.start_t_style
        )
        start_s = pyramid.n_scales - 1
        custom_t = [0] * (pyramid.n_scales - 1) + [start_t]
        interm_aux = [] if args.save_interm else None
        final, _ = image2image(
            model, trainer.state.ema_params, sched, pyramid, input_img, key,
            mode=args.mode, mask_img=mask_img, start_s=start_s,
            custom_t=custom_t, batch_size=args.sample_batch_size,
            scale_mul=(1.0, 1.0), omega=args.omega,
            sample_limited_t=args.sample_limited_t, sharding=sample_sharding,
            collect_aux=interm_aux, collect_interm=args.save_interm,
        )
        if interm_aux is not None:
            dump_interm(
                interm_aux, scales=list(range(start_s, pyramid.n_scales))
            )
        out_dir = Path(results_folder) / "i2i_final_samples"
        stem = args.input_image.rsplit(".", 1)[0]
        final_np = dist.fetch(final)
        save_image(final_np, out_dir / f"{stem}_i2i_{args.mode}.png")
        for b in range(final.shape[0]):
            save_image(
                final_np[b],
                Path(results_folder) / f"unbatched_i2i_{stem}" / f"out_b{b}.png",
            )
        print(f"saved i2i results to {out_dir}")

    elif args.mode == "roi":
        from sinddm_tpu.apps.roi import roi_guided_sampling

        n_last = pyramid.n_scales - 1
        h_fin, w_fin = pyramid.sizes_hw[n_last]
        # target boxes address the scale_mul-enlarged canvas (reference
        # main.py:269-271 selects them on an empty canvas of that size)
        canvas_h = int(h_fin * scale_mul[0])
        canvas_w = int(w_fin * scale_mul[1])
        if args.interactive:
            import cv2

            image_path = os.path.join(
                args.dataset_folder,
                f"scale_{n_last}",
                args.image_name.rsplit(".", 1)[0] + ".png",
            )
            img = cv2.imread(image_path)
            r = cv2.selectROI(img)
            target_roi = [r[1], r[0], r[3], r[2]]
            empty = np.ones((canvas_h, canvas_w, 3))
            roi_bb_list = []
            for _ in range(args.roi_n_tar):
                r = cv2.selectROI(empty)
                roi_bb_list.append([r[1], r[0], r[3], r[2]])
        else:
            assert args.target_roi is not None and args.roi_bb, (
                "--roi mode needs --target_roi and --roi_bb (or --interactive)"
            )
            target_roi = list(args.target_roi)
            roi_bb_list = [list(bb) for bb in args.roi_bb]

        # roi_patches.png preview: the target patch pasted (nearest-resized)
        # into an empty canvas at every target box (reference main.py:272-285)
        from PIL import Image as _Image

        from sinddm_tpu.ops.image_io import to_uint8 as _to_uint8

        src01 = (np.asarray(pyramid.images[n_last]) + 1.0) * 0.5
        ty, tx, th, tw = (int(v) for v in target_roi)
        patch01 = src01[ty : ty + th, tx : tx + tw, :]
        preview = np.ones((canvas_h, canvas_w, 3), np.float32)
        for bb in roi_bb_list:
            y, x, h, w = (int(v) for v in bb)
            resized = np.asarray(
                _Image.fromarray(_to_uint8(patch01)).resize(
                    (w, h), _Image.NEAREST
                ),
                np.float32,
            ) / 255.0
            preview[y : y + h, x : x + w, :] = resized
        save_image(preview, Path(results_folder) / "roi_patches.png")

        interm_aux = [] if args.save_interm else None
        outs = roi_guided_sampling(
            model, trainer.state.ema_params, sched, pyramid, key,
            target_roi=target_roi, roi_bb_list=roi_bb_list,
            custom_t_list=sample_t_list, batch_size=args.sample_batch_size,
            scale_mul=scale_mul, omega=args.omega,
            sample_limited_t=args.sample_limited_t, sharding=sample_sharding,
            precompile=args.precompile,
            collect_aux=interm_aux, collect_interm=args.save_interm,
        )
        if interm_aux is not None:
            dump_interm(interm_aux)
        out_dir = Path(results_folder) / "final_samples"
        save_image(dist.fetch((outs[-1] + 1) * 0.5), out_dir / "roi_out.png")
        print(f"saved ROI results to {out_dir}")

    elif args.mode in ("clip_content", "clip_style_gen", "clip_style_trans", "clip_roi"):
        from sinddm_tpu.apps.clip_apps import run_clip_mode

        run_clip_mode(
            args, model, trainer, sched, pyramid, key, sample_t_list,
            scale_mul, results_folder, sharding=sample_sharding,
            precompile=args.precompile,
        )
    else:
        raise NotImplementedError(args.mode)


if __name__ == "__main__":
    main()
