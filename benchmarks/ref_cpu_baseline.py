"""Measure the PyTorch reference (fallenshock/SinDDM) on this host's CPU.

Runs the reference code itself (imported read-only from /root/reference,
NOT copied) with random-init weights — sampling wall-clock and train
steps/s are weight-independent — and reports:

* full-pyramid sample, batch 16, 'balloons' (reference
  ``SinDDM/trainer.py:226-285`` -> ``models.py:462-568``), median of
  ``--sample_reps`` runs;
* train steps/s over ``--train_steps`` steps of the reference train loop
  (``SinDDM/trainer.py:189-224``).

These are the denominators for BASELINE.md's ">=20x PyTorch-CPU" north
star. Writes one JSON line to stdout and (optionally) a file.

Usage:  python benchmarks/ref_cpu_baseline.py [--out ref_cpu.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=None)
    ap.add_argument("--train_steps", type=int, default=60)
    ap.add_argument("--sample_reps", type=int, default=3)
    ap.add_argument("--threads", type=int, default=0,
                    help="torch CPU threads (0 = torch default: all cores)")
    args = ap.parse_args()

    sys.path.insert(0, "/root/reference")
    import numpy as np
    import torch

    # skimage is not installed in this image; the reference imports it at
    # module scope (functions.py:3, trainer.py:20) but the sampling/train
    # paths measured here never call it. Provide a scipy-backed stub so
    # the reference runs untouched.
    if "skimage" not in sys.modules:
        import types

        from scipy import ndimage

        sk = types.ModuleType("skimage")
        morph = types.ModuleType("skimage.morphology")
        filt = types.ModuleType("skimage.filters")
        expo = types.ModuleType("skimage.exposure")

        def _disk(r):
            yy, xx = np.mgrid[-r : r + 1, -r : r + 1]
            return (yy * yy + xx * xx <= r * r).astype(np.uint8)

        morph.disk = _disk
        morph.binary_dilation = lambda img, footprint=None: ndimage.binary_dilation(
            img, structure=footprint
        )
        filt.gaussian = lambda img, sigma=1.0, **kw: ndimage.gaussian_filter(
            np.asarray(img, np.float64), sigma=sigma
        )

        def _match_histograms(*a, **kw):
            raise NotImplementedError("not exercised by this benchmark")

        expo.match_histograms = _match_histograms
        sk.morphology, sk.filters, sk.exposure = morph, filt, expo
        sys.modules.update(
            {
                "skimage": sk,
                "skimage.morphology": morph,
                "skimage.filters": filt,
                "skimage.exposure": expo,
            }
        )

    # torchvision (CPU wheel) is likewise absent; the reference needs only
    # transforms.{Compose,ToTensor,Lambda} and utils.save_image on the
    # measured paths — provide PIL-backed equivalents.
    if "torchvision" not in sys.modules:
        import types

        from PIL import Image

        tv = types.ModuleType("torchvision")
        tr = types.ModuleType("torchvision.transforms")
        ut = types.ModuleType("torchvision.utils")

        class _Compose:
            def __init__(self, fns):
                self.fns = fns

            def __call__(self, x):
                for f in self.fns:
                    x = f(x)
                return x

        class _ToTensor:
            def __call__(self, pic):
                arr = np.asarray(pic, np.float32) / 255.0
                if arr.ndim == 2:
                    arr = arr[..., None]
                return torch.from_numpy(arr.transpose(2, 0, 1).copy())

        tr.Compose, tr.ToTensor, tr.Lambda = _Compose, _ToTensor, (lambda f: f)

        def _save_image(tensor, path, nrow=8, **kw):
            t = tensor.detach().cpu().float().clamp(0, 1)
            if t.dim() == 3:
                t = t[None]
            b, c, h, w = t.shape
            ncol = min(nrow, b)
            nr = -(-b // ncol)
            grid = np.zeros((c, nr * (h + 2) + 2, ncol * (w + 2) + 2), np.float32)
            for i in range(b):
                r, col = divmod(i, ncol)
                grid[
                    :, r * (h + 2) + 2 : r * (h + 2) + 2 + h,
                    col * (w + 2) + 2 : col * (w + 2) + 2 + w,
                ] = t[i].numpy()
            img = (grid.transpose(1, 2, 0) * 255).astype(np.uint8)
            if img.shape[-1] == 1:
                img = img[..., 0]
            Image.fromarray(img).save(path)

        ut.save_image = _save_image
        tv.transforms, tv.utils = tr, ut
        sys.modules.update(
            {
                "torchvision": tv,
                "torchvision.transforms": tr,
                "torchvision.utils": ut,
            }
        )

    if args.threads > 0:
        torch.set_num_threads(args.threads)
    torch.manual_seed(0)

    from SinDDM.functions import create_img_scales
    from SinDDM.models import MultiScaleGaussianDiffusion, SinDDMNet
    from SinDDM.trainer import MultiscaleTrainer

    # The reference writes scale_i/ dirs next to the image; stage a copy.
    work = "/tmp/ref_cpu_bench"
    ds = os.path.join(work, "balloons")
    os.makedirs(ds, exist_ok=True)
    shutil.copy("/root/reference/datasets/balloons/balloons.png", ds)
    results = os.path.join(work, "results")

    device = "cpu"
    sizes, rescale_losses, scale_factor, n_scales = create_img_scales(
        ds + "/", "balloons.png", scale_factor=1.411, create=True,
        auto_scale=50000,
    )
    model = SinDDMNet(dim=160, multiscale=True, device=device).to(device)
    ms_diffusion = MultiScaleGaussianDiffusion(
        denoise_fn=model, save_interm=False, results_folder=results,
        n_scales=n_scales, scale_factor=scale_factor, image_sizes=sizes,
        scale_mul=(1, 1), channels=3, timesteps=100, train_full_t=True,
        scale_losses=rescale_losses, loss_factor=1, loss_type="l1",
        betas=None, device=device, reblurring=True, sample_limited_t=False,
        omega=0,
    ).to(device)
    trainer = MultiscaleTrainer(
        ms_diffusion, folder=ds + "/", n_scales=n_scales,
        scale_factor=scale_factor, image_sizes=sizes, train_batch_size=32,
        train_lr=1e-3, train_num_steps=args.train_steps,
        gradient_accumulate_every=1, ema_decay=0.995, fp16=False,
        save_and_sample_every=10_000, avg_window=100,
        sched_milestones=[20_000], results_folder=results, device=device,
    )
    sample_t_list = ms_diffusion.num_timesteps_ideal[1:]
    print(
        f"pyramid: n_scales={n_scales} sizes={sizes} t_list={sample_t_list} "
        f"threads={torch.get_num_threads()}",
        file=sys.stderr,
    )

    # ---- sampling: full pyramid, batch 16 (reference defaults) ----------
    times = []
    for rep in range(args.sample_reps):
        t0 = time.time()
        trainer.sample_scales(
            scale_mul=(1, 1), custom_sample=True, image_name="balloons.png",
            batch_size=16, custom_t_list=sample_t_list, save_unbatched=False,
        )
        times.append(time.time() - t0)
        print(f"sample rep {rep}: {times[-1]:.1f} s", file=sys.stderr)
    sample_s = float(np.median(times))

    # ---- training: reference per-step loop ------------------------------
    t0 = time.time()
    trainer.train()
    train_t = time.time() - t0
    train_sps = args.train_steps / train_t
    print(f"train: {args.train_steps} steps in {train_t:.1f} s", file=sys.stderr)

    out = {
        "host": "cpu",
        "torch": torch.__version__,
        "threads": torch.get_num_threads(),
        "full_pyramid_sample_batch16_balloons_s": round(sample_s, 2),
        "sample_times_s": [round(t, 2) for t in times],
        "train_steps_per_s": round(train_sps, 3),
        "train_steps_measured": args.train_steps,
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
