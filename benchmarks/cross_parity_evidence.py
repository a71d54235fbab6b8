"""Fixed-seed full-pyramid parity vs the reference sampler (north star).

Loads a flagship checkpoint, exports its EMA weights to the reference's
own ``MultiScaleGaussianDiffusion`` (SinDDM/models.py:155-631, run on
CPU torch), then drives BOTH samplers through the full balloons pyramid
with an identical injected noise sequence and reports per-scale output
differences plus proxy-SIFID of each against the training image — the
BASELINE "SIFID parity at fixed seed" check, measured against the
reference's code rather than hand-derived oracles.

Runs entirely on CPU (safe to run while the TPU is busy).

Usage:
  python benchmarks/cross_parity_evidence.py \
      [--checkpoint checkpoints/balloons-120k] [--batch 2] [--seed 3]
"""

from __future__ import annotations

import os as _os, sys as _sys

_REPO = _os.path.dirname(_os.path.dirname(_os.path.abspath(_file_ := __file__)))
_sys.path.insert(0, _REPO)
_sys.path.insert(0, _os.path.join(_REPO, "tests"))

import argparse
import json
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--checkpoint", default="checkpoints/balloons-120k")
    ap.add_argument(
        "--image", default="/root/reference/datasets/balloons/balloons.png"
    )
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--seed", type=int, default=3)
    ap.add_argument("--out", default="benchmarks/cross_parity_evidence.json")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import torch

    from _reference_loader import load_reference_models
    from sinddm_tpu import build_pyramid, make_schedules
    from sinddm_tpu.config import DiffusionConfig, TrainConfig
    from sinddm_tpu.diffusion.core import sample_scale0, sample_via_scale
    from sinddm_tpu.metrics import conv_feature_extractor, sifid_batch
    from sinddm_tpu.models import SinDDMNet
    from sinddm_tpu.models.export_reference import diffusion_state_dict
    from sinddm_tpu.ops.resize import resize_bilinear
    from sinddm_tpu.training import MultiscaleTrainer

    torch.set_num_threads(1)
    B = args.batch
    pyr = build_pyramid(args.image)
    sched = make_schedules(
        timesteps=100, scale_losses=pyr.rescale_losses, n_scales=pyr.n_scales
    )
    model = SinDDMNet(dim=160)
    trainer = MultiscaleTrainer(
        model, sched, pyr, TrainConfig(), DiffusionConfig(), "/tmp/xparity"
    )
    trainer.load_path(args.checkpoint)
    ema = trainer.state.ema_params
    custom_t = list(sched.num_timesteps_ideal[1:])

    # ---- ours: full pyramid, core functions, recorded key splits --------
    def model_fn(x, t, s):
        return model.apply({"params": ema}, x, t, s)

    t0 = time.time()
    key = jax.random.PRNGKey(args.seed)
    scale_keys = []
    ours = []
    for s in range(pyr.n_scales):
        key, sub = jax.random.split(key)
        scale_keys.append(sub)
        if s == 0:
            h, w = pyr.sizes_hw[0]
            x, _, _ = sample_scale0(model_fn, sched, (B, h, w, 3), sub, s=0)
        else:
            prev = resize_bilinear(ours[-1], pyr.sizes_hw[s])
            x, _, _ = sample_via_scale(
                model_fn, sched, prev, sub, s=s, total_t=custom_t[s - 1]
            )
        ours.append(np.asarray(x))
    ours_s = time.time() - t0

    # ---- theirs: the reference's own sampler with our injected noise ----
    ref_models = load_reference_models()
    ref_net = ref_models.SinDDMNet(dim=160, multiscale=True, device="cpu")
    ref_diff = ref_models.MultiScaleGaussianDiffusion(
        denoise_fn=ref_net,
        n_scales=pyr.n_scales,
        scale_factor=pyr.scale_factor,
        image_sizes=[(w, h) for h, w in pyr.sizes_hw],
        timesteps=100,
        train_full_t=True,
        scale_losses=list(pyr.rescale_losses),
        loss_factor=1.0,
        device="cpu",
        reblurring=True,
    )
    ref_diff.load_state_dict(
        {
            k: torch.from_numpy(np.ascontiguousarray(v))
            for k, v in diffusion_state_dict(ema, sched).items()
        }
    )
    ref_diff.eval()

    queue = []

    def replay(sub, shape_nhwc, n_steps):
        k = sub
        k, k0 = jax.random.split(k)
        draws = [np.asarray(jax.random.normal(k0, shape_nhwc, jnp.float32))]
        for _ in range(n_steps):
            k, st = jax.random.split(k)
            draws.append(np.asarray(jax.random.normal(st, shape_nhwc, jnp.float32)))
        queue.extend(
            torch.from_numpy(np.ascontiguousarray(np.transpose(a, (0, 3, 1, 2))))
            for a in draws
        )

    def pop(shape):
        t = queue.pop(0)
        assert tuple(t.shape) == tuple(shape), (tuple(t.shape), tuple(shape))
        return t

    ref_models.noise_like = lambda shape, device, repeat=False: pop(shape)
    torch.randn = lambda *size, **kw: pop(size[0] if len(size) == 1 else size)
    torch.randn_like = lambda x, **kw: pop(x.shape)

    t0 = time.time()
    theirs = []
    with torch.no_grad():
        for s in range(pyr.n_scales):
            h, w = pyr.sizes_hw[s]
            if s == 0:
                replay(scale_keys[0], (B, h, w, 3), 100)
                img = ref_diff.sample(batch_size=B, s=0)
            else:
                replay(scale_keys[s], (B, h, w, 3), custom_t[s - 1])
                img = ref_diff.sample_via_scale(
                    B, img, s, scale_mul=(1, 1), custom_sample=True,
                    custom_img_size_idx=s, custom_t=custom_t[s - 1],
                )
            assert not queue
            theirs.append(np.transpose(img.numpy(), (0, 2, 3, 1)))
    theirs_s = time.time() - t0

    # ---- compare --------------------------------------------------------
    feat = conv_feature_extractor()
    real = pyr.images[-1]
    report = {
        "checkpoint": args.checkpoint,
        "batch": B,
        "seed": args.seed,
        "custom_t": custom_t,
        "ours_wall_s": round(ours_s, 1),
        "reference_wall_s": round(theirs_s, 1),
        "per_scale": {},
    }
    for s, (a, b) in enumerate(zip(ours, theirs)):
        d = np.abs(a - b)
        report["per_scale"][f"s{s}"] = {
            "hw": list(pyr.sizes_hw[s]),
            "max_abs_diff": float(d.max()),
            "mean_abs_diff": float(d.mean()),
        }
    report["sifid_proxy_ours"] = round(
        float(np.mean(sifid_batch(real, ours[-1], feat))), 5
    )
    report["sifid_proxy_reference"] = round(
        float(np.mean(sifid_batch(real, theirs[-1], feat))), 5
    )
    with open(args.out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
