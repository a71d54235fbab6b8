"""Proxy-SIFID trend over training milestones (flagship evidence).

For each checkpoint given, samples a 16-image full pyramid on the TPU and
reports conv-proxy SIFID (metrics.py) of the finest-scale outputs against
the training image, and saves a sample grid to docs/evidence/.

Usage:
  python benchmarks/milestone_sifid.py [--image path.png] \
      results/balloons/model-9 [...more checkpoint dirs]
"""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import argparse
import json


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--image", default="/root/reference/datasets/balloons/balloons.png"
    )
    ap.add_argument("paths", nargs="+")
    args = ap.parse_args()

    import jax
    import numpy as np

    from sinddm_tpu import build_pyramid, make_schedules
    from sinddm_tpu.apps import sample_scales
    from sinddm_tpu.config import DiffusionConfig, TrainConfig
    from sinddm_tpu.metrics import conv_feature_extractor, sifid_batch
    from sinddm_tpu.models import SinDDMNet
    from sinddm_tpu.ops.image_io import save_image
    from sinddm_tpu.training import MultiscaleTrainer

    scene = _os.path.basename(args.image).rsplit(".", 1)[0]
    pyr = build_pyramid(args.image)
    sched = make_schedules(
        timesteps=100, scale_losses=pyr.rescale_losses, n_scales=pyr.n_scales
    )
    model = SinDDMNet(dim=160)
    trainer = MultiscaleTrainer(
        model, sched, pyr, TrainConfig(), DiffusionConfig(), "/tmp/ms_sifid"
    )
    feat = conv_feature_extractor()
    real = pyr.images[-1]

    results = {}
    for path in args.paths:
        trainer.load_path(path)
        outs = sample_scales(
            model, trainer.state.ema_params, sched, pyr.sizes_hw,
            jax.random.PRNGKey(42), scale_factor=pyr.scale_factor,
            n_scales=pyr.n_scales, batch_size=16, custom_sample=True,
        )
        finest = np.asarray(outs[-1])
        vals = sifid_batch(real, finest, feat)
        name = "/".join(path.rstrip("/").split("/")[-2:])
        results[name] = {
            "step": int(trainer.state.step),
            "sifid_mean": round(float(vals.mean()), 4),
            "sifid_std": round(float(vals.std()), 4),
        }
        repo = _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__)))
        save_image(
            (finest + 1) * 0.5,
            _os.path.join(
                repo, "docs", "evidence",
                f"{scene}_{name.replace('/', '_')}_grid.png",
            ),
        )
        print(json.dumps({name: results[name]}), flush=True)
    print(json.dumps(results))


if __name__ == "__main__":
    main()
