"""Back the SIFID-proxy ranking claim (metrics.py) with measurements.

``metrics.conv_feature_extractor`` is a fixed *random* conv feature map —
the no-egress stand-in for InceptionV3. The claim that random-feature
FIDs rank images like learned-feature FIDs is tested here two ways:

1. **Rank stability across independent feature maps**: three conv proxies
   with different seeds/widths plus the tiny-CLIP conv1 patch embedding
   must produce the same ordering (Spearman rho) over a graded image set;
2. **Sanity anchors**: the training image scores ~0, uniform noise scores
   worst, corruption severity orders monotonically.

Graded set: the balloons training image under increasing noise + blur,
other reference scenes (true negatives), and uniform noise.

When real ViT-B/32 weights appear, ``tests/test_real_clip.py`` upgrades
this evidence with real-CLIP-feature SIFID agreement.

Usage: JAX_PLATFORMS=cpu python benchmarks/sifid_correlation.py
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import jax

    from scipy import stats

    from sinddm_tpu.metrics import (
        clip_feature_extractor,
        conv_feature_extractor,
        sifid,
    )
    from sinddm_tpu.models.clip.convert import random_clip_params
    from sinddm_tpu.models.clip.model import tiny_clip_config
    from sinddm_tpu.pyramid import build_pyramid

    pyr = build_pyramid("/root/reference/datasets/balloons/balloons.png")
    real = pyr.images[-1]
    rng = np.random.default_rng(0)

    def blur(img, k):
        x = img
        for _ in range(k):
            p = np.pad(x, ((1, 1), (1, 1), (0, 0)), mode="edge")
            x = (
                p[:-2, 1:-1] + p[2:, 1:-1] + p[1:-1, :-2] + p[1:-1, 2:] + 4 * x
            ) / 8.0
        return x

    graded = {
        "self": real.copy(),
        "noise_0.1": np.clip(real + 0.1 * rng.standard_normal(real.shape), -1, 1),
        "noise_0.3": np.clip(real + 0.3 * rng.standard_normal(real.shape), -1, 1),
        "noise_0.6": np.clip(real + 0.6 * rng.standard_normal(real.shape), -1, 1),
        "blur_2": blur(real, 2),
        "blur_8": blur(real, 8),
        "uniform_noise": rng.uniform(-1, 1, real.shape).astype(np.float32),
    }
    # true negatives: other scenes resized to the same canvas
    from sinddm_tpu.ops.resize import resize_bilinear
    import jax.numpy as jnp

    for scene, fname in (("forest", "forest.png"), ("starry_night", "starry_night.png")):
        try:
            other = build_pyramid(
                f"/root/reference/datasets/{scene}/{fname}"
            ).images[-1]
            graded[scene] = np.asarray(
                resize_bilinear(jnp.asarray(other)[None], real.shape[:2])[0]
            )
        except Exception:
            pass

    extractors = {
        "conv_proxy_s0_d64": conv_feature_extractor(dim=64, seed=0),
        "conv_proxy_s1_d64": conv_feature_extractor(dim=64, seed=1),
        "conv_proxy_s2_d32": conv_feature_extractor(dim=32, seed=2),
    }
    clip_model, clip_vars = random_clip_params(tiny_clip_config(), seed=0)
    extractors["tinyclip_conv1"] = clip_feature_extractor(
        clip_model, clip_vars, feature="conv1"
    )
    extractors["tinyclip_tokens"] = clip_feature_extractor(
        clip_model, clip_vars, feature="tokens"
    )

    names = list(graded)
    table = {}
    for ename, fn in extractors.items():
        table[ename] = [sifid(real, graded[n], fn) for n in names]

    base = table["conv_proxy_s0_d64"]
    rhos = {
        ename: float(stats.spearmanr(base, vals).statistic)
        for ename, vals in table.items()
        if ename != "conv_proxy_s0_d64"
    }
    out = {
        "images": names,
        "sifid": {k: [round(v, 4) for v in vals] for k, vals in table.items()},
        "spearman_vs_proxy_seed0": {k: round(v, 3) for k, v in rhos.items()},
        "anchors": {
            "self_is_min": bool(np.argmin(base) == names.index("self")),
            "noise_monotone": bool(
                base[names.index("noise_0.1")]
                < base[names.index("noise_0.3")]
                < base[names.index("noise_0.6")]
            ),
        },
    }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
