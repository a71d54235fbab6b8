"""Benchmark: full-pyramid 16-image sample of 'balloons' on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

The baseline is the BASELINE.json north star: full-pyramid sample, batch
16, 'balloons', < 5 s wall-clock on TPU v5e-1. vs_baseline = 5.0 / value
(>1 means beating the target). The model is the reference-default denoiser
(dim=160); sampling cost is weight-independent, so random-init EMA weights
time identically to trained ones.

Compile time is excluded (one warm-up pyramid run), matching how the
reference's per-step GPU timing excludes CUDA context setup; compile and
extra stats go to stderr.
"""

from __future__ import annotations

import json
import sys
import time


def main() -> None:
    import jax
    import numpy as np

    from sinddm_tpu import build_pyramid, make_schedules
    from sinddm_tpu.apps import sample_scales
    from sinddm_tpu.models import SinDDMNet

    t_setup = time.time()
    pyr = build_pyramid("/root/reference/datasets/balloons/balloons.png")
    sched = make_schedules(
        timesteps=100, scale_losses=pyr.rescale_losses, n_scales=pyr.n_scales
    )
    model = SinDDMNet(dim=160)
    key = jax.random.PRNGKey(0)
    h0, w0 = pyr.sizes_hw[0]
    params = model.init(
        key,
        jax.numpy.zeros((1, h0, w0, 3)),
        jax.numpy.zeros((1,), jax.numpy.int32),
        jax.numpy.asarray(0.0),
    )["params"]
    print(f"setup {time.time()-t_setup:.1f}s devices={jax.devices()}", file=sys.stderr)

    def run(seed: int):
        outs = sample_scales(
            model, params, sched, pyr.sizes_hw, jax.random.PRNGKey(seed),
            scale_factor=pyr.scale_factor, n_scales=pyr.n_scales,
            batch_size=16, custom_sample=True,
        )
        # force execution with a scalar device->host sync:
        # block_until_ready() returns early on the tunneled axon backend
        float(outs[-1].sum())
        return outs

    t_c = time.time()
    outs = run(0)  # compile
    compile_s = time.time() - t_c
    assert np.isfinite(np.asarray(outs[-1])).all()
    print(f"compile+first run {compile_s:.1f}s", file=sys.stderr)

    times = []
    for i in range(5):
        t0 = time.time()
        run(i + 1)
        times.append(time.time() - t0)
    value = float(np.median(times))
    print(f"runs: {[round(t, 4) for t in times]}", file=sys.stderr)

    print(
        json.dumps(
            {
                "metric": "full_pyramid_sample_batch16_balloons",
                "value": round(value, 4),
                "unit": "s",
                "vs_baseline": round(5.0 / value, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
