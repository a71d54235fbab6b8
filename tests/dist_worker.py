"""Worker for tests/test_distributed.py — NOT a pytest module.

Runs the full trainer + sampler on a global ('data'=4, 'spatial'=2) mesh
of 8 virtual CPU devices and dumps deterministic results. The SAME script
serves both layouts under test:

* single-process: 8 local devices (``--nproc 1``),
* multi-host: 2 localhost processes x 4 local devices each
  (``--nproc 2 --pid {0,1} --port P``), joined via
  ``sinddm_tpu.parallel.distributed.initialize`` — the DCN stand-in.

Both must produce the same losses/params/samples: the global mesh,
shardings, and RNG keys are identical; only process placement differs.
Exercises per-process staging (trainer + sample_scales), the collective
orbax save and the abstract-template restore (trainer.load under a mesh),
and primary-only host IO.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out")
    ap.add_argument("img")
    ap.add_argument("workdir")
    ap.add_argument("--nproc", type=int, default=1)
    ap.add_argument("--pid", type=int, default=0)
    ap.add_argument("--port", default="")
    ap.add_argument("--local_devices", type=int, default=0,
                    help="virtual CPU devices per process (default 8/nproc)")
    ap.add_argument("--guided", action="store_true",
                    help="run the CLIP-guided samplers (per-scale AND "
                         "bucketed, tiny CLIP) over the global mesh "
                         "instead of the trainer flow")
    args = ap.parse_args()

    n_local = args.local_devices or 8 // args.nproc
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n_local}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")

    from sinddm_tpu.parallel import distributed as dist

    if args.nproc > 1:
        assert dist.initialize(
            f"localhost:{args.port}", args.nproc, args.pid
        )
    assert len(jax.devices()) == n_local * args.nproc, jax.devices()

    import numpy as np

    from sinddm_tpu import build_pyramid, make_schedules
    from sinddm_tpu.apps import sample_scales
    from sinddm_tpu.config import DiffusionConfig, TrainConfig
    from sinddm_tpu.models import SinDDMNet
    from sinddm_tpu.parallel.mesh import batch_sharding, make_mesh
    from sinddm_tpu.training import MultiscaleTrainer

    if args.guided:
        _run_guided(args)
        return

    mesh = make_mesh(spatial=2)  # ('data'=4, 'spatial'=2) global mesh
    pyr = build_pyramid(args.img, save_to=None)
    sched = make_schedules(
        timesteps=8, scale_losses=pyr.rescale_losses, n_scales=pyr.n_scales
    )
    model = SinDDMNet(dim=8)
    tr = MultiscaleTrainer(
        model, sched, pyr,
        TrainConfig(train_batch_size=8, steps_per_chunk=4, train_num_steps=8),
        DiffusionConfig(), args.workdir, seed=0, mesh=mesh,
    )
    losses_a = tr.train_chunk(4)

    # collective orbax save -> abstract-template restore over the mesh
    tr.save(1)
    tr.load(1)
    losses_b = tr.train_chunk(4)

    outs = sample_scales(
        model, tr.state.ema_params, sched, pyr.sizes_hw,
        jax.random.PRNGKey(7), scale_factor=pyr.scale_factor,
        n_scales=pyr.n_scales, batch_size=8, custom_sample=True,
        sharding=batch_sharding(mesh),
    )
    sample = dist.fetch(outs[-1])
    p0 = dist.fetch(jax.tree.leaves(tr.state.params)[0])
    if dist.is_primary():
        np.savez(
            args.out,
            losses_a=np.asarray(losses_a),
            losses_b=np.asarray(losses_b),
            sample=sample,
            p0=p0,
            step=int(tr.state.step),
        )
    print(f"worker pid={args.pid} done", file=sys.stderr)


def _run_guided(args) -> None:
    """CLIP-guided equality payload: per-scale AND bucketed guided
    sampling (tiny CLIP, scale 0 guided too — exercising the multi-host
    staging of keys/carries/embeds and the scale-0 carry lift) over a
    ('data'=8,) global mesh. Same keys + same global mesh ==> the 2-process
    layout must reproduce the single-process run."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from sinddm_tpu import build_pyramid, make_schedules
    from sinddm_tpu.apps.clip_apps import clip_sampling
    from sinddm_tpu.guidance.clip_extractor import ClipExtractor
    from sinddm_tpu.models import SinDDMNet
    from sinddm_tpu.models.clip.convert import random_clip_params
    from sinddm_tpu.models.clip.model import tiny_clip_config
    from sinddm_tpu.parallel import distributed as dist
    from sinddm_tpu.parallel.mesh import batch_sharding, make_mesh

    mesh = make_mesh(spatial=1)  # ('data'=8,) global mesh
    shd = batch_sharding(mesh)
    pyr = build_pyramid(args.img, save_to=None, auto_scale=50000)
    sched = make_schedules(
        timesteps=6, scale_losses=pyr.rescale_losses, n_scales=pyr.n_scales
    )
    model = SinDDMNet(dim=8)
    h0, w0 = pyr.sizes_hw[0]
    params = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, h0, w0, 3)),
        jnp.zeros((1,), jnp.int32), jnp.asarray(0.0),
    )["params"]
    clip_model, clip_vars = random_clip_params(tiny_clip_config(), seed=0)
    extractor = ClipExtractor(clip_model, clip_vars, n_aug=2)
    n = pyr.n_scales
    kw = dict(
        text_input="a tree", strength=0.2, sample_batch_size=8,
        custom_t_list=[3] * (n - 1), guidance_sub_iters=[1] * n,
        quantile=0.5, llambda=0.1, stop_guidance=1, sharding=shd,
    )
    outs_ps, aux_ps = clip_sampling(
        model, params, sched, pyr, extractor, jax.random.PRNGKey(11), **kw
    )
    outs_b, aux_b = clip_sampling(
        model, params, sched, pyr, extractor, jax.random.PRNGKey(11),
        bucketed=True, **kw,
    )
    ps = dist.fetch(outs_ps[-1])
    bk = dist.fetch(outs_b[-1])
    if dist.is_primary():
        np.savez(
            args.out,
            per_scale=ps,
            bucketed=bk,
            scores_ps=np.asarray(aux_ps[-1]["clip_score"]),
            scores_b=np.asarray(aux_b[-1]["clip_score"]),
        )
    import sys as _s

    print(f"guided worker pid={args.pid} done", file=_s.stderr)


if __name__ == "__main__":
    main()
