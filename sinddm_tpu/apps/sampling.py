"""Cascaded multi-scale sampling — the pyramid driver.

Re-design of ``MultiscaleTrainer.sample_scales`` (reference
``SinDDM/trainer.py:226-285``) plus the size arithmetic of
``sample_via_scale`` (``SinDDM/models.py:549-568``): scale 0 from pure
noise (or from the training image / an injected image), then each finer
scale bilinearly upsamples the previous output, partially re-noises it and
denoises with the reblurring sampler.

Each scale is one jitted call (upsample + q_sample + the full reverse
``lax.scan`` fused into a single XLA program); JAX's jit cache gives one
compilation per (shape, t-count, scale) combination.
"""

from __future__ import annotations

import functools
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sinddm_tpu.diffusion.core import sample_scale0, sample_via_scale
from sinddm_tpu.models.denoiser import apply_denoiser_pallas
from sinddm_tpu.ops.resize import resize_bilinear
from sinddm_tpu.schedules import Schedules


def _make_model_fn(model, params, use_pallas: bool, fast_mode=None):
    if use_pallas:
        return lambda x, t, sc: apply_denoiser_pallas(params, x, t, sc)
    if fast_mode is not None:
        import jax.numpy as _jnp

        from sinddm_tpu.models.fast_denoiser import apply_denoiser_dot

        dt = {"bf16_dot": _jnp.bfloat16, "fp32_dot": _jnp.float32}[fast_mode]
        return lambda x, t, sc: apply_denoiser_dot(
            params, x, t, sc, compute_dtype=dt
        )
    return lambda x, t, sc: model.apply({"params": params}, x, t, sc)


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "shape", "s", "t_min", "omega", "guidance_fn", "sharding",
        "collect_interm", "use_pallas", "fast_mode",
    ),
)
def jit_sample_scale0(
    model, params, sched: Schedules, key, shape, s, t_min, omega,
    guidance_fn=None, guidance_carry=None, guidance_params=None,
    sharding=None, collect_interm=False, use_pallas=False, fast_mode=None,
):
    model_fn = _make_model_fn(model, params, use_pallas, fast_mode)

    x, carry, aux = sample_scale0(
        model_fn, sched, shape, key, s=s, t_min=t_min, omega=omega,
        guidance_fn=guidance_fn, guidance_carry=guidance_carry,
        guidance_params=guidance_params,
        sharding=sharding, collect_interm=collect_interm,
    )
    return x, carry, aux


@functools.partial(
    jax.jit,
    static_argnames=(
        "model", "size_hw", "s", "total_t", "t_min", "reblurring", "omega",
        "guidance_fn", "sharding", "collect_interm", "use_pallas", "fast_mode",
    ),
)
def jit_sample_via_scale(
    model, params, sched: Schedules, prev, key, size_hw, s, total_t, t_min,
    reblurring, omega, guidance_fn=None, guidance_carry=None,
    guidance_params=None, sharding=None,
    collect_interm=False, use_pallas=False, fast_mode=None,
):
    img_prev = resize_bilinear(prev, size_hw)
    model_fn = _make_model_fn(model, params, use_pallas, fast_mode)

    x, carry, aux = sample_via_scale(
        model_fn, sched, img_prev, key,
        s=s, total_t=total_t, t_min=t_min, reblurring=reblurring, omega=omega,
        guidance_fn=guidance_fn, guidance_carry=guidance_carry,
        guidance_params=guidance_params,
        sharding=sharding, collect_interm=collect_interm,
    )
    return x, carry, aux


def via_scale_size(
    sizes_hw: Sequence[Tuple[int, int]],
    *,
    s: int,
    n_scales: int,
    scale_factor: float,
    scale_mul: Tuple[float, float] = (1.0, 1.0),
    custom_sample: bool = False,
    custom_img_size_idx: int = 0,
    custom_image_size: Optional[Tuple[int, int]] = None,
) -> Tuple[int, int]:
    """Target (H, W) for a via-scale step. Reference models.py:554-565."""
    if custom_sample:
        if custom_img_size_idx >= n_scales:  # extrapolate past the pyramid
            size = sizes_hw[n_scales - 1]
            factor = scale_factor ** (custom_img_size_idx + 1 - n_scales)
            size = (int(size[0] * factor), int(size[1] * factor))
        else:
            size = sizes_hw[custom_img_size_idx]
    else:
        size = sizes_hw[s]
    image_size = (int(size[0] * scale_mul[0]), int(size[1] * scale_mul[1]))
    if custom_image_size is not None:
        image_size = custom_image_size
    return image_size


def sample_scales(
    model,
    params,
    sched: Schedules,
    sizes_hw: Sequence[Tuple[int, int]],
    key: jax.Array,
    *,
    scale_factor: float,
    n_scales: int,
    batch_size: int = 16,
    scale_mul: Tuple[float, float] = (1.0, 1.0),
    custom_t_list: Optional[Sequence[int]] = None,
    custom_scales: Optional[Sequence[int]] = None,
    custom_image_size_idxs: Optional[Sequence[int]] = None,
    custom_sample: bool = False,
    start_noise: bool = True,
    start_image: Optional[np.ndarray] = None,
    reblurring: bool = True,
    sample_limited_t: bool = False,
    omega: float = 0.0,
    guidance_factory: Optional[Callable[[int, Tuple[int, int]], Tuple[Any, Any]]] = None,
    guidance_params: Any = None,
    carry_transform: Optional[Callable[[int, Any, Tuple[int, int]], Any]] = None,
    collect_aux: Optional[List[Any]] = None,
    collect_interm: bool = False,
    sharding=None,
    use_pallas: bool = False,
    fast_mode: Optional[str] = None,
    precompile: bool = False,
) -> List[jnp.ndarray]:
    """Run the full pyramid; returns the list of per-scale outputs [B,H,W,3].

    Args mirror the reference driver (trainer.py:226-285). ``start_image``
    (float [-1,1] HWC) replaces ``start_noise=False``'s training-image
    injection. ``guidance_factory(s, size_hw) -> (guidance_fn,
    init_carry)`` builds the per-scale guidance hook (CLIP / ROI) from the
    scale and canvas size alone — it is memoized per (s, size_hw) and must
    not depend on the running carry (state flows through the carry itself);
    ``carry_transform(s, carry, size_hw)`` resizes guidance state between
    scales (reference models.py:528-534). ``guidance_params`` is an
    optional pytree (e.g. the CLIP tower variables) passed to every jitted
    scale as a TRACED argument and forwarded to the hook as its 7th
    positional arg — large frozen towers must travel this way rather than
    inside the hook's closure, where they would compile as HLO constants
    (~600 MB of literals at ViT-B/32 scale; the remote compile service
    rejects such programs).

    ``collect_interm=True`` stacks every intermediate denoised state into
    each scale's ``collect_aux`` entry under key ``"interm"``
    ([n_steps, B, H, W, 3], t descending) — the functional form of the
    reference's ``save_interm`` per-step image dumps (models.py:469-475,
    511-526); the CLI's ``--save_interm`` writes them as PNG grids.

    ``precompile=True`` warms the per-scale jit cache CONCURRENTLY before
    the sequential loop: every scale's shapes and static arguments are
    known upfront, so each executable is built in its own thread with
    dummy inputs. Measured on the real backend (remote compile service,
    ``benchmarks/measure_precompile*.py``): plain cold sampling drops
    77.3 s -> 48.2 s (1.6x) because the service overlaps the five per-scale
    compiles; the much larger *guided* computations measured 209.5 s
    without vs 243.2 s with (one run each, service variance is minutes) —
    no win there, so leave it off for guided runs. The guidance factory is
    memoized per (scale, size), so the warm-up and the real loop share one
    hook object (a fresh closure per call would defeat the jit cache);
    both in-repo factories (CLIP, ROI) build their hook from the scale
    alone, which is the documented contract.
    """
    if custom_t_list is None:
        custom_t_list = list(sched.num_timesteps_ideal[1:])
    if custom_scales is None:
        custom_scales = list(range(n_scales))
    run_scales = len(custom_scales)
    if custom_image_size_idxs is None:
        custom_image_size_idxs = list(range(n_scales))

    from sinddm_tpu.parallel.mesh import require_named_sharding

    sharding = require_named_sharding(sharding)
    if sharding is not None:
        # params may arrive committed to one device (e.g. an orbax-restored
        # checkpoint); replicate them over the sampling mesh so jit accepts
        # the mixed-device call (no-op when already replicated). Under a
        # multi-host mesh EVERY host-produced jit input must be a committed
        # global array — keys are staged the same way below.
        from jax.sharding import NamedSharding, PartitionSpec

        repl = NamedSharding(sharding.mesh, PartitionSpec())
        params = jax.device_put(params, repl)
        if guidance_params is not None:
            guidance_params = jax.device_put(guidance_params, repl)
        _stage = lambda x: jax.device_put(x, repl)  # noqa: E731
    else:
        _stage = lambda x: x  # noqa: E731

    # memoize the factory per (scale, size): the warm-up pass and the real
    # loop must share ONE hook object per scale (jit caches by identity of
    # the static guidance_fn argument)
    _memo: dict = {}

    def factory(s: int, carry: Any, size_hw: Tuple[int, int]):
        if guidance_factory is None:
            return None, carry
        mkey = (s, size_hw)
        if mkey not in _memo:
            fn0, c0 = guidance_factory(s, size_hw)
            # the factory's initial carry is host-produced — stage it like
            # the keys (multi-host invariant above); carried-through
            # values are committed jit outputs already
            _memo[mkey] = (fn0, _stage(c0) if c0 is not None else None)
        fn, init_carry = _memo[mkey]
        return fn, (carry if carry is not None else init_carry)

    # ---- per-scale plan: every shape/static arg is known upfront --------
    plan: List[dict] = []
    prev_hw: Optional[Tuple[int, int]] = None
    for i in range(run_scales):
        s = int(custom_scales[i])
        step: dict = {"i": i, "s": s}
        if i == 0 and start_noise:
            size0 = sizes_hw[custom_image_size_idxs[0]]
            hw = (int(size0[0] * scale_mul[0]), int(size0[1] * scale_mul[1]))
            step.update(
                kind="scale0",
                shape=(batch_size, hw[0], hw[1], 3),
                t_min=(
                    sched.num_timesteps_ideal[s + 1]
                    if (sample_limited_t and s < n_scales - 1)
                    else 0
                ),
            )
            prev_hw = hw
        elif i == 0:
            # inject a start image at scale custom_scales[0]
            # (reference trainer.py:263-266)
            assert start_image is not None, "start_noise=False needs start_image"
            step.update(kind="inject")
            prev_hw = tuple(np.asarray(start_image).shape[:2])
        else:
            size_hw = via_scale_size(
                sizes_hw,
                s=s,
                n_scales=n_scales,
                scale_factor=scale_factor,
                scale_mul=scale_mul,
                custom_sample=custom_sample,
                custom_img_size_idx=int(custom_image_size_idxs[i]),
            )
            step.update(
                kind="via",
                size_hw=size_hw,
                prev_hw=prev_hw,
                total_t=int(custom_t_list[s - 1]),
                t_min=(
                    sched.num_timesteps_ideal[s + 1]
                    if (sample_limited_t and s < n_scales - 1)
                    else 0
                ),
            )
            prev_hw = size_hw
        plan.append(step)

    common = dict(
        sharding=sharding, use_pallas=use_pallas, fast_mode=fast_mode,
        collect_interm=collect_interm,
    )

    if precompile:
        import sys
        import threading

        def warm(step: dict) -> None:
            # Warm by EXECUTING on dummy inputs, not by lower().compile():
            # measured on the target backend the AOT executable is NOT
            # reused by the later direct call (cold plain run: 179.2 s with
            # AOT warm = compile twice, vs 88.8 s serial and 48.2 s with
            # executing warm). The dummy executions cost only ~2 s of
            # device time next to minutes of compile.
            try:
                dkey = jax.random.PRNGKey(0)
                if step["kind"] == "scale0":
                    gfn, gc = factory(step["s"], None, step["shape"][1:3])
                    jit_sample_scale0(
                        model, params, sched, dkey, step["shape"], step["s"],
                        step["t_min"], omega, guidance_fn=gfn,
                        guidance_carry=gc,
                        guidance_params=(guidance_params if gfn else None),
                        **common,
                    )
                elif step["kind"] == "via":
                    gfn, gc = factory(step["s"], None, step["size_hw"])
                    if carry_transform is not None and gc is not None:
                        # mirror the real loop's carry treatment (e.g. the
                        # drop-mask rewrite entering scale 0) so the warm
                        # executable's carry pytree matches the real call's
                        gc = carry_transform(step["s"], gc, step["size_hw"])
                    dummy_prev = jnp.zeros(
                        (batch_size,) + tuple(step["prev_hw"]) + (3,),
                        jnp.float32,
                    )
                    if sharding is not None:
                        dummy_prev = jax.device_put(dummy_prev, sharding)
                    jit_sample_via_scale(
                        model, params, sched, dummy_prev, dkey,
                        step["size_hw"], step["s"], step["total_t"],
                        step["t_min"], reblurring, omega, guidance_fn=gfn,
                        guidance_carry=gc,
                        guidance_params=(guidance_params if gfn else None),
                        **common,
                    )
            except Exception as e:  # best-effort: the real call reports
                print(f"precompile s={step['s']}: {e!r}", file=sys.stderr)

        threads = [
            threading.Thread(target=warm, args=(st,))
            for st in plan
            if st["kind"] != "inject"
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

    # ---- sequential pyramid walk ----------------------------------------
    outputs: List[jnp.ndarray] = []
    gcarry: Any = None

    for step in plan:
        s = step["s"]
        key, sub = jax.random.split(key)
        sub = _stage(sub)
        if step["kind"] == "scale0":
            gfn, gcarry = factory(s, gcarry, step["shape"][1:3])
            x, gcarry, aux = jit_sample_scale0(
                model, params, sched, sub, step["shape"], s, step["t_min"],
                omega, guidance_fn=gfn, guidance_carry=gcarry,
                guidance_params=(guidance_params if gfn else None), **common,
            )
            if collect_aux is not None:
                collect_aux.append(aux)
        elif step["kind"] == "inject":
            x = _stage(jnp.broadcast_to(
                jnp.asarray(start_image, jnp.float32)[None],
                (batch_size,) + np.asarray(start_image).shape,
            ))
            if collect_aux is not None:
                collect_aux.append(None)  # keep aux aligned with outputs
        else:
            if carry_transform is not None and gcarry is not None:
                gcarry = carry_transform(s, gcarry, step["size_hw"])
            gfn, gcarry = factory(s, gcarry, step["size_hw"])
            x, gcarry, aux = jit_sample_via_scale(
                model, params, sched, outputs[-1], sub, step["size_hw"], s,
                step["total_t"], step["t_min"], reblurring, omega,
                guidance_fn=gfn, guidance_carry=gcarry,
                guidance_params=(guidance_params if gfn else None), **common,
            )
            if collect_aux is not None:
                collect_aux.append(aux)
        outputs.append(x)
    return outputs
