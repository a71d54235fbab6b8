"""CLIP-guided application modes: content, style gen/transfer, ROI edit.

Reference: ``MultiscaleTrainer.clip_sampling`` (``trainer.py:363-410``),
``clip_roi_sampling`` (``trainer.py:412-468``) and the per-mode wiring in
``main.py:153-255``:

* clip_content: guidance at every scale except 0 (sub_iters [0,1,1,...]),
  user strength/fill_factor, llambda 0.2, stop_guidance 3, reblur off;
* clip_style_gen / clip_style_trans: guidance only at the finest scale
  (sub_iters [0,...,0,1]), strength 0.3, quantile 0 (whole image),
  llambda 0.05; style_trans starts from the training image at scale
  n_scales-2 instead of noise;
* clip_roi: 100 iterations of direct normalized CLIP ascent on a chosen
  ROI of the finest training image (no diffusion), paste back, then a
  brief 3-step denoise at the finest scale.
"""

from __future__ import annotations

import functools
from pathlib import Path
from typing import Any, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sinddm_tpu.apps.sampling import jit_sample_via_scale, sample_scales
from sinddm_tpu.guidance.clip_extractor import (
    ClipExtractor,
    get_augmentations_template,
)
from sinddm_tpu.guidance.clip_guidance import (
    ClipCarry,
    init_clip_carry,
    make_clip_guidance,
    resize_guidance_carry,
)
from sinddm_tpu.pyramid import Pyramid
from sinddm_tpu.schedules import Schedules


def _n_guided_steps(
    s: int, total_t: int, sub_iters: int, n_scales: int,
    stop_guidance: int, t_min: int,
) -> int:
    """Number of scan steps that actually run CLIP guidance at scale s.

    The samplers emit a clip_score row per scan step; gated steps
    (``stop_guidance`` on the finest scale, models.py:368) and bucketed
    padding emit zeros. t descends from ``total_t - 1``, so the real
    scores occupy the first ``n_guided`` rows and the zeros sit in the
    tail — callers slice ``clip_score[:n_guided]`` to recover exactly
    the scores the reference records (models.py:419-427).
    """
    if sub_iters <= 0:
        return 0
    gate = stop_guidance if s == n_scales - 1 else 0
    return max(total_t - max(t_min, gate), 0)


def clip_sampling(
    model,
    params,
    sched: Schedules,
    pyramid: Pyramid,
    extractor: ClipExtractor,
    key: jax.Array,
    *,
    text_input: str,
    strength: float,
    sample_batch_size: int = 16,
    custom_t_list: Optional[Sequence[int]] = None,
    guidance_sub_iters: Optional[Sequence[int]] = None,
    quantile: float = 0.8,
    stop_guidance: int = 3,
    scale_mul: Tuple[float, float] = (1.0, 1.0),
    llambda: float = 0.0,
    start_noise: bool = True,
    reblurring: bool = False,
    omega: float = 0.0,
    sample_limited_t: bool = False,
    sharding=None,
    precompile: bool = False,
    bucketed: bool = False,
    seg_len: Optional[int] = None,
    collect_interm: bool = False,
) -> Tuple[List[jnp.ndarray], List[Any]]:
    """Returns (per-scale outputs, per-scale aux with clip scores).

    ``bucketed=True`` routes the via scales through the shape-bucketed
    sampler (``diffusion/bucketed.py``): one compiled graph serves every
    guided scale with the same sub_iters (vs one compile per scale), at
    the cost of running each scale's compute on the finest-scale canvas.
    The bucketed walk is the SAME sampling process but takes different
    noise draws than the per-scale walk (noise is drawn at the static
    canvas shape, so any valid < canvas scale sees a different field),
    and guided non-finest scales encode their CLIP views at the static
    finest-scale frame — per-sample outputs differ between the two
    samplers while the distributions match (draw-level equality holds,
    and is tested, exactly where the shapes coincide: single-scale
    canvas==scale runs and the style modes' finest-scale guidance).
    All four CLIP modes are supported, including clip_style_trans's
    injection start and mesh sharding. ``seg_len`` (bucketed only) bounds
    each device call to that many scan steps — see
    :func:`clip_sampling_bucketed`.

    ``sample_limited_t`` stops each scale's chain at
    ``num_timesteps_ideal[s+1]`` (reference models.py:476-479 applies it
    inside every p_sample_loop regardless of mode). ``collect_interm``
    stacks per-step frames into each scale's aux under ``"interm"`` (the
    reference's ``save_interm``, models.py:360-366,511-526).
    """
    n = pyramid.n_scales
    if guidance_sub_iters is None:
        guidance_sub_iters = list(reversed(range(n)))
    embeds_hr = extractor.get_text_embedding(
        text_input, get_augmentations_template("hr")
    )
    embeds_lr = extractor.get_text_embedding(
        text_input, get_augmentations_template("lr")
    )

    def guidance_factory(s, size_hw):
        carry = init_clip_carry(sample_batch_size, size_hw)
        fn = make_clip_guidance(
            extractor,
            embeds_hr if s > 0 else embeds_lr,
            s=s,
            n_scales=n,
            sub_iters=int(guidance_sub_iters[s]),
            strength=strength,
            quantile=quantile,
            llambda=llambda,
            stop_guidance=stop_guidance,
        )
        return fn, carry

    def carry_transform(s, carry, size_hw):
        if carry is None:
            return None
        # resize guidance state to the incoming scale; a mask carried into
        # scale 0 is dropped (reference models.py:528-534)
        return resize_guidance_carry(carry, size_hw, drop_mask=(s == 0))

    aux: List[Any] = []
    if bucketed:
        return clip_sampling_bucketed(
            model, params, sched, pyramid, extractor, key,
            embeds_hr=embeds_hr, embeds_lr=embeds_lr,
            strength=strength, sample_batch_size=sample_batch_size,
            custom_t_list=custom_t_list, guidance_sub_iters=guidance_sub_iters,
            quantile=quantile, stop_guidance=stop_guidance, scale_mul=scale_mul,
            llambda=llambda, reblurring=reblurring, omega=omega,
            start_noise=start_noise, sample_limited_t=sample_limited_t,
            sharding=sharding, collect_interm=collect_interm,
            seg_len=seg_len,
        )
    if not start_noise:  # clip_style_trans: inject the training image
        custom_scales = [n - 2, n - 1]
        outputs = sample_scales(
            model, params, sched, pyramid.sizes_hw, key,
            scale_factor=pyramid.scale_factor, n_scales=n,
            batch_size=sample_batch_size, scale_mul=scale_mul,
            custom_t_list=custom_t_list, custom_scales=custom_scales,
            custom_image_size_idxs=custom_scales, custom_sample=True,
            start_noise=False, start_image=pyramid.images[n - 2],
            reblurring=reblurring, omega=omega,
            sample_limited_t=sample_limited_t,
            guidance_factory=guidance_factory,
            guidance_params=extractor.variables,
            carry_transform=carry_transform,
            collect_aux=aux, collect_interm=collect_interm,
            sharding=sharding, precompile=precompile,
        )
    else:
        outputs = sample_scales(
            model, params, sched, pyramid.sizes_hw, key,
            scale_factor=pyramid.scale_factor, n_scales=n,
            batch_size=sample_batch_size, scale_mul=scale_mul,
            custom_t_list=custom_t_list, custom_sample=False,
            reblurring=reblurring, omega=omega,
            sample_limited_t=sample_limited_t,
            guidance_factory=guidance_factory,
            guidance_params=extractor.variables,
            carry_transform=carry_transform,
            collect_aux=aux, collect_interm=collect_interm,
            sharding=sharding, precompile=precompile,
        )
    # annotate each guided aux with its real guided-step count so
    # consumers (run_clip_mode's clip_score trace) can drop gated zeros
    t_resolved = (
        list(custom_t_list) if custom_t_list is not None
        else list(sched.num_timesteps_ideal[1:])
    )
    scale_ids = list(range(n)) if start_noise else [n - 2, n - 1]
    for s_id, a in zip(scale_ids, aux):
        if isinstance(a, dict) and "clip_score" in a:
            total_s = (
                int(sched.num_timesteps) if s_id == 0
                else int(t_resolved[s_id - 1])
            )
            t_min_s = (
                int(sched.num_timesteps_ideal[s_id + 1])
                if (sample_limited_t and s_id < n - 1)
                else 0
            )
            a["n_guided"] = _n_guided_steps(
                s_id, total_s, int(guidance_sub_iters[s_id]), n,
                stop_guidance, t_min_s,
            )
    return outputs, aux


def clip_sampling_bucketed(
    model,
    params,
    sched: Schedules,
    pyramid: Pyramid,
    extractor: ClipExtractor,
    key: jax.Array,
    *,
    embeds_hr: jnp.ndarray,
    embeds_lr: jnp.ndarray,
    strength: float,
    sample_batch_size: int,
    custom_t_list: Optional[Sequence[int]],
    guidance_sub_iters: Sequence[int],
    quantile: float,
    stop_guidance: int,
    llambda: float,
    scale_mul: Tuple[float, float] = (1.0, 1.0),
    reblurring: bool = False,
    omega: float = 0.0,
    start_noise: bool = True,
    sample_limited_t: bool = False,
    sharding=None,
    collect_interm: bool = False,
    seg_len: Optional[int] = None,
) -> Tuple[List[jnp.ndarray], List[Any]]:
    """Guided pyramid on the shape-bucketed sampler.

    Scale 0 runs its own (small) graph as usual; every via scale runs
    through a ``jit_bucketed_scale`` executable on the finest-scale
    canvas (see ``diffusion/bucketed.py``) — one executable per distinct
    ``guidance_sub_iters`` value among the via scales (clip_content's
    uniform [0,1,1,...] compiles once; the style modes' [0,...,0,1]
    compile one unguided + one guided graph).

    ``start_noise=False`` is clip_style_trans's injection start
    (reference trainer.py:384-399): the training image at scale n-2 is
    placed on the canvas and only the finest scale is denoised.
    ``sharding`` (NamedSharding) shards the canvas batch over a mesh.
    ``sample_limited_t`` stops each scale's chain at
    ``num_timesteps_ideal[s+1]`` (models.py:476-479). ``collect_interm``
    records per-step frames into each scale's aux under ``"interm"``.

    ``seg_len`` splits each scale's reverse chain into device calls of at
    most ``seg_len`` scan steps, all sharing ONE executable (the step
    offset is traced). At real ViT-B/32 scale a full chain is a
    multi-minute device call, which this backend's tunneled worker kills;
    segmentation bounds call duration with bit-identical results.
    """
    from sinddm_tpu.apps.sampling import jit_sample_scale0
    from sinddm_tpu.diffusion.bucketed import (
        jit_bucketed_scale,
        place_on_canvas,
    )
    from sinddm_tpu.guidance.clip_extractor import resize_output_size
    from sinddm_tpu.parallel.mesh import require_named_sharding

    sharding = require_named_sharding(sharding)
    n = pyramid.n_scales
    if custom_t_list is None:
        custom_t_list = list(sched.num_timesteps_ideal[1:])
    # per-scale target sizes incl. scale_mul (reference trainer.py:249-252)
    sizes = [
        (int(h * scale_mul[0]), int(w * scale_mul[1]))
        for h, w in pyramid.sizes_hw
    ]
    canvas = tuple(sizes[-1])
    frame_hw = resize_output_size(canvas[0], canvas[1])
    max_t = int(max(custom_t_list))

    if sharding is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = NamedSharding(sharding.mesh, PartitionSpec())
        params = jax.device_put(params, replicated)
        extractor_vars = jax.device_put(extractor.variables, replicated)
        # under a multi-host mesh EVERY host-produced jit input must be a
        # committed global array (same invariant as sample_scales): keys,
        # the guidance carry, text embeddings and the small size/step
        # scalars below all go through _stage
        _stage = lambda x: jax.device_put(x, replicated)  # noqa: E731
    else:
        extractor_vars = extractor.variables
        _stage = lambda x: x  # noqa: E731
    embeds_hr = _stage(embeds_hr)

    outputs: List[jnp.ndarray]
    aux: List[Any]
    if start_noise:
        # ---- scale 0: existing per-scale machinery (cheap graph) --------
        h0, w0 = sizes[0]
        t_min0 = int(sched.num_timesteps_ideal[1]) if sample_limited_t else 0
        key, k0 = jax.random.split(key)
        gfn0 = None
        if int(guidance_sub_iters[0]) > 0:
            gfn0 = make_clip_guidance(
                extractor, embeds_lr, s=0, n_scales=n,
                sub_iters=int(guidance_sub_iters[0]), strength=strength,
                quantile=quantile, llambda=llambda,
                stop_guidance=stop_guidance,
            )
        x0, carry0, aux0 = jit_sample_scale0(
            model, params, sched, _stage(k0),
            (sample_batch_size, h0, w0, 3), 0,
            t_min0, omega, guidance_fn=gfn0,
            guidance_carry=(
                _stage(init_clip_carry(sample_batch_size, (h0, w0)))
                if gfn0 else None
            ),
            guidance_params=(extractor_vars if gfn0 else None),
            sharding=sharding, collect_interm=collect_interm,
        )
        if isinstance(aux0, dict) and "clip_score" in aux0:
            aux0["n_guided"] = _n_guided_steps(
                0, int(sched.num_timesteps), int(guidance_sub_iters[0]),
                n, stop_guidance, t_min0,
            )
        outputs = [x0]
        aux = [aux0]
        prev_canvas = place_on_canvas(x0, canvas)
        prev_valid = jnp.asarray([h0, w0], jnp.int32)
        via_scales = list(range(1, n))
    else:
        # clip_style_trans: inject the training image at scale n-2
        # (reference trainer.py:384-399); only the finest scale denoises.
        # Burn one key split to mirror the per-scale walk, which splits
        # once per plan step INCLUDING the inject step — the finest
        # scale then consumes the same PRNG stream in both samplers
        # (tested: test_bucketed_style_trans_injection_matches_per_scale)
        key, _ = jax.random.split(key)
        start_img = jnp.broadcast_to(
            jnp.asarray(pyramid.images[n - 2], jnp.float32)[None],
            (sample_batch_size,) + pyramid.images[n - 2].shape,
        )
        outputs = [start_img]
        aux = [None]
        prev_canvas = place_on_canvas(start_img, canvas)
        prev_valid = jnp.asarray(start_img.shape[1:3], jnp.int32)
        via_scales = [n - 1]
    del pyramid  # all sizes below come from the scale_mul-adjusted list

    # carry entering the via walk: if scale 0 ran guided, lift its carry
    # onto the canvas (valid region (h0, w0) top-left; jit_bucketed_scale
    # then resizes valid->valid at each scale entry exactly like the
    # per-scale walk — reference models.py:528-532 resizes AND KEEPS both
    # mask and x_recon_prev into every s > 0). Otherwise a fresh zero
    # carry on the canvas.
    if start_noise and int(guidance_sub_iters[0]) > 0 and carry0 is not None:
        carry = ClipCarry(
            mask=place_on_canvas(carry0.mask, canvas),
            x_recon_prev=place_on_canvas(carry0.x_recon_prev, canvas),
            has_mask=carry0.has_mask,
        )
    else:
        carry = init_clip_carry(sample_batch_size, canvas)
    carry = _stage(carry)
    if sharding is not None:
        prev_canvas = jax.device_put(prev_canvas, sharding)

    if seg_len is not None and seg_len >= max_t:
        seg_len = None
    n_segs = 1 if seg_len is None else -(-max_t // seg_len)

    prev_valid = _stage(prev_valid)
    for s in via_scales:
        hs, ws = sizes[s]
        sub_iters = int(guidance_sub_iters[s])
        cur_valid = _stage(jnp.asarray([hs, ws], jnp.int32))
        t_min_s = (
            int(sched.num_timesteps_ideal[s + 1])
            if (sample_limited_t and s < n - 1)
            else 0
        )
        total_t = int(custom_t_list[s - 1])
        key, sub = jax.random.split(key)
        sub = _stage(sub)
        common = dict(
            extractor=extractor, max_t=max_t, sub_iters=sub_iters,
            n_scales=n, frame_hw=frame_hw, strength=strength,
            quantile=quantile, llambda=llambda, stop_guidance=stop_guidance,
            omega=omega, reblurring=reblurring, seg_len=seg_len,
            sharding=sharding, collect_interm=collect_interm,
        )
        clip_params = extractor_vars if sub_iters > 0 else None
        s_arr = _stage(jnp.asarray(s, jnp.int32))
        total_arr = _stage(jnp.asarray(total_t))
        t_min_arr = _stage(jnp.asarray(t_min_s))
        if seg_len is None:
            prev_canvas, carry, scores, _, frames = jit_bucketed_scale(
                model, params, sched, prev_canvas, carry, sub,
                prev_valid, cur_valid, s_arr,
                total_arr, embeds_hr,
                clip_params, None, None, t_min_arr, **common,
            )
        else:
            # bounded-duration device calls sharing one executable: thread
            # (x, carry, key) through; prev_canvas stays the previous
            # scale's output (reblur anchor) for every segment
            x_seg, seg_key = prev_canvas, sub
            parts, fparts = [], []
            for gi in range(n_segs):
                x_seg, carry, sc, seg_key, fr = jit_bucketed_scale(
                    model, params, sched, prev_canvas, carry, seg_key,
                    prev_valid, cur_valid, s_arr,
                    total_arr, embeds_hr,
                    clip_params, x_seg,
                    _stage(jnp.asarray(gi * seg_len, jnp.int32)),
                    t_min_arr, **common,
                )
                parts.append(sc)
                if fr is not None:
                    fparts.append(fr)
            prev_canvas = x_seg
            scores = jnp.concatenate(parts, axis=0)[:max_t]
            frames = jnp.concatenate(fparts, axis=0) if fparts else None
        aux_s = {
            "clip_score": scores,
            "n_guided": _n_guided_steps(
                s, total_t, sub_iters, n, stop_guidance, t_min_s
            ),
        }
        if frames is not None:
            # active steps are j = 0 .. total_t-1-t_min (t descending);
            # crop to the valid region like the scale output itself
            aux_s["interm"] = frames[: total_t - t_min_s, :, :hs, :ws, :]
        outputs.append(prev_canvas[:, :hs, :ws, :])
        aux.append(aux_s)
        prev_valid = cur_valid
    return outputs, aux


@functools.partial(
    jax.jit,
    static_argnames=("extractor", "n_iters", "strength", "collect_interm"),
)
def _clip_roi_ascent(
    extractor: ClipExtractor,
    patch: jnp.ndarray,
    text_embeds: jnp.ndarray,
    clip_params,
    key: jax.Array,
    n_iters: int,
    strength: float,
    collect_interm: bool = False,
):
    """100-iteration normalized CLIP gradient ascent (trainer.py:429-449).

    ``clip_params`` carries the tower weights as a traced argument (see
    clip_extractor.embed_image_views on why closures are fatal at scale).
    ``collect_interm`` additionally stacks the pre-update patch of every
    iteration ([n_iters, B, h, w, 3]) — the reference's per-iter
    ``interm_samples_clip_roi/iter_{i}.png`` dumps (trainer.py:427-434).
    """

    def body(carry, k):
        x = carry

        def loss_fn(xr):
            return -extractor.calculate_clip_loss(
                (xr + 1.0) * 0.5, text_embeds, k, variables=clip_params
            )

        score, grad = jax.value_and_grad(loss_fn)(x)
        norm_x = jnp.sqrt(jnp.sum(x * x, axis=(1, 2, 3), keepdims=True))
        norm_g = jnp.sqrt(jnp.sum(grad * grad, axis=(1, 2, 3), keepdims=True))
        x_new = x + strength * (norm_x / jnp.maximum(norm_g, 1e-12)) * grad
        x_new = jnp.clip(x_new, -1.0, 1.0)
        out = (score, x) if collect_interm else score
        return x_new, out

    keys = jax.random.split(key, n_iters)
    patch, outs = jax.lax.scan(body, patch, keys)
    if collect_interm:
        scores, frames = outs
    else:
        scores, frames = outs, None
    return patch, scores, frames


def clip_roi_sampling(
    model,
    params,
    sched: Schedules,
    pyramid: Pyramid,
    extractor: ClipExtractor,
    key: jax.Array,
    *,
    text_input: str,
    strength: float = 0.1,
    sample_batch_size: int = 16,
    num_clip_iters: int = 100,
    num_denoising_steps: int = 3,
    clip_roi_bb: Sequence[int] = (0, 0, 32, 32),
    omega: float = 0.0,
    collect_interm: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, Optional[dict]]:
    """Returns (final [B,H,W,3] in [-1,1], ascent scores [n_iters], interm).

    ``collect_interm=True`` returns a third dict with the per-iter ascent
    patches (``"ascent"`` [n_iters, B, h, w, 3], reference
    trainer.py:427-434) and the final-denoise frames (``"denoise"``,
    models.py:540-546 dumps).
    """
    n = pyramid.n_scales
    embeds = extractor.get_text_embedding(
        text_input, get_augmentations_template("lr")
    )
    image = jnp.broadcast_to(
        jnp.asarray(pyramid.images[n - 1])[None],
        (sample_batch_size,) + pyramid.images[n - 1].shape,
    )
    y, x, h, w = (int(v) for v in clip_roi_bb)
    patch = image[:, y : y + h, x : x + w, :]

    key, ka, ks = jax.random.split(key, 3)
    patch, scores, ascent_frames = _clip_roi_ascent(
        extractor, patch, embeds, extractor.variables, ka,
        num_clip_iters, strength, collect_interm=collect_interm,
    )
    image = image.at[:, y : y + h, x : x + w, :].set(patch)

    final, _, aux = jit_sample_via_scale(
        model, params, sched, image, ks, image.shape[1:3], n - 1,
        int(num_denoising_steps), 0, False, omega,
        collect_interm=collect_interm,
    )
    interm = None
    if collect_interm:
        interm = {
            "ascent": ascent_frames,
            "denoise": aux.get("interm") if isinstance(aux, dict) else None,
        }
    return final, scores, interm


def run_clip_mode(
    args, model, trainer, sched: Schedules, pyramid: Pyramid, key,
    sample_t_list, scale_mul, results_folder, sharding=None,
    precompile: bool = False,
) -> None:
    """CLI dispatcher for the four CLIP modes (reference main.py:153-255)."""
    from sinddm_tpu.models.clip.convert import find_clip_weights, load_clip
    from sinddm_tpu.ops.image_io import save_image

    weights = args.clip_weights or find_clip_weights()
    if not weights:
        raise SystemExit(
            "CLIP modes need a ViT-B/32 checkpoint: pass --clip_weights, or "
            "drop the file at one of the sniffed paths (SINDDM_CLIP_WEIGHTS, "
            "checkpoints/ViT-B-32.pt, ~/.cache/clip/ViT-B-32.pt — see "
            "docs/REAL_CLIP.md; this environment cannot download it)."
        )
    clip_model, clip_vars = load_clip(
        weights,
        compute_dtype=(
            None if getattr(args, "clip_dtype", "float32") == "float32"
            else args.clip_dtype
        ),
    )
    extractor = ClipExtractor(
        clip_model, clip_vars, n_aug=getattr(args, "n_aug", 16),
        view_chunk=getattr(args, "clip_view_chunk", 8) or None,
        warp_precision=getattr(args, "warp_precision", None),
        warp_impl=getattr(args, "warp_impl", None),
    )
    n = pyramid.n_scales
    params = trainer.state.ema_params
    out_dir = Path(results_folder) / "final_samples"

    if args.mode == "clip_roi":
        assert args.target_roi is not None or args.interactive, (
            "clip_roi needs --target_roi (y x h w) or --interactive"
        )
        if args.interactive:
            import cv2, os

            img_path = os.path.join(
                args.dataset_folder, f"scale_{n - 1}",
                args.image_name.rsplit(".", 1)[0] + ".png",
            )
            r = cv2.selectROI(cv2.imread(img_path))
            bb = [r[1], r[0], r[3], r[2]]
        else:
            bb = list(args.target_roi)
        save_interm = getattr(args, "save_interm", False)
        final, scores, interm = clip_roi_sampling(
            model, params, sched, pyramid, extractor, key,
            text_input=args.clip_text, strength=0.1,
            sample_batch_size=args.sample_batch_size,
            num_clip_iters=100, num_denoising_steps=3, clip_roi_bb=bb,
            omega=args.omega, collect_interm=save_interm,
        )
        if interm is not None:
            # per-iter ascent patch dumps (reference trainer.py:427-434
            # writes interm_samples_clip_roi/iter_{i}.png) + the final
            # 3-step denoise frames in the via-scale layout
            from sinddm_tpu.ops.image_io import save_interm_frames

            idir = Path(results_folder) / "interm_samples_clip_roi"
            ascent = np.asarray(interm["ascent"])
            for i in range(ascent.shape[0]):
                save_image(
                    (np.clip(ascent[i], -1.0, 1.0) + 1.0) * 0.5,
                    idir / f"iter_{i}.png",
                )
            if interm.get("denoise") is not None:
                save_interm_frames(
                    interm["denoise"],
                    Path(results_folder) / f"interm_samples_scale_{n - 1}",
                    s=n - 1,
                )
        save_image(
            np.asarray((final + 1) * 0.5),
            out_dir / f"clip_roi_{args.clip_text.replace(' ', '_')}.png",
        )
        return

    if args.mode == "clip_content":
        assert args.strength is not None and 0 <= args.strength <= 1
        assert args.fill_factor is not None and 0 <= args.fill_factor <= 1
        cfg = dict(
            text_input=args.clip_text,
            strength=args.strength,
            quantile=1.0 - args.fill_factor,
            guidance_sub_iters=[0] + [1] * (n - 1),
            llambda=0.2,
            start_noise=True,
        )
    else:  # clip_style_gen / clip_style_trans
        cfg = dict(
            text_input=args.clip_text + " Style",
            strength=0.3,
            quantile=0.0,
            guidance_sub_iters=[0] * (n - 1) + [1],
            llambda=0.05,
            start_noise=args.mode == "clip_style_gen",
        )

    outputs, aux = clip_sampling(
        model, params, sched, pyramid, extractor, key,
        sample_batch_size=args.sample_batch_size,
        custom_t_list=sample_t_list, stop_guidance=3,
        scale_mul=scale_mul, reblurring=False, omega=args.omega,
        sample_limited_t=getattr(args, "sample_limited_t", False),
        sharding=sharding, precompile=precompile,
        bucketed=getattr(args, "bucketed_guidance", False),
        seg_len=getattr(args, "guidance_seg_len", None) or None,
        collect_interm=getattr(args, "save_interm", False),
        **cfg,
    )
    desc = f"{args.mode}_{args.clip_text.replace(' ', '_')}"
    if getattr(args, "save_interm", False):
        # aux aligns with outputs; style_trans's first entry is the
        # injected image at scale n-2 (aux None), the rest are via scales
        from sinddm_tpu.ops.image_io import save_interm_frames

        scales = (
            list(range(n)) if cfg["start_noise"] else [n - 2, n - 1]
        )
        for s, a in zip(scales, aux):
            if not isinstance(a, dict) or a.get("interm") is None:
                continue
            t_min = (
                int(sched.num_timesteps_ideal[s + 1])
                if (getattr(args, "sample_limited_t", False) and s < n - 1)
                else 0
            )
            save_interm_frames(
                a["interm"],
                Path(results_folder) / f"interm_samples_scale_{s}",
                s=s, t_min=t_min,
            )
    for i, out in enumerate(outputs):
        save_image(
            np.asarray((out + 1) * 0.5), out_dir / f"{desc}_s{i}.png"
        )
    # clip-score trace (reference models.py:421-427 records only the
    # actually-computed scores; our scans emit zero rows for gated /
    # bucket-padded steps — slice each scale to its annotated count)
    parts = []
    for a in aux:
        if isinstance(a, dict) and "clip_score" in a:
            sc = np.asarray(a["clip_score"])
            nv = a.get("n_guided")
            if nv is not None:
                sc = sc[: int(nv)]
            if sc.size:
                parts.append(sc.reshape(-1))
    scores = np.concatenate(parts or [np.zeros(1)])
    try:
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        plt.figure(figsize=(16, 8))
        plt.plot(scores)
        plt.grid(True)
        plt.savefig(str(Path(results_folder) / "clip_score.png"))
        plt.close()
    except Exception:
        np.save(str(Path(results_folder) / "clip_score.npy"), scores)
    print(f"saved CLIP results to {out_dir}")
