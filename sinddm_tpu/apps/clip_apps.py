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
    init_clip_carry,
    make_clip_guidance,
    resize_guidance_carry,
)
from sinddm_tpu.pyramid import Pyramid
from sinddm_tpu.schedules import Schedules


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
    sharding=None,
    precompile: bool = False,
    bucketed: bool = False,
    seg_len: Optional[int] = None,
) -> Tuple[List[jnp.ndarray], List[Any]]:
    """Returns (per-scale outputs, per-scale aux with clip scores).

    ``bucketed=True`` routes the via scales through the shape-bucketed
    sampler (``diffusion/bucketed.py``): ONE compiled graph serves every
    guided scale (vs one compile per scale), at the cost of running each
    scale's compute on the finest-scale canvas. Only the start-from-noise
    modes use it (clip_style_trans's injection path keeps per-scale
    graphs); requires uniform ``guidance_sub_iters`` over the via scales.
    ``seg_len`` (bucketed only) bounds each device call to that many scan
    steps — see :func:`clip_sampling_bucketed`.
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
    if bucketed and not (
        start_noise
        and sharding is None
        and len({int(v) for v in guidance_sub_iters[1:]}) == 1
    ):
        import warnings

        warnings.warn(
            "bucketed guidance needs start-from-noise, no mesh sharding, and "
            "uniform via-scale sub_iters (clip_content); falling back to "
            "per-scale graphs"
        )
        bucketed = False
    if bucketed:
        return clip_sampling_bucketed(
            model, params, sched, pyramid, extractor, key,
            embeds_hr=embeds_hr, embeds_lr=embeds_lr,
            strength=strength, sample_batch_size=sample_batch_size,
            custom_t_list=custom_t_list, guidance_sub_iters=guidance_sub_iters,
            quantile=quantile, stop_guidance=stop_guidance, scale_mul=scale_mul,
            llambda=llambda, reblurring=reblurring, omega=omega,
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
            guidance_factory=guidance_factory,
            guidance_params=extractor.variables,
            carry_transform=carry_transform,
            collect_aux=aux, sharding=sharding, precompile=precompile,
        )
    else:
        outputs = sample_scales(
            model, params, sched, pyramid.sizes_hw, key,
            scale_factor=pyramid.scale_factor, n_scales=n,
            batch_size=sample_batch_size, scale_mul=scale_mul,
            custom_t_list=custom_t_list, custom_sample=False,
            reblurring=reblurring, omega=omega,
            guidance_factory=guidance_factory,
            guidance_params=extractor.variables,
            carry_transform=carry_transform,
            collect_aux=aux, sharding=sharding, precompile=precompile,
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
    seg_len: Optional[int] = None,
) -> Tuple[List[jnp.ndarray], List[Any]]:
    """Start-from-noise guided pyramid on the shape-bucketed sampler.

    Scale 0 runs its own (small) graph as usual; every via scale runs
    through ONE ``jit_bucketed_scale`` executable on the finest-scale
    canvas (see ``diffusion/bucketed.py``). Requires uniform
    ``guidance_sub_iters`` over scales 1..n-1 (clip_content's [0,1,1,...]
    pattern; the style modes guide only the finest scale and gain nothing
    from bucketing).

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

    n = pyramid.n_scales
    if custom_t_list is None:
        custom_t_list = list(sched.num_timesteps_ideal[1:])
    via_iters = {int(v) for v in guidance_sub_iters[1:]}
    if len(via_iters) != 1:
        raise ValueError(
            "bucketed guided sampling needs uniform guidance_sub_iters "
            f"over the via scales, got {list(guidance_sub_iters)}"
        )
    sub_iters = via_iters.pop()
    # per-scale target sizes incl. scale_mul (reference trainer.py:249-252)
    sizes = [
        (int(h * scale_mul[0]), int(w * scale_mul[1]))
        for h, w in pyramid.sizes_hw
    ]
    canvas = tuple(sizes[-1])
    frame_hw = resize_output_size(canvas[0], canvas[1])
    max_t = int(max(custom_t_list))

    # ---- scale 0: existing per-scale machinery (cheap graph) ------------
    h0, w0 = sizes[0]
    key, k0 = jax.random.split(key)
    gfn0 = None
    if int(guidance_sub_iters[0]) > 0:
        gfn0 = make_clip_guidance(
            extractor, embeds_lr, s=0, n_scales=n,
            sub_iters=int(guidance_sub_iters[0]), strength=strength,
            quantile=quantile, llambda=llambda, stop_guidance=stop_guidance,
        )
    x0, carry0, aux0 = jit_sample_scale0(
        model, params, sched, k0, (sample_batch_size, h0, w0, 3), 0, 0,
        omega, guidance_fn=gfn0,
        guidance_carry=(
            init_clip_carry(sample_batch_size, (h0, w0)) if gfn0 else None
        ),
        guidance_params=(extractor.variables if gfn0 else None),
    )
    outputs = [x0]
    aux: List[Any] = [aux0]
    del pyramid  # all sizes below come from the scale_mul-adjusted list

    # mask created at scale 0 is dropped (reference models.py:533-534);
    # the bucketed carry always lives on the canvas
    carry = init_clip_carry(sample_batch_size, canvas)
    prev_canvas = place_on_canvas(x0, canvas)
    prev_valid = jnp.asarray([h0, w0], jnp.int32)

    if seg_len is not None and seg_len >= max_t:
        seg_len = None
    n_segs = 1 if seg_len is None else -(-max_t // seg_len)

    for s in range(1, n):
        hs, ws = sizes[s]
        cur_valid = jnp.asarray([hs, ws], jnp.int32)
        key, sub = jax.random.split(key)
        common = dict(
            extractor=extractor, max_t=max_t, sub_iters=sub_iters,
            n_scales=n, frame_hw=frame_hw, strength=strength,
            quantile=quantile, llambda=llambda, stop_guidance=stop_guidance,
            omega=omega, reblurring=reblurring, seg_len=seg_len,
        )
        clip_params = extractor.variables if sub_iters > 0 else None
        if seg_len is None:
            prev_canvas, carry, scores, _ = jit_bucketed_scale(
                model, params, sched, prev_canvas, carry, sub,
                prev_valid, cur_valid, jnp.asarray(s, jnp.int32),
                jnp.asarray(int(custom_t_list[s - 1])), embeds_hr,
                clip_params, **common,
            )
        else:
            # bounded-duration device calls sharing one executable: thread
            # (x, carry, key) through; prev_canvas stays the previous
            # scale's output (reblur anchor) for every segment
            x_seg, seg_key = prev_canvas, sub
            parts = []
            for gi in range(n_segs):
                x_seg, carry, sc, seg_key = jit_bucketed_scale(
                    model, params, sched, prev_canvas, carry, seg_key,
                    prev_valid, cur_valid, jnp.asarray(s, jnp.int32),
                    jnp.asarray(int(custom_t_list[s - 1])), embeds_hr,
                    clip_params, x_seg,
                    jnp.asarray(gi * seg_len, jnp.int32), **common,
                )
                parts.append(sc)
            prev_canvas = x_seg
            scores = jnp.concatenate(parts, axis=0)[:max_t]
        outputs.append(prev_canvas[:, :hs, :ws, :])
        aux.append({"clip_score": scores})
        prev_valid = cur_valid
    return outputs, aux


@functools.partial(
    jax.jit,
    static_argnames=("extractor", "n_iters", "strength"),
)
def _clip_roi_ascent(
    extractor: ClipExtractor,
    patch: jnp.ndarray,
    text_embeds: jnp.ndarray,
    clip_params,
    key: jax.Array,
    n_iters: int,
    strength: float,
):
    """100-iteration normalized CLIP gradient ascent (trainer.py:429-449).

    ``clip_params`` carries the tower weights as a traced argument (see
    clip_extractor.embed_image_views on why closures are fatal at scale).
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
        x = x + strength * (norm_x / jnp.maximum(norm_g, 1e-12)) * grad
        x = jnp.clip(x, -1.0, 1.0)
        return x, score

    keys = jax.random.split(key, n_iters)
    patch, scores = jax.lax.scan(body, patch, keys)
    return patch, scores


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
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Returns (final [B,H,W,3] in [-1,1], ascent scores [n_iters])."""
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
    patch, scores = _clip_roi_ascent(
        extractor, patch, embeds, extractor.variables, ka,
        num_clip_iters, strength
    )
    image = image.at[:, y : y + h, x : x + w, :].set(patch)

    final, _, _ = jit_sample_via_scale(
        model, params, sched, image, ks, image.shape[1:3], n - 1,
        int(num_denoising_steps), 0, False, omega,
    )
    return final, scores


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
        clip_model, clip_vars, n_aug=16,
        warp_precision=getattr(args, "warp_precision", None),
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
        final, scores = clip_roi_sampling(
            model, params, sched, pyramid, extractor, key,
            text_input=args.clip_text, strength=0.1,
            sample_batch_size=args.sample_batch_size,
            num_clip_iters=100, num_denoising_steps=3, clip_roi_bb=bb,
            omega=args.omega,
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
        sharding=sharding, precompile=precompile,
        bucketed=getattr(args, "bucketed_guidance", False),
        seg_len=getattr(args, "guidance_seg_len", None) or None,
        **cfg,
    )
    desc = f"{args.mode}_{args.clip_text.replace(' ', '_')}"
    for i, out in enumerate(outputs):
        save_image(
            np.asarray((out + 1) * 0.5), out_dir / f"{desc}_s{i}.png"
        )
    # clip-score trace (reference models.py:421-427 plots per step)
    scores = np.concatenate(
        [
            np.asarray(a["clip_score"]).reshape(-1)
            for a in aux
            if isinstance(a, dict) and "clip_score" in a
        ]
        or [np.zeros(1)]
    )
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
