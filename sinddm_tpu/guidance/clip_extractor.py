"""CLIP feature extraction for guidance: text templates, augmented views, loss.

Re-design of the reference ``ClipExtractor``
(``text2live_util/clip_extractor.py:22-147``) for TPU:

* the 16-view augmentation pipeline (resize / random-crop / hflip /
  affine / perspective / color-jitter / grayscale) is expressed as ONE
  composed homography + color transform per view (see ``ops/warp.py``) —
  static shapes, differentiable, vmapped over views and batch, instead of
  torchvision's per-view Python loop,
* all B x n_aug views go through the image encoder in a single batched
  call (the reference encodes image-by-image "to avoid memory
  limitations", ``clip_extractor.py:140``),
* ``calculate_clip_loss`` keeps the reference's stochastic template
  subset: n ~ U{1..N} templates drawn with replacement; implemented with
  a fixed-size index draw + first-n masking so shapes stay static,
* loss = 1.2 * (1 - mean_over_views cos(img_emb, text_emb)), summed over
  images and selected templates, divided by the subset size
  (``clip_extractor.py:18-19,134-147``).

Known deviation: torchvision fills out-of-bounds pixels per stage
(affine, then perspective) while the composed warp fills once against the
original image bounds; the random distortions are small so the
distributions are near-identical.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.ad_checkpoint import checkpoint_name

from sinddm_tpu.models.clip.model import CLIPModel, clip_normalize
from sinddm_tpu.models.clip.tokenizer import tokenize
from sinddm_tpu.ops import warp as W

# text templates: reference text2live_util/util.py:73-122
TEMPLATES_HR = (
    "photo of {}.", "high quality photo of {}.", "a photo of {}.",
    "the photo of {}.", "image of {}.", "an image of {}.",
    "high quality image of {}.", "a high quality image of {}.", "the {}.",
    "a {}.", "{}.", "{}", "{}!", "{}...",
)
TEMPLATES_LR = (
    "photo of {}.", "low quality photo of {}.", "low resolution photo of {}.",
    "low-res photo of {}.", "blurry photo of {}.", "pixelated photo of {}.",
    "a photo of {}.", "the photo of {}.", "image of {}.", "an image of {}.",
    "low quality image of {}.", "a low quality image of {}.",
    "low resolution image of {}.", "a low resolution image of {}.",
    "low-res image of {}.", "a low-res image of {}.", "blurry image of {}.",
    "a blurry image of {}.", "pixelated image of {}.",
    "a pixelated image of {}.", "the {}.", "a {}.", "{}.", "{}", "{}!",
    "{}...",
)


def get_augmentations_template(flag: str = "hr") -> Tuple[str, ...]:
    if flag == "hr":
        return TEMPLATES_HR
    if flag == "lr":
        return TEMPLATES_LR
    raise NotImplementedError(flag)


def compose_text_with_templates(text: str, templates: Sequence[str]):
    return [t.format(text) for t in templates]


def resize_output_size(
    h: int, w: int, target: int = 224, max_size: int = 320
) -> Tuple[int, int]:
    """torchvision T.Resize(target, max_size=...) output size."""
    short, long = (h, w) if h <= w else (w, h)
    new_short = target
    new_long = int(target * long / short)
    if new_long > max_size:
        new_short = int(max_size * short / long)
        new_long = max_size
    nh, nw = (new_short, new_long) if h <= w else (new_long, new_short)
    return nh, nw


def _augs_matrix_and_color(key: jax.Array, hw: Tuple[int, int]):
    """Random draws for the shared aug pipeline of one view.

    Returns (out->in homography over the view frame, color_fn).
    Distribution parity with reference clip_extractor.py:41-64:
    HFlip(0.5); Affine(+-15deg, translate +-0.1, p=0.8);
    Perspective(0.4, p=0.5); ColorJitter(0.1 x4, p=0.7); Grayscale(0.15).
    """
    h, w = hw
    keys = jax.random.split(key, 13)
    eye = jnp.eye(3)

    do_flip = jax.random.uniform(keys[0]) < 0.5
    m_flip = jnp.where(do_flip, W.hflip_matrix(w), eye)

    do_aff = jax.random.uniform(keys[1]) < 0.8
    angle = jax.random.uniform(keys[2], minval=-15.0, maxval=15.0)
    tx = jax.random.uniform(keys[3], minval=-0.1, maxval=0.1) * w
    ty = jax.random.uniform(keys[4], minval=-0.1, maxval=0.1) * h
    m_aff = jnp.where(do_aff, W.affine_matrix(angle, (tx, ty), (h, w)), eye)

    do_persp = jax.random.uniform(keys[5]) < 0.5
    d = 0.4
    half_h, half_w = h // 2, w // 2
    # torchvision RandomPerspective corner displacement ranges
    dx = jax.random.uniform(keys[6], (4,)) * (d * half_w + 1)
    dy = jax.random.uniform(keys[7], (4,)) * (d * half_h + 1)
    corners = jnp.asarray(
        [[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], jnp.float32
    )
    signs = jnp.asarray([[1, 1], [-1, 1], [-1, -1], [1, -1]], jnp.float32)
    endpoints = corners + signs * jnp.stack([dx, dy], axis=-1)
    m_persp = jnp.where(
        do_persp, W.perspective_matrix(corners, endpoints), eye
    )

    matrix = m_flip @ m_aff @ m_persp

    do_jitter = jax.random.uniform(keys[8]) < 0.7
    do_gray = jax.random.uniform(keys[9]) < 0.15
    fb = jax.random.uniform(keys[10], (4,), minval=0.9, maxval=1.1)
    hue_f = jax.random.uniform(keys[11], minval=-0.1, maxval=0.1)
    perm = jax.random.permutation(keys[12], 4)

    def color_fn(x):
        def jitter(x):
            ops = [
                lambda v: W.adjust_brightness(v, fb[0]),
                lambda v: W.adjust_contrast(v, fb[1]),
                lambda v: W.adjust_saturation(v, fb[2]),
                lambda v: W.adjust_hue(v, hue_f),
            ]

            def body(i, v):
                return jax.lax.switch(perm[i], ops, v)

            return jax.lax.fori_loop(0, 4, body, x)

        x = jnp.where(do_jitter, jitter(x), x)
        g = jnp.broadcast_to(W.rgb_to_grayscale(x), x.shape)
        return jnp.where(do_gray, g, x)

    return matrix, color_fn


def augment_views_subset(
    keys_crop: jnp.ndarray,
    keys_aug: jnp.ndarray,
    idxs: jnp.ndarray,
    img: jnp.ndarray,
    fill: float = 1.0,
    valid_hw=None,
    frame_hw: "Tuple[int, int] | None" = None,
    mm_adjoint: bool = False,
    warp_precision: "str | None" = None,
    warp_impl: "str | None" = None,
) -> jnp.ndarray:
    """Build the views named by ``idxs`` for one image: [len(idxs), ch, cw, 3].

    ``keys_crop[j]``/``keys_aug[j]`` are the per-view PRNG keys for view
    ``idxs[j]`` (the caller pre-splits so any subset reproduces exactly
    what :func:`augment_views` would build for those indices — the
    memory-bounded chunked encoder in :meth:`ClipExtractor.embed_image_views`
    relies on this).
    """
    if valid_hw is None:
        h, w = img.shape[0], img.shape[1]
    else:
        h = valid_hw[0].astype(jnp.float32)
        w = valid_hw[1].astype(jnp.float32)
    ch, cw = (
        resize_output_size(img.shape[0], img.shape[1])
        if frame_hw is None
        else frame_hw
    )
    def one_view(i, kc, ka):
        # crop/resize stage (h/w may be traced when valid_hw is given)
        full = W.crop_resize_matrix(0.0, 0.0, 1.0 * h, 1.0 * w, (ch, cw))

        s = jax.random.uniform(kc, minval=0.6, maxval=1.0)
        crop_h = jnp.floor(h * s)
        crop_w = jnp.floor(w * s)
        ky, kx = jax.random.split(jax.random.fold_in(kc, 1))
        y0 = jnp.floor(jax.random.uniform(ky) * (h - crop_h + 1))
        x0 = jnp.floor(jax.random.uniform(kx) * (w - crop_w + 1))
        crop = W.crop_resize_matrix(y0, x0, crop_h, crop_w, (ch, cw))

        m_crop = jnp.where(i == 0, full, crop)
        m_augs, color_fn = _augs_matrix_and_color(ka, (ch, cw))
        m_total = m_crop @ m_augs
        view = W.warp_homography(
            img, m_total, (ch, cw), fill=fill, mm_adjoint=mm_adjoint,
            precision=warp_precision, impl=warp_impl,
        )
        # named so ClipExtractor's remat policy can keep the warp output
        # as a residual: the warp is the costly stage (gather or matmul),
        # and its own VJP needs only (img, coords) — saving its output
        # lets the backward recompute skip re-running it entirely
        view = checkpoint_name(view, "warp_out")
        return jnp.clip(color_fn(jnp.clip(view, 0.0, 1.0)), 0.0, 1.0)

    return jax.vmap(one_view)(idxs, keys_crop, keys_aug)


def augment_views(
    key: jax.Array,
    img: jnp.ndarray,
    n_aug: int,
    fill: float = 1.0,
    valid_hw=None,
    frame_hw: "Tuple[int, int] | None" = None,
    mm_adjoint: bool = False,
    warp_precision: "str | None" = None,
    warp_impl: "str | None" = None,
) -> jnp.ndarray:
    """One image [H, W, 3] in [0,1] -> [n_aug, ch, cw, 3] augmented views.

    View 0: resize (short side 224, long side capped at 320) + augs.
    Views 1..n-1: random crop (scale U(0.6, 1)) resized to the view-0
    frame + augs (reference clip_extractor.py:68-96).

    ``valid_hw`` ([2] traced ints) restricts sampling to the top-left
    valid region of a padded canvas — used by the shape-bucketed guided
    sampler, whose canvas shape is static while the image size is traced;
    ``frame_hw`` then fixes the (static) view frame (the per-scale frame
    would otherwise depend on the traced size).
    """
    keys = jax.random.split(key, 2 * n_aug)
    return augment_views_subset(
        keys[:n_aug], keys[n_aug:], jnp.arange(n_aug), img,
        fill=fill, valid_hw=valid_hw, frame_hw=frame_hw,
        mm_adjoint=mm_adjoint, warp_precision=warp_precision,
        warp_impl=warp_impl,
    )


class ClipExtractor:
    """Frozen CLIP + guidance losses. All heavy paths are jit/grad-safe."""

    def __init__(self, model: CLIPModel, variables, n_aug: int = 16,
                 affine_fill: float = 1.0, remat: bool = True,
                 view_chunk: "int | None" = 4, mm_adjoint: bool = True,
                 save_views: bool = True, save_dots: bool = False,
                 warp_precision: "str | None" = None,
                 warp_impl: "str | None" = None):
        self.model = model
        self.variables = variables
        self.n_aug = n_aug
        self.affine_fill = affine_fill
        # rematerialize the view encoder on the backward pass: guidance
        # differentiates through B x n_aug ViT forwards — without remat a
        # real ViT-B/32 at batch 16 holds ~GBs of activations
        self.remat = remat
        # encode (and differentiate) at most view_chunk views per image at
        # a time, sequentially via lax.map: the VJP of the view warp is a
        # canvas-shaped scatter-add per (image, view, bilinear tap), and
        # batching all B x n_aug of them peaks at ~10 GB HBM for batch 16
        # at ViT-B/32 scale (measured OOM: 11 x 894 MB
        # [4, B, n_aug, H, W, 3] sort-scatter buffers). None = all at once.
        self.view_chunk = view_chunk
        # matmul image-adjoint for the view warps: the autodiff scatter
        # adjoint is 84% of a guided step at ViT-B/32 scale
        # (benchmarks/guided_cost_breakdown.json); the mm path is exact
        # to fp32 tolerance and needs no matrix gradients (RNG draws)
        self.mm_adjoint = mm_adjoint
        # keep the named view tensors as remat residuals (see
        # embed_image_views) so the backward never re-runs the warp
        self.save_views = save_views
        # additionally save every dot_general output (plus the named
        # post-patchify tokens) as residuals: the remat replay then skips
        # the ViT's matmuls and re-runs only elementwise ops — trades
        # ~1.3 GB/chunk of bf16 residuals (B16, 8-view chunks) for the
        # tower's whole re-forward matmul cost
        self.save_dots = save_dots
        # MXU precision of the warp matmuls: None = fp32-exact default;
        # "high" trades ~5% max guidance-gradient error for ~28% faster
        # warps (measured: benchmarks/warp_high_guidance_eval.py)
        self.warp_precision = warp_precision
        self.warp_impl = warp_impl
        self.cfg = {"n_aug": n_aug}

    def _chunk_size(self) -> int:
        """Largest divisor of n_aug that is <= view_chunk."""
        if self.view_chunk is None or self.view_chunk >= self.n_aug:
            return self.n_aug
        c = max(1, min(self.view_chunk, self.n_aug))
        while self.n_aug % c:
            c -= 1
        return c

    # -- text ----------------------------------------------------------
    def get_text_embedding(
        self, text, template: Sequence[str], average_embeddings: bool = False
    ) -> jnp.ndarray:
        """[N_templates, D] raw (unnormalized) text embeddings."""
        if isinstance(text, str):
            text = [text]
        embs = []
        for prompt in text:
            toks = jnp.asarray(
                tokenize(compose_text_with_templates(prompt, template))
            )
            e = self.model.apply(
                self.variables, toks, method=self.model.encode_text
            )
            embs.append(e)
        out = jnp.concatenate(embs, axis=0)
        if average_embeddings:
            out = out.mean(axis=0, keepdims=True)
        return out

    # -- images --------------------------------------------------------
    def embed_image_views(
        self, x01: jnp.ndarray, key: jax.Array, valid_hw=None, frame_hw=None,
        variables=None,
    ) -> jnp.ndarray:
        """[B, H, W, 3] in [0,1] -> [B, n_aug, D] embeddings of augmented views.

        ``variables`` overrides the constructor's CLIP weights: inside jit
        the override arrives as a TRACED pytree, so the (possibly huge)
        tower is an executable *argument* — closing over ``self.variables``
        would bake it into the HLO as constants (~600 MB for ViT-B/32,
        which the remote compile service rejects).
        """
        if variables is None:
            variables = self.variables
        B = x01.shape[0]
        n_aug = self.n_aug
        keys = jax.random.split(key, B)
        # same per-image key fan-out as augment_views, pre-split so the
        # views can be built (and differentiated) in chunks
        perk = jax.vmap(lambda k: jax.random.split(k, 2 * n_aug))(keys)
        kcs, kas = perk[:, :n_aug], perk[:, n_aug:]  # [B, n_aug, ...]
        c = self._chunk_size()
        n_chunks = n_aug // c

        def encode_chunk(args):
            """views idc (all images) -> [B, c, D] embeddings."""
            idc, kc, ka = args  # [c], [B, c, ...], [B, c, ...]
            views = jax.vmap(
                lambda img, kcb, kab: augment_views_subset(
                    kcb, kab, idc, img, self.affine_fill,
                    valid_hw=valid_hw, frame_hw=frame_hw,
                    mm_adjoint=self.mm_adjoint,
                    warp_precision=self.warp_precision,
                    warp_impl=self.warp_impl,
                )
            )(x01, kc, ka)  # [B, c, ch, cw, 3]
            # second named residual: the finished (post-color) views, so
            # the tower's remat re-forward starts here and the color
            # pipeline replays from the saved 'warp_out' instead of from
            # a re-run of the warp itself
            views = checkpoint_name(views, "clip_views")
            flat = views.reshape((B * c,) + views.shape[2:])
            embs = self.model.apply(
                variables, clip_normalize(flat),
                method=self.model.encode_image,
            )
            return embs.reshape(B, c, -1)

        if self.remat:
            # the checkpoint must cover the WHOLE chunk, not just the ViT
            # tower: the color-jitter/grayscale pipeline's elementwise
            # intermediates are view-sized too, and storing them for the
            # backward pass OOMs the chip (measured: 22.8 G needed vs
            # 15.75 G HBM at B16/4-view chunks with tower-only remat).
            # save_views additionally keeps the two named view tensors
            # (~77 MB per chunk at ViT-B/32 scale) as residuals, so the
            # backward replay skips the warp stage completely — the warp's
            # custom VJP needs only (img, coords), both cheap to rebuild
            policy = (
                jax.checkpoint_policies.save_only_these_names(
                    "warp_out", "clip_views", "vit_patches"
                )
                if self.save_views
                else None
            )
            if self.save_dots:
                # also keep every dot_general output: the backward's tower
                # replay becomes elementwise-only (LN/gelu/softmax), no
                # matmuls — see save_dots in __init__
                dots = jax.checkpoint_policies.dots_saveable
                policy = (
                    jax.checkpoint_policies.save_from_both_policies(
                        policy, dots
                    )
                    if policy is not None
                    else dots
                )
            encode_chunk = jax.checkpoint(encode_chunk, policy=policy)

        idxs = jnp.arange(n_aug)
        if n_chunks == 1:
            return encode_chunk((idxs, kcs, kas))
        # sequential over chunks: bounds both the encoder's activation
        # memory and the warp-VJP scatter buffers to one chunk at a time
        def to_chunks(a):
            return jnp.moveaxis(
                a.reshape((B, n_chunks, c) + a.shape[2:]), 0, 1
            )

        embs = jax.lax.map(
            encode_chunk,
            (idxs.reshape(n_chunks, c), to_chunks(kcs), to_chunks(kas)),
        )  # [n_chunks, B, c, D]
        return jnp.moveaxis(embs, 0, 1).reshape(B, n_aug, -1)

    # -- loss ----------------------------------------------------------
    def calculate_clip_loss(
        self,
        x01: jnp.ndarray,
        text_embeds: jnp.ndarray,
        key: jax.Array,
        valid_hw=None,
        frame_hw=None,
        variables=None,
    ) -> jnp.ndarray:
        """Stochastic-template CLIP loss (clip_extractor.py:134-147).

        ``variables`` optionally overrides the tower weights (traced-arg
        path, see :meth:`embed_image_views`).
        """
        n_total = text_embeds.shape[0]
        kn, ki, ka = jax.random.split(key, 3)
        n_sel = jax.random.randint(kn, (), 1, n_total + 1)
        idx = jax.random.randint(ki, (n_total,), 0, n_total)
        sel_mask = (jnp.arange(n_total) < n_sel).astype(jnp.float32)
        selected = text_embeds[idx]  # [n_total, D] (first n_sel count)

        img_embs = self.embed_image_views(
            x01, ka, valid_hw=valid_hw, frame_hw=frame_hw, variables=variables
        )  # [B, n_aug, D]
        img_n = img_embs / jnp.linalg.norm(img_embs, axis=-1, keepdims=True)
        txt_n = selected / jnp.linalg.norm(selected, axis=-1, keepdims=True)
        # cos[b, t] = mean over views of <img view, template t>
        cos = jnp.einsum("bvd,td->bvt", img_n, txt_n).mean(axis=1)
        per_pair = 1.2 * (1.0 - cos)  # [B, n_total]
        loss = jnp.sum(per_pair * sel_mask[None, :]) / n_sel
        return loss
