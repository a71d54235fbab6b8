"""Differentiable homography warps and color ops (static output shapes).

CLIP guidance backpropagates **through** the stochastic augmentations
(reference ``SinDDM/models.py:387`` differentiates the loss built from 16
torchvision-augmented views, ``text2live_util/clip_extractor.py:68-96``).
Torchvision's crop/resize/affine/perspective are all projective maps, so
the TPU-native design composes each view's whole spatial pipeline into ONE
3x3 homography and performs a single bilinear gather with constant fill —
static output shape (no data-dependent crop sizes), fully differentiable
w.r.t. the image, batchable over views.

Conventions: homogeneous coords (x, y, 1) in pixels, pixel centers at
integer coordinates; matrices map OUTPUT pixel coords -> INPUT sample
coords (the inverse map used by the sampler).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

# experiment escape hatch (read at import): SINDDM_MM_FORWARD=0 keeps the
# matmul ADJOINT but routes the forward through the 4-tap gather, the
# pre-round-3 behavior — used by benchmarks/guided_cost_breakdown.py to
# compare the two forwards on real hardware
_MM_FORWARD = os.environ.get("SINDDM_MM_FORWARD", "1") != "0"

# MXU precision for the soft-one-hot matmuls. "highest" is fp32-exact
# and the parity-preserving default. "high" cuts warp f+b 170->123 ms
# per 64-view guided chunk BUT on this TPU backend it measures like a
# single-pass bf16 product: max |grad diff| vs the gather path ~5% of
# max |grad| (benchmarks/warp_variants_r3.jsonl) — a quality knob in the
# same class as the bf16 CLIP tower, not a free win. Module-level so
# experiment harnesses can flip it before tracing
# (benchmarks/warp_variants_bench.py).
_MM_PRECISION = os.environ.get("SINDDM_MM_PRECISION", "highest")

# fold the per-channel matmuls into one W*C-wide (fwd) / H-tall (bwd)
# matmul: fewer, larger MXU dispatches but ~3x the peak operand memory
# (the folded [N, W*C] intermediate must materialize as a dot operand).
_MM_FOLD = os.environ.get("SINDDM_MM_FOLD", "0") != "0"

# default warp implementation for GUIDANCE call sites only ('': auto —
# the windowed Pallas kernel on TPU when the source fits, else the XLA
# matmul path; 'mm': force the XLA matmul path; 'pallas': the fused VMEM
# kernel in ops/pallas_warp.py; 'pallas_win': its dynamic-128-row-window
# variant — one MXU K-pass).
# Module-level so benchmarks can flip it between traces, env for CLI-level
# experiments. Scoped to mm_adjoint=True callers: like bilinear_sample_mm,
# the pallas kernel zeroes the coords cotangent, so applying it to
# gather-path callers (which DO propagate coordinate gradients, e.g.
# ops/augment_extra.py) would silently change differentiability semantics.
_WARP_IMPL = os.environ.get("SINDDM_WARP_IMPL", "")


def _precision(name: "str | None" = None):
    return {
        "highest": jax.lax.Precision.HIGHEST,
        "high": jax.lax.Precision.HIGH,
        "default": jax.lax.Precision.DEFAULT,
    }[name or _MM_PRECISION]


def bilinear_sample(
    img: jnp.ndarray, coords: jnp.ndarray, fill: float = 0.0
) -> jnp.ndarray:
    """Sample img [H, W, C] at coords [..., 2] (x, y); constant fill outside.

    Implemented as a single flat 1-D ``jnp.take`` over row-major indices —
    Mosaic compiles flat gathers far faster than 2-D advanced indexing
    (the 16-view augmentation pipeline's compile time dropped ~10x).
    """
    H, W = img.shape[0], img.shape[1]
    C = img.shape[2]
    flat = img.reshape(H * W, C)
    x, y = coords[..., 0], coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = x - x0
    wy1 = y - y0
    wx0, wy0 = 1.0 - wx1, 1.0 - wy1

    def tap(xi, yi):
        inb = (xi >= 0) & (xi <= W - 1) & (yi >= 0) & (yi <= H - 1)
        xi_c = jnp.clip(xi, 0, W - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, H - 1).astype(jnp.int32)
        v = jnp.take(flat, yi_c * W + xi_c, axis=0)
        return jnp.where(inb[..., None], v, jnp.asarray(fill, img.dtype))

    out = (
        tap(x0, y0) * (wx0 * wy0)[..., None]
        + tap(x1, y0) * (wx1 * wy0)[..., None]
        + tap(x0, y1) * (wx0 * wy1)[..., None]
        + tap(x1, y1) * (wx1 * wy1)[..., None]
    )
    return out


@partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bilinear_sample_mm(
    img: jnp.ndarray,
    coords: jnp.ndarray,
    fill: float = 0.0,
    precision: "str | None" = None,
) -> jnp.ndarray:
    """:func:`bilinear_sample` semantics with matmul forward AND adjoint.

    On TPU both directions of the 4-tap sampler are bound by
    irregular-memory ops: forward is a 4-tap random gather (measured
    182.5 ms per 64-view guided chunk — the matmul forward runs the whole
    augmentation fwd incl. color ops in 106 ms), and autodiff's adjoint is
    a scatter-add that XLA lowers to a sort-based scatter (874 ms per
    chunk — 84% of a guided timestep at ViT-B/32 scale,
    ``benchmarks/guided_cost_breakdown_matrix_r3.jsonl``). Bilinear taps factorize
    into row/col terms w(yi, xj) = ryi * rxj, so with A[q, Y] / B[q, X]
    the two-nonzero "soft one-hot" matrices over flattened output pixels
    q (in-bounds-masked tap weights), both directions become MXU work:

        forward:  out[q, c] = sum_X B[q, X] * (A @ img[:, :, c])[q, X]
                              + fill * (1 - coverage[q])
        adjoint:  ct_img[:, :, c] = (A * ct[:, c:c+1])^T @ B

    one matmul per channel each way, ``precision='highest'`` (each
    output sums only a handful of terms, so this is fp32-exact up to
    summation order vs the gather/scatter reference — tested at 1e-5).

    NON-differentiable w.r.t. ``coords`` and ``fill`` (their cotangents
    are zero): use :func:`bilinear_sample` where coordinate gradients
    matter. Guidance only differentiates w.r.t. the image — the view
    homographies are RNG draws.
    """
    if not _MM_FORWARD:
        return bilinear_sample(img, coords, fill=fill)
    return _bilinear_forward_mm(img, coords, fill, precision)


def _soft_onehots(coords: jnp.ndarray, H: int, W: int):
    """Flattened A [N, H] / B [N, W] tap-weight matrices + coverage [N].

    Built as hat functions: A[q, y] = relu(1 - |y_coord[q] - y|). For any
    in-range tap row this is exactly the bilinear tap weight of
    :func:`bilinear_sample` (at y = floor(yc): 1 - (yc - y) = wy0; at
    y = floor(yc)+1: wy1), and out-of-range taps contribute nothing
    because their row simply does not exist — the same zero-not-
    renormalize boundary convention as the gather path. 4 elementwise ops
    per matrix vs the floor/compare/clip/mask build (~7 + int casts).
    """
    x = coords[..., 0].reshape(-1)
    y = coords[..., 1].reshape(-1)
    ys = jnp.arange(H, dtype=coords.dtype)
    xs = jnp.arange(W, dtype=coords.dtype)
    A = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - ys[None, :]))
    B = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - xs[None, :]))
    # total in-bounds tap mass; the raw weights always sum to 1, so the
    # constant-fill contribution is fill * (1 - coverage)
    cover = jnp.sum(A, axis=-1) * jnp.sum(B, axis=-1)
    return A, B, cover


def _bilinear_forward_mm(img, coords, fill, precision=None):
    H, W = img.shape[0], img.shape[1]
    C = img.shape[2]
    A, B, cover = _soft_onehots(coords, H, W)
    A = A.astype(img.dtype)
    B = B.astype(img.dtype)
    prec = _precision(precision)

    if _MM_FOLD:
        # one [N, H] x [H, W*C] matmul, then the column taps as an
        # elementwise product + reduce over W
        tmp = jnp.einsum("qy,ywc->qwc", A, img, precision=prec)
        val = jnp.einsum("qwc,qw->qc", tmp, B, precision=prec)
    else:

        def one_channel(c):
            # [N, W] row-interpolated slab (matmul), then the column taps
            # as an elementwise product + reduce (B fuses into the
            # reduction)
            tmp = jnp.einsum("qy,yw->qw", A, img[:, :, c], precision=prec)
            return jnp.einsum("qw,qw->q", tmp, B, precision=prec)

        val = jnp.stack([one_channel(c) for c in range(C)], axis=-1)
    out = val + (1.0 - cover)[:, None] * jnp.asarray(fill, img.dtype)
    return out.reshape(coords.shape[:-1] + (C,))


def _bilinear_sample_mm_fwd(img, coords, fill, precision):
    out = (
        _bilinear_forward_mm(img, coords, fill, precision)
        if _MM_FORWARD
        else bilinear_sample(img, coords, fill=fill)
    )
    return out, (img, coords)


def _bilinear_sample_mm_bwd(fill, precision, res, ct):
    img, coords = res
    H, W = img.shape[0], img.shape[1]
    C = img.shape[2]
    A, B, _ = _soft_onehots(coords, H, W)
    A = A.astype(ct.dtype)
    B = B.astype(ct.dtype)
    ct_flat = ct.reshape(-1, C)
    prec = _precision(precision)

    if _MM_FOLD:
        # one [H, N] x [N, W*C] matmul over the ct-folded column factors
        M = B[:, :, None] * ct_flat[:, None, :]  # [N, W, C]
        ct_img = jnp.einsum("qy,qwc->ywc", A, M, precision=prec)
    else:

        def one_channel(c):
            return jnp.einsum(
                "qy,qx->yx", A * ct_flat[:, c][:, None], B, precision=prec
            )

        # channel count is tiny and static; a python loop keeps peak
        # memory at one [N, H] folded operand per channel
        ct_img = jnp.stack([one_channel(c) for c in range(C)], axis=-1)
    return ct_img.astype(img.dtype), jnp.zeros_like(coords)


bilinear_sample_mm.defvjp(_bilinear_sample_mm_fwd, _bilinear_sample_mm_bwd)


def warp_homography(
    img: jnp.ndarray,
    matrix: jnp.ndarray,
    out_hw: Tuple[int, int],
    fill: float = 0.0,
    mm_adjoint: bool = False,
    precision: "str | None" = None,
    impl: "str | None" = None,
) -> jnp.ndarray:
    """Warp img [H, W, C] by the out->in homography; output [h, w, C].

    ``mm_adjoint=True`` routes through :func:`bilinear_sample_mm` (matmul
    image-adjoint, no gradient to ``matrix``) — the fast path for
    guidance, which differentiates w.r.t. the image only. ``precision``
    sets the MXU precision of that path (None = module default).
    ``impl='pallas'`` routes both directions through the fused VMEM
    kernel (``ops/pallas_warp.py``; also no gradient to ``matrix``);
    None falls back to the module default (``SINDDM_WARP_IMPL``) — but
    only for ``mm_adjoint=True`` call sites, so the env var cannot
    silently zero coordinate gradients for gather-path callers.
    """
    h, w = out_hw
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=jnp.float32),
        jnp.arange(w, dtype=jnp.float32),
        indexing="ij",
    )
    ones = jnp.ones_like(xs)
    pts = jnp.stack([xs, ys, ones], axis=-1)  # [h, w, 3]
    src = pts @ matrix.T
    src = src[..., :2] / jnp.maximum(jnp.abs(src[..., 2:3]), 1e-8) * jnp.sign(
        src[..., 2:3]
    )
    if impl is None and mm_adjoint:
        impl = _WARP_IMPL or None
        if impl is None and jax.default_backend() == "tpu":
            # measured guidance default on the chip (warp_variants bench):
            # windowed Pallas beats the XLA matmul path, and the
            # transposed-reduction forward (winx) beats the windowed
            # kernel 232.7 vs 252.6 ms per 128-view f+b chunk with the
            # same ~3e-5 grad parity (benchmarks/warp_variants_r4_winx
            # .jsonl); oversize sources fall back to XLA mm
            from sinddm_tpu.ops.pallas_warp import pallas_win_supported

            if pallas_win_supported(*img.shape):
                impl = "pallas_winx"
    if impl == "mm":
        impl = None  # explicit XLA-matmul opt-out (CLI --warp_impl mm)
    if impl in ("pallas", "pallas_win", "pallas_winx", "pallas_winb", "pallas_win3"):
        from sinddm_tpu.ops import pallas_warp

        fn = {
            "pallas": pallas_warp.bilinear_sample_pallas,
            "pallas_win": pallas_warp.bilinear_sample_pallas_win,
            "pallas_winx": pallas_warp.bilinear_sample_pallas_winx,
            "pallas_winb": pallas_warp.bilinear_sample_pallas_winb,
            "pallas_win3": pallas_warp.bilinear_sample_pallas_win3,
        }[impl]
        # interpret mode off-TPU so the same code path is testable there
        # (the Mosaic kernel only compiles for TPU backends)
        return fn(img, src, fill, jax.default_backend() != "tpu")
    if mm_adjoint:
        return bilinear_sample_mm(img, src, fill, precision)
    return bilinear_sample(img, src, fill=fill)


# ---------------------------------------------------------------------------
# matrix builders (all return out->in maps)
# ---------------------------------------------------------------------------


def crop_resize_matrix(
    y0, x0, crop_h, crop_w, out_hw: Tuple[int, int]
) -> jnp.ndarray:
    """Crop [y0, x0, crop_h, crop_w] then resize to out_hw (traced floats ok)."""
    h, w = out_hw
    sy = crop_h / h
    sx = crop_w / w
    # align centers like a bilinear resize with half-pixel centers:
    # in = (out + 0.5) * scale - 0.5 + offset
    return jnp.asarray(
        [
            [sx, 0.0, x0 + 0.5 * sx - 0.5],
            [0.0, sy, y0 + 0.5 * sy - 0.5],
            [0.0, 0.0, 1.0],
        ]
    )


def hflip_matrix(w: int) -> jnp.ndarray:
    return jnp.asarray(
        [[-1.0, 0.0, float(w - 1)], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    )


def affine_matrix(
    angle_deg, translate_xy, hw: Tuple[int, int]
) -> jnp.ndarray:
    """Inverse map of a rotation about the image center plus translation
    (torchvision RandomAffine semantics: rotate, then translate)."""
    h, w = hw
    cx, cy = (w - 1) / 2.0, (h - 1) / 2.0
    a = -angle_deg * jnp.pi / 180.0  # inverse rotation
    cos, sin = jnp.cos(a), jnp.sin(a)
    tx, ty = translate_xy
    # out -> in: undo translate, then rotate about center by -angle
    m = jnp.asarray(
        [
            [cos, -sin, cx - cos * (cx + tx) + sin * (cy + ty)],
            [sin, cos, cy - sin * (cx + tx) - cos * (cy + ty)],
            [0.0, 0.0, 1.0],
        ]
    )
    return m


def _unit_square_to_quad(quad: jnp.ndarray) -> jnp.ndarray:
    """Closed-form homography mapping the unit square to a quad.

    Corner order: (0,0)->q0, (1,0)->q1, (1,1)->q2, (0,1)->q3 (the standard
    projective texture-mapping formula — pure elementwise ops, no LU solve,
    so the TPU compiler doesn't have to lower a pivoting loop).
    """
    x0, y0 = quad[0, 0], quad[0, 1]
    x1, y1 = quad[1, 0], quad[1, 1]
    x2, y2 = quad[2, 0], quad[2, 1]
    x3, y3 = quad[3, 0], quad[3, 1]
    dx1, dy1 = x1 - x2, y1 - y2
    dx2, dy2 = x3 - x2, y3 - y2
    sx = x0 - x1 + x2 - x3
    sy = y0 - y1 + y2 - y3
    den = dx1 * dy2 - dx2 * dy1
    g = (sx * dy2 - dx2 * sy) / den
    h = (dx1 * sy - sx * dy1) / den
    a = x1 - x0 + g * x1
    b = x3 - x0 + h * x3
    c = x0
    d = y1 - y0 + g * y1
    e = y3 - y0 + h * y3
    f = y0
    return jnp.stack(
        [
            jnp.stack([a, b, c]),
            jnp.stack([d, e, f]),
            jnp.stack([g, h, jnp.ones_like(a)]),
        ]
    )


def _mat3_inverse(m: jnp.ndarray) -> jnp.ndarray:
    """Closed-form 3x3 inverse (adjugate / determinant)."""
    a, b, c = m[0, 0], m[0, 1], m[0, 2]
    d, e, f = m[1, 0], m[1, 1], m[1, 2]
    g, h, i = m[2, 0], m[2, 1], m[2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    adj = jnp.stack(
        [
            jnp.stack([A, -(b * i - c * h), b * f - c * e]),
            jnp.stack([B, a * i - c * g, -(a * f - c * d)]),
            jnp.stack([C, -(a * h - b * g), a * e - b * d]),
        ]
    )
    return adj / det


def perspective_matrix(
    startpoints: jnp.ndarray, endpoints: jnp.ndarray
) -> jnp.ndarray:
    """Homography H with H @ end ~ start (out->in), from 4 point pairs.

    torchvision RandomPerspective: startpoints are the image corners,
    endpoints the inward-perturbed corners; sampling output pixel p takes
    the value at H(p). Built as (unit->start) @ (unit->end)^-1 — closed
    form, no linear solve.
    """
    h_start = _unit_square_to_quad(jnp.asarray(startpoints, jnp.float32))
    h_end = _unit_square_to_quad(jnp.asarray(endpoints, jnp.float32))
    return h_start @ _mat3_inverse(h_end)


# ---------------------------------------------------------------------------
# color ops (differentiable; torchvision formulas)
# ---------------------------------------------------------------------------

_GRAY_W = jnp.asarray([0.2989, 0.587, 0.114])


def rgb_to_grayscale(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.sum(x * _GRAY_W, axis=-1, keepdims=True)


def adjust_brightness(x, f):
    return jnp.clip(x * f, 0.0, 1.0)


def adjust_contrast(x, f):
    mean = jnp.mean(rgb_to_grayscale(x), axis=(-3, -2, -1), keepdims=True)
    return jnp.clip(mean + f * (x - mean), 0.0, 1.0)


def adjust_saturation(x, f):
    g = rgb_to_grayscale(x)
    return jnp.clip(g + f * (x - g), 0.0, 1.0)


def _rgb_to_hsv(x):
    r, g, b = x[..., 0], x[..., 1], x[..., 2]
    maxc = jnp.max(x, axis=-1)
    minc = jnp.min(x, axis=-1)
    v = maxc
    deltac = maxc - minc
    s = jnp.where(maxc > 0, deltac / jnp.maximum(maxc, 1e-8), 0.0)
    dc = jnp.maximum(deltac, 1e-8)
    rc = (maxc - r) / dc
    gc = (maxc - g) / dc
    bc = (maxc - b) / dc
    h = jnp.where(
        maxc == r, bc - gc, jnp.where(maxc == g, 2.0 + rc - bc, 4.0 + gc - rc)
    )
    h = jnp.where(deltac > 0, (h / 6.0) % 1.0, 0.0)
    return h, s, v


def _hsv_to_rgb(h, s, v):
    i = jnp.floor(h * 6.0)
    f = h * 6.0 - i
    p = v * (1.0 - s)
    q = v * (1.0 - f * s)
    t = v * (1.0 - (1.0 - f) * s)
    i = i.astype(jnp.int32) % 6
    r = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [v, q, p, p, t, v])
    g = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [t, v, v, q, p, p])
    b = jnp.select([i == 0, i == 1, i == 2, i == 3, i == 4, i == 5], [p, p, t, v, v, q])
    return jnp.stack([r, g, b], axis=-1)


def adjust_hue(x, factor):
    """Shift hue by factor in [-0.5, 0.5] (HSV round trip, a.e. differentiable)."""
    h, s, v = _rgb_to_hsv(jnp.clip(x, 0.0, 1.0))
    h = (h + factor) % 1.0
    return _hsv_to_rgb(h, s, v)
