"""Pallas TPU kernel for the bilinear view warp (experimental, opt-in).

The matmul warp (``ops/warp.py bilinear_sample_mm``) made both directions
of the 4-tap bilinear sampler MXU work, but it materializes the soft-
one-hot tap matrices A [N, H] / B [N, W] in HBM (~50/66 MB per 224x298
guided view) and round-trips the [N, W] row-interpolated slab per
channel: measured 106 ms forward / 67 ms backward per 64-view guided
chunk (``benchmarks/guided_cost_breakdown_matrix_r3.jsonl``) against an
MXU-bound floor of ~36 ms each way.

This kernel removes the HBM traffic entirely: the *whole source image*
fits in VMEM (186x248x3 fp32 = 554 KB against ~16 MB), so the grid walks
output-pixel tiles, builds the A/B tiles on the fly from the coordinate
tile (two hat-function broadcasts), and keeps every intermediate —
A_tile, the row-interpolated slab, the backward accumulator — in VMEM.
HBM traffic per view drops to coords-in + pixels-out (~1.3 MB).

Semantics are identical to :func:`sinddm_tpu.ops.warp.bilinear_sample_mm`
(constant fill outside, zero-not-renormalize boundary taps, image
cotangent only); parity is pinned by ``tests/test_pallas_warp.py`` in
interpret mode and by ``benchmarks/warp_variants_bench.py --impl pallas``
on device. Reference behavioral contract: the torchvision augmentation
sampling the reference differentiates through
(``/root/reference/SinDDM/models.py:387``,
``text2live_util/clip_extractor.py:68-96``).

On-chip results (warp_variants bench, 64 views fwd+bwd, balloons finest
186x248 -> 224x298): this whole-image kernel measured a WASH vs the XLA
matmul path (173.5 vs 176.2 ms) — the computation is MXU-FLOP-bound, so
killing HBM traffic alone buys nothing. The windowed variant below
(``bilinear_sample_pallas_win``) attacks the FLOPs instead: 138.6 ms vs
the 175.2 ms XLA anchor (1.26x), grad parity 8.6e-6 — it is therefore
the automatic guidance default on TPU (ops/warp.py), per the standing
round-2 rule (no alternative executor ships as default without beating
XLA on the chip). Opt out with SINDDM_WARP_IMPL=mm / --warp_impl mm;
select explicitly via ``ClipExtractor(warp_impl=...)``.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Output-pixel tile: 512 rows keeps every VMEM buffer small
# (A 512x186 = 381 KB, slab 512x248 = 508 KB) while giving the MXU
# [512, H] x [H, W] work per step.
_TQ = 512

_HIGHEST = jax.lax.Precision.HIGHEST

# Conservative budget for the whole-image VMEM blocks: the fwd kernel
# holds img [C, H, W] + A/B/slab tiles, the bwd kernel additionally the
# full [C, H, W] gradient accumulator. Past this, Mosaic fails with an
# opaque VMEM-exhaustion error — fail early with a pointer to the XLA
# matmul path instead.
_VMEM_IMG_BUDGET = 4 * 1024 * 1024


def _check_vmem(H: int, W: int, C: int) -> None:
    nbytes = C * H * W * 4
    if nbytes > _VMEM_IMG_BUDGET:
        raise ValueError(
            f"bilinear_sample_pallas: image [{H}, {W}, {C}] needs "
            f"{nbytes / 1e6:.1f} MB of VMEM residency, over the "
            f"{_VMEM_IMG_BUDGET / 1e6:.0f} MB budget; use the XLA matmul "
            "path (warp_homography(..., mm_adjoint=True)) for large images."
        )


def _pad_n(n: int) -> int:
    return ((n + _TQ - 1) // _TQ) * _TQ


def _fwd_kernel(xs_ref, ys_ref, img_ref, out_ref, cover_ref, *, H, W, C):
    # coords tile [TQ]; out-of-range / padded coords make all-zero hat rows
    x = xs_ref[0, :]
    y = ys_ref[0, :]
    # Mosaic's tpu.iota is integer-only; build int32 and cast
    yi = jax.lax.broadcasted_iota(jnp.int32, (_TQ, H), 1).astype(jnp.float32)
    A = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - yi))  # [TQ, H]
    xi = jax.lax.broadcasted_iota(jnp.int32, (_TQ, W), 1).astype(jnp.float32)
    B = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - xi))  # [TQ, W]
    cover_ref[0, :] = jnp.sum(A, axis=-1) * jnp.sum(B, axis=-1)
    for c in range(C):
        slab = jnp.dot(
            A, img_ref[0, c], preferred_element_type=jnp.float32,
            precision=_HIGHEST,
        )  # [TQ, W] row-interpolated, never leaves VMEM
        out_ref[0, c, :] = jnp.sum(slab * B, axis=-1)


def _bwd_kernel(xs_ref, ys_ref, ct_ref, gimg_ref, *, H, W, C):
    q = pl.program_id(0)

    @pl.when(q == 0)
    def _zero():
        gimg_ref[...] = jnp.zeros(gimg_ref.shape, gimg_ref.dtype)

    x = xs_ref[0, :]
    y = ys_ref[0, :]
    yi = jax.lax.broadcasted_iota(jnp.int32, (_TQ, H), 1).astype(jnp.float32)
    A = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - yi))
    xi = jax.lax.broadcasted_iota(jnp.int32, (_TQ, W), 1).astype(jnp.float32)
    B = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - xi))
    for c in range(C):
        ct_c = ct_ref[0, c, :]  # [TQ]
        # ct_img[y, w] += sum_q A[q, y] * ct[q] * B[q, w] — one MXU
        # matmul contracting the tile dim; accumulate in the revisited
        # VMEM output block
        contrib = jax.lax.dot_general(
            A * ct_c[:, None], B, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGHEST,
        )  # [H, W]
        gimg_ref[0, c] += contrib


def _prep_coords(
    coords: jnp.ndarray, tq: int = _TQ
) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Flatten [..., 2] coords to padded xs/ys [1, N_pad] (pad = -2, a
    coordinate with zero tap weight everywhere and zero coverage)."""
    x = coords[..., 0].reshape(-1)
    y = coords[..., 1].reshape(-1)
    n = x.shape[0]
    n_pad = ((n + tq - 1) // tq) * tq
    if n_pad != n:
        pad = jnp.full((n_pad - n,), -2.0, x.dtype)
        x = jnp.concatenate([x, pad])
        y = jnp.concatenate([y, pad])
    return x[None].astype(jnp.float32), y[None].astype(jnp.float32), n


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bilinear_sample_pallas(
    img: jnp.ndarray, coords: jnp.ndarray, fill: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """:func:`sinddm_tpu.ops.warp.bilinear_sample` semantics, Pallas-fused.

    img [H, W, C] fp32, coords [..., 2] (x, y) — differentiable w.r.t.
    ``img`` only (coords/fill cotangents are zero), like
    ``bilinear_sample_mm``.
    """
    out, _ = _forward(img, coords, fill, interpret)
    return out


def _forward(img, coords, fill, interpret=False):
    H, W, C = img.shape
    _check_vmem(H, W, C)
    xs, ys, n = _prep_coords(coords)
    n_pad = xs.shape[1]
    grid = (n_pad // _TQ,)
    imgs = jnp.moveaxis(img.astype(jnp.float32), -1, 0)[None]  # [1, C, H, W]
    out, cover = pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, W=W, C=C),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, _TQ), lambda q: (0, q)),
            pl.BlockSpec((1, _TQ), lambda q: (0, q)),
            pl.BlockSpec((1, C, H, W), lambda q: (0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, C, _TQ), lambda q: (0, 0, q)),
            pl.BlockSpec((1, _TQ), lambda q: (0, q)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, C, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(xs, ys, imgs)
    val = jnp.moveaxis(out[0, :, :n], 0, -1)  # [n, C]
    val = val + (1.0 - cover[0, :n, None]) * jnp.asarray(fill, jnp.float32)
    return val.reshape(coords.shape[:-1] + (C,)).astype(img.dtype), None


def _fwd_rule(img, coords, fill, interpret):
    out, _ = _forward(img, coords, fill, interpret)
    return out, (img, coords)


def _bwd_rule(fill, interpret, res, ct):
    img, coords = res
    H, W, C = img.shape
    _check_vmem(H, W, C)
    xs, ys, n = _prep_coords(coords)
    n_pad = xs.shape[1]
    ct_flat = jnp.moveaxis(ct.reshape(-1, C), -1, 0)  # [C, n]
    if n_pad != n:
        ct_flat = jnp.pad(ct_flat, ((0, 0), (0, n_pad - n)))
    ct_flat = ct_flat[None].astype(jnp.float32)  # [1, C, n_pad]
    gimg = pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, W=W, C=C),
        grid=(n_pad // _TQ,),
        in_specs=[
            pl.BlockSpec((1, _TQ), lambda q: (0, q)),
            pl.BlockSpec((1, _TQ), lambda q: (0, q)),
            pl.BlockSpec((1, C, _TQ), lambda q: (0, 0, q)),
        ],
        out_specs=pl.BlockSpec((1, C, H, W), lambda q: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, C, H, W), jnp.float32),
        # The accumulation into the revisited output block (zero-init at
        # q==0, += after) is only correct under sequential grid execution
        # — pin it so a future parallel/megacore annotation can't race it.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(xs, ys, ct_flat)
    ct_img = jnp.moveaxis(gimg[0], 0, -1).astype(img.dtype)  # [H, W, C]
    return ct_img, jnp.zeros_like(coords)


bilinear_sample_pallas.defvjp(_fwd_rule, _bwd_rule)


# ---------------------------------------------------------------------------
# Windowed variant: dynamic 128-row source window per output tile
# ---------------------------------------------------------------------------
#
# The fused kernel above is MXU-FLOP-bound (measured wash vs the XLA
# matmul path, benchmarks/warp_variants_r4_pallas.jsonl): the A @ img
# contraction pads H=186 -> 256 lanes, two K-passes per tile. But a TQ-run
# of flattened output pixels only touches a bounded band of source rows —
# measured over the real guidance augmentation distribution
# (benchmarks/warp_window_analysis.py, balloons finest 186x248 -> 224x299):
# flat TQ=512 max y-span 133.3, with only 0.01% of tiles exceeding a
# 128-row window. So each grid step slices a dynamic 8-aligned WY=128 row
# window of the VMEM-resident image and contracts [TQ, 128] x [128, W] —
# exactly one MXU K-pass, ~2x fewer MXU FLOPs each direction.
#
# Correctness for ANY homography (not just the measured distribution):
# window 1 starts at o = floor(min y) (clamped, 8-aligned down), so no tap
# row lies below it; a pl.when-guarded window 2 at the static offset
# HP - WY covers [HP - WY, HP) with taps masked to rows >= o + WY, so the
# two windows' union covers [o, HP) disjointly whenever the tile's taps
# overflow window 1 (requires HP <= o + 2*WY, i.e. source H <= WY + o_max
# + WY — guarded host-side). The second matmul only runs on overflow
# tiles (0.01% measured), so its cost is noise.

_WY = 128

# Output tile of the windowed kernel. The per-tile y-span grows only
# marginally with tile length (133.3 at TQ=512 -> 136.8 at TQ=2048,
# overflow rate 0.01% throughout — benchmarks/warp_window_analysis.py
# --flat). Measured on-chip (warp_variants bench, 64 views f+b):
# TQ=512 138.6 ms vs TQ=1024 142.8 ms — grid overhead is NOT the
# bottleneck, so keep the smaller tile.
_TQ_WIN = 512

# Mosaic lowers only DEFAULT and HIGHEST dot precisions (HIGH raises
# NotImplementedError, measured 2026-08); the windowed dots stay HIGHEST
# — fp32-exact vs the gather oracle, 6 MXU passes.
_PREC_FWD = jax.lax.Precision.HIGHEST


def _win_kernel_common(xs_ref, ys_ref, H, HP):
    """Shared window/tap-matrix construction for fwd and bwd kernels."""
    x = xs_ref[0, :]
    y = ys_ref[0, :]
    yc = jnp.clip(y, -1.0, float(H))
    o = jnp.floor(jnp.min(yc)).astype(jnp.int32)
    o = jnp.clip(o, 0, HP - _WY)
    o = (o // 8) * 8
    o = pl.multiple_of(o, 8)
    # highest tap row of the tile = floor(max y) + 1
    hi = jnp.floor(jnp.max(yc)).astype(jnp.int32) + 1
    overflow = hi > o + (_WY - 1)

    yi = jax.lax.broadcasted_iota(jnp.int32, (_TQ_WIN, _WY), 1) + o
    A = jnp.maximum(0.0, 1.0 - jnp.abs(y[:, None] - yi.astype(jnp.float32)))
    A = A * (yi < H).astype(jnp.float32)
    o2 = HP - _WY
    yi2 = jax.lax.broadcasted_iota(jnp.int32, (_TQ_WIN, _WY), 1) + o2
    A2 = jnp.maximum(
        0.0, 1.0 - jnp.abs(y[:, None] - yi2.astype(jnp.float32))
    )
    # rows >= o + WY only: window 1 owns [o, o + WY) (disjoint split, so
    # overlapping rows are never double-counted); zero when no overflow
    A2 = A2 * ((yi2 < H) & (yi2 >= o + _WY)).astype(jnp.float32)
    return x, o, overflow, A, A2


def _fwd_kernel_win(xs_ref, ys_ref, img_ref, out_ref, cover_ref, *, H, W, C,
                    HP):
    x, o, overflow, A, A2 = _win_kernel_common(xs_ref, ys_ref, H, HP)
    xi = jax.lax.broadcasted_iota(
        jnp.int32, (_TQ_WIN, W), 1
    ).astype(jnp.float32)
    B = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - xi))  # [TQ, W]
    cover_ref[0, :] = (
        jnp.sum(A, axis=-1) + jnp.sum(A2, axis=-1)
    ) * jnp.sum(B, axis=-1)
    for c in range(C):
        slab = jnp.dot(
            A, img_ref[0, c, pl.ds(o, _WY), :],
            preferred_element_type=jnp.float32, precision=_PREC_FWD,
        )  # [TQ, W]
        out_ref[0, c, :] = jnp.sum(slab * B, axis=-1)

    @pl.when(overflow)
    def _():
        for c in range(C):
            slab2 = jnp.dot(
                A2, img_ref[0, c, HP - _WY:, :],
                preferred_element_type=jnp.float32, precision=_PREC_FWD,
            )
            out_ref[0, c, :] += jnp.sum(slab2 * B, axis=-1)


def _bwd_kernel_win(xs_ref, ys_ref, ct_ref, gimg_ref, *, H, W, C, HP):
    q = pl.program_id(0)

    @pl.when(q == 0)
    def _zero():
        gimg_ref[...] = jnp.zeros(gimg_ref.shape, gimg_ref.dtype)

    x, o, overflow, A, A2 = _win_kernel_common(xs_ref, ys_ref, H, HP)
    xi = jax.lax.broadcasted_iota(
        jnp.int32, (_TQ_WIN, W), 1
    ).astype(jnp.float32)
    B = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - xi))
    for c in range(C):
        ct_c = ct_ref[0, c, :]
        contrib = jax.lax.dot_general(
            A * ct_c[:, None], B, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HIGHEST,
        )  # [WY, W]
        gimg_ref[0, c, pl.ds(o, _WY), :] += contrib

    @pl.when(overflow)
    def _():
        for c in range(C):
            ct_c = ct_ref[0, c, :]
            contrib2 = jax.lax.dot_general(
                A2 * ct_c[:, None], B, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_HIGHEST,
            )
            gimg_ref[0, c, HP - _WY:, :] += contrib2


def _pad_rows(H: int) -> int:
    """Padded row count: 8-aligned, >= WY so both windows exist, and
    <= 2*WY past the max window-1 offset so the two windows always cover
    every tap row (window 1 starts at o <= HP - WY, window 2 spans
    [HP - WY, HP) — union [o, HP) ⊇ [0, H))."""
    return max(((H + 7) // 8) * 8, _WY)


def pallas_win_supported(H: int, W: int, C: int) -> bool:
    """True when the windowed kernel handles this source shape (used by
    warp.py's automatic guidance-default selection: oversize images fall
    back to the XLA matmul path instead of erroring)."""
    return C * H * W * 4 <= _VMEM_IMG_BUDGET and _pad_rows(H) <= 2 * _WY


def _check_win(H: int, W: int, C: int) -> None:
    _check_vmem(H, W, C)
    # overflow tiles put rows [o + WY, HP) in window 2 = [HP - WY, HP);
    # coverage for the worst case o = 0 requires HP <= 2 * WY
    if _pad_rows(H) > 2 * _WY:
        # real bound: _pad_rows(H) = max(8-aligned H, WY) <= 2*WY,
        # i.e. H may be anything up to 2*WY (= 256) exactly
        raise ValueError(
            f"bilinear_sample_pallas_win: source H={H} > {2 * _WY} "
            "rows — a single overflow window cannot cover the remainder; "
            "use bilinear_sample_pallas or the XLA matmul path."
        )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bilinear_sample_pallas_win(
    img: jnp.ndarray, coords: jnp.ndarray, fill: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """:func:`bilinear_sample_pallas` semantics via windowed MXU tiles.

    Identical results (same tap weights, fill blending, image-only
    gradient); each output tile contracts a dynamic 128-row source window
    instead of the whole padded image — one MXU K-pass instead of two at
    the guidance shapes.
    """
    out, _ = _forward_win(img, coords, fill, interpret)
    return out


def _forward_win(img, coords, fill, interpret=False):
    H, W, C = img.shape
    _check_win(H, W, C)
    HP = _pad_rows(H)
    xs, ys, n = _prep_coords(coords, _TQ_WIN)
    n_pad = xs.shape[1]
    imgs = jnp.moveaxis(img.astype(jnp.float32), -1, 0)[None]  # [1, C, H, W]
    if HP != H:
        imgs = jnp.pad(imgs, ((0, 0), (0, 0), (0, HP - H), (0, 0)))
    out, cover = pl.pallas_call(
        functools.partial(_fwd_kernel_win, H=H, W=W, C=C, HP=HP),
        grid=(n_pad // _TQ_WIN,),
        in_specs=[
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
            pl.BlockSpec((1, C, HP, W), lambda q: (0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, C, _TQ_WIN), lambda q: (0, 0, q)),
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, C, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(xs, ys, imgs)
    val = jnp.moveaxis(out[0, :, :n], 0, -1)  # [n, C]
    val = val + (1.0 - cover[0, :n, None]) * jnp.asarray(fill, jnp.float32)
    return val.reshape(coords.shape[:-1] + (C,)).astype(img.dtype), None


def _fwd_rule_win(img, coords, fill, interpret):
    out, _ = _forward_win(img, coords, fill, interpret)
    return out, (img, coords)


def _bwd_rule_win(fill, interpret, res, ct):
    img, coords = res
    H, W, C = img.shape
    _check_win(H, W, C)
    HP = _pad_rows(H)
    xs, ys, n = _prep_coords(coords, _TQ_WIN)
    n_pad = xs.shape[1]
    ct_flat = jnp.moveaxis(ct.reshape(-1, C), -1, 0)  # [C, n]
    if n_pad != n:
        ct_flat = jnp.pad(ct_flat, ((0, 0), (0, n_pad - n)))
    ct_flat = ct_flat[None].astype(jnp.float32)  # [1, C, n_pad]
    gimg = pl.pallas_call(
        functools.partial(_bwd_kernel_win, H=H, W=W, C=C, HP=HP),
        grid=(n_pad // _TQ_WIN,),
        in_specs=[
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
            pl.BlockSpec((1, C, _TQ_WIN), lambda q: (0, 0, q)),
        ],
        out_specs=pl.BlockSpec((1, C, HP, W), lambda q: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, C, HP, W), jnp.float32),
        # accumulation into the revisited output block requires sequential
        # grid execution (same contract as _bwd_kernel above)
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(xs, ys, ct_flat)
    ct_img = jnp.moveaxis(gimg[0, :, :H], 0, -1).astype(img.dtype)
    return ct_img, jnp.zeros_like(coords)


bilinear_sample_pallas_win.defvjp(_fwd_rule_win, _bwd_rule_win)


# ---------------------------------------------------------------------------
# winx: transposed-reduction windowed forward
# ---------------------------------------------------------------------------
#
# The windowed kernel is VPU-bound (NOTES r4): after the MXU contraction
# the forward reduces slab*B over W lanes per channel — C x [TQ, W]
# multiply+reduce elements (W = 224..320 at guidance shapes). This
# variant contracts x FIRST on the MXU (R_c = window_c @ B^T, exact same
# MACs, contraction over W instead of WY) and reduces A^T * R_c over the
# 128-row window axis instead: the multiply+reduce shrinks to
# C x [WY=128, TQ] elements — a W/WY ~= 1.75-2.5x cut of the kernel's
# largest VPU term. Arithmetic is the same fp32 HIGHEST tap math, only
# the summation order changes (parity within fp noise). The backward is
# shared with the windowed kernel (already MXU-contracted over TQ).


def _win_kernel_common_t(xs_ref, ys_ref, H, HP, W):
    """Transposed tap construction: AT [WY, TQ], BT [W, TQ]."""
    x = xs_ref[0, :]
    y = ys_ref[0, :]
    yc = jnp.clip(y, -1.0, float(H))
    o = jnp.floor(jnp.min(yc)).astype(jnp.int32)
    o = jnp.clip(o, 0, HP - _WY)
    o = (o // 8) * 8
    o = pl.multiple_of(o, 8)
    hi = jnp.floor(jnp.max(yc)).astype(jnp.int32) + 1
    overflow = hi > o + (_WY - 1)

    yi = jax.lax.broadcasted_iota(jnp.int32, (_WY, _TQ_WIN), 0) + o
    AT = jnp.maximum(
        0.0, 1.0 - jnp.abs(y[None, :] - yi.astype(jnp.float32))
    )
    AT = AT * (yi < H).astype(jnp.float32)
    o2 = HP - _WY
    yi2 = jax.lax.broadcasted_iota(jnp.int32, (_WY, _TQ_WIN), 0) + o2
    AT2 = jnp.maximum(
        0.0, 1.0 - jnp.abs(y[None, :] - yi2.astype(jnp.float32))
    )
    AT2 = AT2 * ((yi2 < H) & (yi2 >= o + _WY)).astype(jnp.float32)

    wi = jax.lax.broadcasted_iota(jnp.int32, (W, _TQ_WIN), 0).astype(
        jnp.float32
    )
    BT = jnp.maximum(0.0, 1.0 - jnp.abs(x[None, :] - wi))  # [W, TQ]
    return o, overflow, AT, AT2, BT


def _fwd_kernel_winx(xs_ref, ys_ref, img_ref, out_ref, cover_ref, *, H, W,
                     C, HP):
    o, overflow, AT, AT2, BT = _win_kernel_common_t(
        xs_ref, ys_ref, H, HP, W
    )
    cover_ref[0, :] = (
        jnp.sum(AT, axis=0) + jnp.sum(AT2, axis=0)
    ) * jnp.sum(BT, axis=0)
    for c in range(C):
        r = jnp.dot(
            img_ref[0, c, pl.ds(o, _WY), :], BT,
            preferred_element_type=jnp.float32, precision=_PREC_FWD,
        )  # [WY, TQ]
        out_ref[0, c, :] = jnp.sum(AT * r, axis=0)

    @pl.when(overflow)
    def _():
        for c in range(C):
            r2 = jnp.dot(
                img_ref[0, c, HP - _WY:, :], BT,
                preferred_element_type=jnp.float32, precision=_PREC_FWD,
            )
            out_ref[0, c, :] += jnp.sum(AT2 * r2, axis=0)


def _forward_winx(img, coords, fill, interpret=False):
    H, W, C = img.shape
    _check_win(H, W, C)
    HP = _pad_rows(H)
    xs, ys, n = _prep_coords(coords, _TQ_WIN)
    n_pad = xs.shape[1]
    imgs = jnp.moveaxis(img.astype(jnp.float32), -1, 0)[None]  # [1, C, H, W]
    if HP != H:
        imgs = jnp.pad(imgs, ((0, 0), (0, 0), (0, HP - H), (0, 0)))
    out, cover = pl.pallas_call(
        functools.partial(_fwd_kernel_winx, H=H, W=W, C=C, HP=HP),
        grid=(n_pad // _TQ_WIN,),
        in_specs=[
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
            pl.BlockSpec((1, C, HP, W), lambda q: (0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, C, _TQ_WIN), lambda q: (0, 0, q)),
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, C, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(xs, ys, imgs)
    val = jnp.moveaxis(out[0, :, :n], 0, -1)  # [n, C]
    val = val + (1.0 - cover[0, :n, None]) * jnp.asarray(fill, jnp.float32)
    return val.reshape(coords.shape[:-1] + (C,)).astype(img.dtype), None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bilinear_sample_pallas_winx(
    img: jnp.ndarray, coords: jnp.ndarray, fill: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """:func:`bilinear_sample_pallas_win` with a transposed forward
    reduction (same math, less VPU lane work); shared windowed backward."""
    out, _ = _forward_winx(img, coords, fill, interpret)
    return out


def _fwd_rule_winx(img, coords, fill, interpret):
    out, _ = _forward_winx(img, coords, fill, interpret)
    return out, (img, coords)


bilinear_sample_pallas_winx.defvjp(_fwd_rule_winx, _bwd_rule_win)


# ---------------------------------------------------------------------------
# winb: winx with the C per-channel dots batched into one MXU call
# ---------------------------------------------------------------------------
#
# Same math as winx; the C (=3) [WY, W] x [W, TQ] contractions per tile
# become one [C*WY, W] x [W, TQ] dot (channel windows concatenated along
# the sublane axis), amortizing the MXU dispatch. The A^T reduce stays
# per-channel on static slices. Expected small (NOTES r4).


def _fwd_kernel_winb(xs_ref, ys_ref, img_ref, out_ref, cover_ref, *, H, W,
                     C, HP):
    o, overflow, AT, AT2, BT = _win_kernel_common_t(
        xs_ref, ys_ref, H, HP, W
    )
    cover_ref[0, :] = (
        jnp.sum(AT, axis=0) + jnp.sum(AT2, axis=0)
    ) * jnp.sum(BT, axis=0)
    win = jnp.concatenate(
        [img_ref[0, c, pl.ds(o, _WY), :] for c in range(C)], axis=0
    )  # [C*WY, W]
    r = jnp.dot(
        win, BT, preferred_element_type=jnp.float32, precision=_PREC_FWD,
    )  # [C*WY, TQ]
    for c in range(C):
        out_ref[0, c, :] = jnp.sum(
            AT * r[c * _WY:(c + 1) * _WY, :], axis=0
        )

    @pl.when(overflow)
    def _():
        win2 = jnp.concatenate(
            [img_ref[0, c, HP - _WY:, :] for c in range(C)], axis=0
        )
        r2 = jnp.dot(
            win2, BT, preferred_element_type=jnp.float32,
            precision=_PREC_FWD,
        )
        for c in range(C):
            out_ref[0, c, :] += jnp.sum(
                AT2 * r2[c * _WY:(c + 1) * _WY, :], axis=0
            )


def _forward_winb(img, coords, fill, interpret=False):
    H, W, C = img.shape
    _check_win(H, W, C)
    HP = _pad_rows(H)
    xs, ys, n = _prep_coords(coords, _TQ_WIN)
    n_pad = xs.shape[1]
    imgs = jnp.moveaxis(img.astype(jnp.float32), -1, 0)[None]
    if HP != H:
        imgs = jnp.pad(imgs, ((0, 0), (0, 0), (0, HP - H), (0, 0)))
    out, cover = pl.pallas_call(
        functools.partial(_fwd_kernel_winb, H=H, W=W, C=C, HP=HP),
        grid=(n_pad // _TQ_WIN,),
        in_specs=[
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
            pl.BlockSpec((1, C, HP, W), lambda q: (0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, C, _TQ_WIN), lambda q: (0, 0, q)),
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, C, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(xs, ys, imgs)
    val = jnp.moveaxis(out[0, :, :n], 0, -1)
    val = val + (1.0 - cover[0, :n, None]) * jnp.asarray(fill, jnp.float32)
    return val.reshape(coords.shape[:-1] + (C,)).astype(img.dtype), None


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bilinear_sample_pallas_winb(
    img: jnp.ndarray, coords: jnp.ndarray, fill: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """:func:`bilinear_sample_pallas_winx` with the per-channel window
    dots batched into one MXU contraction; shared windowed backward."""
    out, _ = _forward_winb(img, coords, fill, interpret)
    return out


def _fwd_rule_winb(img, coords, fill, interpret):
    out, _ = _forward_winb(img, coords, fill, interpret)
    return out, (img, coords)


bilinear_sample_pallas_winb.defvjp(_fwd_rule_winb, _bwd_rule_win)


# ---------------------------------------------------------------------------
# split3: manual bf16x3 dots inside the windowed kernel
# ---------------------------------------------------------------------------
#
# Mosaic lowers only DEFAULT (one bf16 MXU pass) and HIGHEST (six) dot
# precisions; XLA's HIGH on this backend measured a 5.4% warp-grad error
# (warp_variants_r3.jsonl), i.e. it is NOT a 3-pass bf16x3. This variant
# does the classic error-free-ish splitting by hand: x = hi + lo with
# hi = bf16(x), lo = bf16(x - hi), and x@y ~= hi@y_hi + hi@y_lo + lo@y_hi
# (dropping the lo*lo term, ~2^-16 relative) — three single-pass bf16
# dots instead of HIGHEST's six.
#
# MEASURED NEGATIVE RESULT (round 4, do not ship): on-chip only 117.5 ms
# vs the exact windowed kernel's 138.6 (the kernel is VPU/overhead-bound
# by the tap-matrix builds and slab*B reductions, not MXU-pass-bound, so
# halving dot passes buys little), AND the on-device grad parity is
# broken — max|dg| 7.43 on max|g| 30.4 (24%!) despite interpret-mode
# parity at 2e-3 (tests/test_pallas_warp.py) and a ~1e-5 theoretical
# bound. The splits lower correctly in interpret mode but not through
# Mosaic (suspect: bf16 operand packing of in-kernel-built values feeding
# the MXU). Kept as an experiment record; reachable only by explicit
# impl='pallas_win3'.


def _split(x):
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _dot3(a_fp32, b_hi, b_lo):
    """a @ (b_hi + b_lo) via three bf16 MXU passes, fp32 accumulate."""
    a_hi, a_lo = _split(a_fp32)
    f32 = jnp.float32
    return (
        jnp.dot(a_hi, b_hi, preferred_element_type=f32)
        + jnp.dot(a_hi, b_lo, preferred_element_type=f32)
        + jnp.dot(a_lo, b_hi, preferred_element_type=f32)
    )


def _dotg3(a_fp32, b_fp32):
    """dot_general contracting dim 0 of both, via three bf16 passes."""
    a_hi, a_lo = _split(a_fp32)
    b_hi, b_lo = _split(b_fp32)
    dims = (((0,), (0,)), ((), ()))
    f32 = jnp.float32
    return (
        jax.lax.dot_general(a_hi, b_hi, dims, preferred_element_type=f32)
        + jax.lax.dot_general(a_hi, b_lo, dims, preferred_element_type=f32)
        + jax.lax.dot_general(a_lo, b_hi, dims, preferred_element_type=f32)
    )


def _fwd_kernel_win3(xs_ref, ys_ref, ihi_ref, ilo_ref, out_ref, cover_ref,
                     *, H, W, C, HP):
    x, o, overflow, A, A2 = _win_kernel_common(xs_ref, ys_ref, H, HP)
    xi = jax.lax.broadcasted_iota(
        jnp.int32, (_TQ_WIN, W), 1
    ).astype(jnp.float32)
    B = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - xi))  # [TQ, W]
    cover_ref[0, :] = (
        jnp.sum(A, axis=-1) + jnp.sum(A2, axis=-1)
    ) * jnp.sum(B, axis=-1)
    for c in range(C):
        slab = _dot3(
            A,
            ihi_ref[0, c, pl.ds(o, _WY), :],
            ilo_ref[0, c, pl.ds(o, _WY), :],
        )  # [TQ, W]
        out_ref[0, c, :] = jnp.sum(slab * B, axis=-1)

    @pl.when(overflow)
    def _():
        for c in range(C):
            slab2 = _dot3(
                A2, ihi_ref[0, c, HP - _WY:, :], ilo_ref[0, c, HP - _WY:, :]
            )
            out_ref[0, c, :] += jnp.sum(slab2 * B, axis=-1)


def _bwd_kernel_win3(xs_ref, ys_ref, ct_ref, gimg_ref, *, H, W, C, HP):
    q = pl.program_id(0)

    @pl.when(q == 0)
    def _zero():
        gimg_ref[...] = jnp.zeros(gimg_ref.shape, gimg_ref.dtype)

    x, o, overflow, A, A2 = _win_kernel_common(xs_ref, ys_ref, H, HP)
    xi = jax.lax.broadcasted_iota(
        jnp.int32, (_TQ_WIN, W), 1
    ).astype(jnp.float32)
    B = jnp.maximum(0.0, 1.0 - jnp.abs(x[:, None] - xi))
    for c in range(C):
        ct_c = ct_ref[0, c, :]
        gimg_ref[0, c, pl.ds(o, _WY), :] += _dotg3(A * ct_c[:, None], B)

    @pl.when(overflow)
    def _():
        for c in range(C):
            ct_c = ct_ref[0, c, :]
            gimg_ref[0, c, HP - _WY:, :] += _dotg3(A2 * ct_c[:, None], B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def bilinear_sample_pallas_win3(
    img: jnp.ndarray, coords: jnp.ndarray, fill: float = 0.0,
    interpret: bool = False,
) -> jnp.ndarray:
    """:func:`bilinear_sample_pallas_win` with manual bf16x3 dots.

    MEASURED BROKEN ON REAL TPU — interpret-mode-only parity. The bf16x3
    splitting has a ~1e-5 theoretical bound and matches in interpret mode
    (2e-3), but through Mosaic the on-device gradient error is 24%
    (max|dg| 7.43 on max|g| 30.4; see the negative-result block above).
    Kept as an experiment record; selecting it on a TPU backend warns.
    """
    if not interpret:
        import warnings

        warnings.warn(
            "bilinear_sample_pallas_win3 has a measured 24% on-device "
            "gradient error through Mosaic (interpret-mode parity only); "
            "use pallas_winx instead.",
            stacklevel=2,
        )
    out, _ = _forward_win3(img, coords, fill, interpret)
    return out


def _forward_win3(img, coords, fill, interpret=False):
    H, W, C = img.shape
    _check_win(H, W, C)
    HP = _pad_rows(H)
    xs, ys, n = _prep_coords(coords, _TQ_WIN)
    n_pad = xs.shape[1]
    imgs = jnp.moveaxis(img.astype(jnp.float32), -1, 0)[None]  # [1, C, H, W]
    if HP != H:
        imgs = jnp.pad(imgs, ((0, 0), (0, 0), (0, HP - H), (0, 0)))
    ihi = imgs.astype(jnp.bfloat16)
    ilo = (imgs - ihi.astype(jnp.float32)).astype(jnp.bfloat16)
    out, cover = pl.pallas_call(
        functools.partial(_fwd_kernel_win3, H=H, W=W, C=C, HP=HP),
        grid=(n_pad // _TQ_WIN,),
        in_specs=[
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
            pl.BlockSpec((1, C, HP, W), lambda q: (0, 0, 0, 0)),
            pl.BlockSpec((1, C, HP, W), lambda q: (0, 0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, C, _TQ_WIN), lambda q: (0, 0, q)),
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, C, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
        ],
        interpret=interpret,
    )(xs, ys, ihi, ilo)
    val = jnp.moveaxis(out[0, :, :n], 0, -1)  # [n, C]
    val = val + (1.0 - cover[0, :n, None]) * jnp.asarray(fill, jnp.float32)
    return val.reshape(coords.shape[:-1] + (C,)).astype(img.dtype), None


def _fwd_rule_win3(img, coords, fill, interpret):
    out, _ = _forward_win3(img, coords, fill, interpret)
    return out, (img, coords)


def _bwd_rule_win3(fill, interpret, res, ct):
    img, coords = res
    H, W, C = img.shape
    _check_win(H, W, C)
    HP = _pad_rows(H)
    xs, ys, n = _prep_coords(coords, _TQ_WIN)
    n_pad = xs.shape[1]
    ct_flat = jnp.moveaxis(ct.reshape(-1, C), -1, 0)  # [C, n]
    if n_pad != n:
        ct_flat = jnp.pad(ct_flat, ((0, 0), (0, n_pad - n)))
    ct_flat = ct_flat[None].astype(jnp.float32)  # [1, C, n_pad]
    gimg = pl.pallas_call(
        functools.partial(_bwd_kernel_win3, H=H, W=W, C=C, HP=HP),
        grid=(n_pad // _TQ_WIN,),
        in_specs=[
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
            pl.BlockSpec((1, _TQ_WIN), lambda q: (0, q)),
            pl.BlockSpec((1, C, _TQ_WIN), lambda q: (0, 0, q)),
        ],
        out_specs=pl.BlockSpec((1, C, HP, W), lambda q: (0, 0, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((1, C, HP, W), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)
        ),
        interpret=interpret,
    )(xs, ys, ct_flat)
    ct_img = jnp.moveaxis(gimg[0, :, :H], 0, -1).astype(img.dtype)
    return ct_img, jnp.zeros_like(coords)


bilinear_sample_pallas_win3.defvjp(_fwd_rule_win3, _bwd_rule_win3)
