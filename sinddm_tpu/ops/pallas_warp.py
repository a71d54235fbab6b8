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

Opt-in via ``ClipExtractor(warp_impl='pallas')`` or
``SINDDM_WARP_IMPL=pallas``; default stays the XLA matmul path until the
kernel has on-device parity + perf evidence (the standing rule from the
round-2 Pallas experiments: no alternative executor ships as default
without beating XLA on the chip).
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


def _prep_coords(coords: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, int]:
    """Flatten [..., 2] coords to padded xs/ys [1, N_pad] (pad = -2, a
    coordinate with zero tap weight everywhere and zero coverage)."""
    x = coords[..., 0].reshape(-1)
    y = coords[..., 1].reshape(-1)
    n = x.shape[0]
    n_pad = _pad_n(n)
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
