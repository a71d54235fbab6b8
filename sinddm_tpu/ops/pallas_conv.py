"""Pallas TPU kernel: the fused SinDDM conv block.

One block of the denoiser (reference ``SinDDMConvBlock``,
``SinDDM/models.py:51-80``) is

    h   = dw_conv5x5(x) + bias_dw + cond               # cond: per-batch [C]
    h   = conv3x3(h, W1) + b1
    h   = gelu(h)
    h   = conv3x3(h, W2) + b2
    out = h + (x @ Wres + bres | x)                    # 1x1 residual

XLA executes this as ~5 separate convolutions, each re-reading the huge
activation from HBM (at 16x186x248x160 the fp32 activation is 472 MB;
measured: each 3x3 conv ~8 ms at only ~42 TFLOP/s, the depthwise ~7 ms —
the chain is im2col/HBM-bound, not MXU-bound).

This kernel computes the whole block with ONE activation read and ONE
write: the grid tiles (batch, H); each instance DMAs an (Th+8)-row slice
of the zero-padded input into VMEM, runs the depthwise conv as 25 shifted
VPU MACs, both 3x3 convolutions as 9 shifted [rows*cols, C] @ [C, Co] MXU
matmuls from VMEM, fuses bias/cond/GELU/residual, and writes the final
Th-row output tile.

The public entry :func:`fused_conv_block` handles padding/slicing and has
a pure-XLA twin :func:`conv_block_reference` used for equality tests; the
denoiser can switch between them (``SinDDMNet(use_pallas=True)``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HALO = 4  # 2 (dw 5x5) + 1 (conv1 3x3) + 1 (conv2 3x3)


def _erf(x):
    """erf via Abramowitz-Stegun 7.1.26 (max abs err 1.5e-7, fp32-exact).

    Mosaic implements neither ``erf`` nor ``erfc``, so the kernel carries
    its own rational approximation (exp is supported).
    """
    sign = jnp.sign(x)
    ax = jnp.abs(x)
    t = 1.0 / (1.0 + 0.3275911 * ax)
    poly = t * (
        0.254829592
        + t * (-0.284496736 + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429)))
    )
    return sign * (1.0 - poly * jnp.exp(-ax * ax))


def _gelu(x):
    # exact GELU (erf form), matching jax.nn.gelu(approximate=False)
    return 0.5 * x * (1.0 + _erf(x * (2.0 ** -0.5)))


def _conv_block_kernel(
    x_hbm,  # [B, Hp+2*HALO, W+2*HALO, C_pad] full padded input (ANY/HBM;
    #        Mosaic DMA requires a 128-multiple lane dim, so C is padded —
    #        the kernel value-slices back to the true C after the copy)
    cond_ref,  # [B, C] per-batch conditioning (VMEM, whole array)
    wdw_ref,  # [5*5, C]
    bdw_ref,  # [1, C]
    w1_ref,  # [3*3, C, Co]
    b1_ref,  # [1, Co]
    w2_ref,  # [3*3, Co, Co]
    b2_ref,  # [1, Co]
    wres_ref,  # [C, Co] (or [1, 1] dummy when identity)
    bres_ref,  # [1, Co]
    out_ref,  # [1, Th, W, Co]
    xt_ref,  # scratch VMEM [Th+8, W+2*HALO, C_pad]
    h1_ref,  # scratch VMEM [Th+4, W+4, C] f32 (dw output)
    g_ref,  # scratch VMEM [(Th+2)*(W+2), Co] f32 (conv1+gelu output)
    o_ref,  # scratch VMEM [Th*W, Co] f32 (conv2 accumulator)
    sem,  # DMA semaphore
    *,
    th: int,
    w: int,
    c: int,
    co: int,
    h_true: int,
    identity_res: bool,
):
    bi = pl.program_id(0)  # batch index (ANY-space refs aren't blocked)
    i = pl.program_id(1)  # H-tile index

    # DMA the (Th + 2*HALO)-row padded slice for this tile into VMEM.
    cp = pltpu.make_async_copy(
        x_hbm.at[bi, pl.ds(i * th, th + 2 * HALO)], xt_ref, sem
    )
    cp.start()
    cp.wait()

    dtype = xt_ref.dtype
    cond = cond_ref[bi, :]  # [C]

    # depthwise 5x5 over the region needed by both 3x3 convs:
    # output rows [Th+4], cols [W+4]. Accumulate into the f32 scratch ref
    # (value-land SSA accumulation blows the compiler's VMEM liveness).
    hr, wc = th + 4, w + 4
    h1_ref[:, :, :] = jnp.zeros((hr, wc, c), jnp.float32)
    for di in range(5):
        for dj in range(5):
            h1_ref[:, :, :] += (
                xt_ref[di : di + hr, dj : dj + wc, :c].astype(jnp.float32)
                * wdw_ref[di * 5 + dj, :].astype(jnp.float32)
            )
    # zero outside the true image: the reference's 'SAME' conv1 sees zero
    # padding there, not bias+cond (same invariant as the denoiser's
    # padded-mask mode)
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (hr, wc), 0) + i * th - 2
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (hr, wc), 1) - 2
    valid1 = (
        (row_ids >= 0) & (row_ids < h_true) & (col_ids >= 0) & (col_ids < w)
    ).astype(jnp.float32)  # f32 before the minor-dim insert (Mosaic: no i1 reshape)
    h1_ref[:, :, :] = (
        h1_ref[:, :, :]
        + bdw_ref[0, :].astype(jnp.float32)
        + cond.astype(jnp.float32)
    ) * valid1[:, :, None]

    # conv1 3x3: rows [Th+2], cols [W+2], as 9 shifted matmuls on the MXU
    hr2, wc2 = th + 2, w + 2
    g_ref[:, :] = jnp.zeros((hr2 * wc2, co), jnp.float32)
    for di in range(3):
        for dj in range(3):
            patch = h1_ref[di : di + hr2, dj : dj + wc2, :].reshape(
                hr2 * wc2, c
            ).astype(dtype)
            g_ref[:, :] += jnp.dot(
                patch, w1_ref[di * 3 + dj], preferred_element_type=jnp.float32
            )
    # zero outside the true image before conv2 (gelu(b1) != 0 in padding)
    row_ids2 = jax.lax.broadcasted_iota(jnp.int32, (hr2 * wc2, 1), 0)
    col_ids2 = row_ids2 % wc2 - 1
    row_ids2 = row_ids2 // wc2 + i * th - 1
    valid2 = (
        (row_ids2 >= 0) & (row_ids2 < h_true) & (col_ids2 >= 0) & (col_ids2 < w)
    ).astype(jnp.float32)
    g_ref[:, :] = (
        _gelu(g_ref[:, :] + b1_ref[0, :].astype(jnp.float32)) * valid2
    )

    # conv2 3x3: rows [Th], cols [W]; accumulate straight into a f32 scratch
    o_ref[:, :] = jnp.broadcast_to(
        b2_ref[0, :].astype(jnp.float32), (th * w, co)
    )
    g3 = g_ref.reshape(hr2, wc2, co)
    for di in range(3):
        for dj in range(3):
            patch = g3[di : di + th, dj : dj + w, :].reshape(th * w, co).astype(dtype)
            o_ref[:, :] += jnp.dot(
                patch, w2_ref[di * 3 + dj], preferred_element_type=jnp.float32
            )

    # residual from the tile's center region
    x_center = xt_ref[HALO : HALO + th, HALO : HALO + w, :c]
    if identity_res:
        o_ref[:, :] += x_center.reshape(th * w, c).astype(jnp.float32)
    else:
        o_ref[:, :] += (
            jnp.dot(
                x_center.reshape(th * w, c).astype(dtype),
                wres_ref[:, :],
                preferred_element_type=jnp.float32,
            )
            + bres_ref[0, :].astype(jnp.float32)
        )
    out_ref[0, :, :, :] = o_ref[:, :].reshape(th, w, co).astype(dtype)


def _pick_tile(h: int, w: int, c: int, co: int, itemsize: int) -> int:
    """Largest Th (multiple of 8) keeping VMEM under ~12 MB."""
    budget = 6 * 1024 * 1024
    c_dma = -(-c // 128) * 128  # DMA staging uses the lane-padded width
    for th in (32, 24, 16, 8):
        xt = (th + 8) * (w + 8) * c_dma * itemsize
        h1 = (th + 4) * (w + 4) * c * 4
        g = (th + 2) * (w + 2) * co * 4
        o = th * w * co * 4
        weights = (25 * c + 9 * c * co + 9 * co * co + c * co) * itemsize
        if xt + h1 + g + o + weights < budget:
            return th
    return 8


def fused_conv_block(
    x: jnp.ndarray,  # [B, H, W, C]
    cond: jnp.ndarray,  # [B, C] (already projected per block)
    wdw: jnp.ndarray,  # [5, 5, C] depthwise weights
    bdw: jnp.ndarray,  # [C]
    w1: jnp.ndarray,  # [3, 3, C, Co]
    b1: jnp.ndarray,  # [Co]
    w2: jnp.ndarray,  # [3, 3, Co, Co]
    b2: jnp.ndarray,  # [Co]
    wres: Optional[jnp.ndarray],  # [C, Co] or None for identity
    bres: Optional[jnp.ndarray],
    *,
    interpret: bool = False,
) -> jnp.ndarray:
    """Run one fused SinDDM conv block; returns [B, H, W, Co]."""
    b, h, w, c = x.shape
    co = w1.shape[-1]
    identity_res = wres is None
    th = _pick_tile(h, w, c, co, x.dtype.itemsize)
    hp = -(-h // th) * th  # H padded to a tile multiple
    # pad C to a 128-lane multiple: Mosaic DMA requires it (the zero
    # channels are dropped right after the copy)
    c_pad = -(-c // 128) * 128

    xp = jnp.pad(
        x, ((0, 0), (HALO, HALO + hp - h), (HALO, HALO), (0, c_pad - c))
    )

    wdw_f = wdw.reshape(25, c)
    w1_f = w1.reshape(9, c, co)
    w2_f = w2.reshape(9, co, co)
    wres_in = (
        jnp.zeros((1, 1), x.dtype) if identity_res else wres
    )
    bres_in = jnp.zeros((1, co), x.dtype) if bres is None else bres.reshape(1, co)

    kernel = functools.partial(
        _conv_block_kernel,
        th=th, w=w, c=c, co=co, h_true=h, identity_res=identity_res,
    )
    grid = (b, hp // th)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # whole array; see kernel
            pl.BlockSpec(memory_space=pltpu.VMEM),  # cond [B, C], whole
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wdw
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bdw
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b1
            pl.BlockSpec(memory_space=pltpu.VMEM),  # w2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # b2
            pl.BlockSpec(memory_space=pltpu.VMEM),  # wres
            pl.BlockSpec(memory_space=pltpu.VMEM),  # bres
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, co), lambda bi, i: (bi, i, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, co), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        scratch_shapes=[
            pltpu.VMEM((th + 2 * HALO, w + 2 * HALO, c_pad), x.dtype),
            pltpu.VMEM((th + 4, w + 4, c), jnp.float32),
            pltpu.VMEM(((th + 2) * (w + 2), co), jnp.float32),
            pltpu.VMEM((th * w, co), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        xp,
        cond.astype(x.dtype),
        wdw_f.astype(x.dtype),
        bdw.reshape(1, c).astype(x.dtype),
        w1_f.astype(x.dtype),
        b1.reshape(1, co).astype(x.dtype),
        w2_f.astype(x.dtype),
        b2.reshape(1, co).astype(x.dtype),
        wres_in.astype(x.dtype),
        bres_in.astype(x.dtype),
    )
    return out[:, :h]


def conv_block_reference(
    x, cond, wdw, bdw, w1, b1, w2, b2, wres, bres
) -> jnp.ndarray:
    """Pure-XLA twin of :func:`fused_conv_block` (for tests / fallback)."""
    c = x.shape[-1]
    dn = ("NHWC", "HWIO", "NHWC")
    h = jax.lax.conv_general_dilated(
        x, wdw[:, :, None, :], (1, 1), "SAME",
        dimension_numbers=dn, feature_group_count=c,
    ) + bdw
    h = h + cond[:, None, None, :]
    h = jax.lax.conv_general_dilated(h, w1, (1, 1), "SAME", dimension_numbers=dn) + b1
    h = _gelu(h)
    h = jax.lax.conv_general_dilated(h, w2, (1, 1), "SAME", dimension_numbers=dn) + b2
    if wres is None:
        res = x
    else:
        res = (
            jax.lax.conv_general_dilated(
                x, wres[None, None], (1, 1), "SAME", dimension_numbers=dn
            )
            + bres
        )
    return h + res
