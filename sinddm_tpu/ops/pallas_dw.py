"""Pallas depthwise-5x5 conv kernel — device-verified, higher precision
than XLA's conv.

Round-1 probe result (real v5e): this kernel computes the depthwise
convolution with 1.8e-6 max error against a float64 oracle, where XLA's
own `conv_general_dilated` shows 1.3e-2 — XLA lowers fp32 convs to bf16x3
MXU passes (`xla_allow_excess_precision`), while this kernel accumulates
in true fp32 on the VPU.

Mosaic alignment discipline (the hard-won part): manual DMA slice sizes
must be 8-aligned in the sublane (W) dim and 128-aligned in the lane (C)
dim, and the kernel must never read partial lanes — C is zero-padded to a
128 multiple end-to-end and sliced off on the host.

Round-2: the input DMA is double-buffered across grid steps (TPU grids run
sequentially, so scratch persists between steps — the standard Pallas
pipelining pattern): step k waits on the tile it prefetched at step k-1
and immediately starts the DMA for step k+1.

Round-2 measurement (real v5e, exclusive chip,
``benchmarks/tpu_conv_experiments.py --section dw``): double-buffering did
NOT close the gap — 7.4 ms vs XLA 5.4 ms at [4,186,248,160] and 21 ms vs
8.6 ms at B=16. The kernel is VPU-compute-bound, not DMA-bound: the 25
shifted sublane reads each force a vector relayout, and the 160->256 lane
padding wastes 37% of every ALU op. **This kernel's win is precision**
(true-fp32 accumulation: 1.8e-6 vs XLA's 1.3e-2 against a float64
oracle), not speed; it ships as a library-level precision option and
deliberately has no CLI flag.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dw_kernel(x_hbm, w_ref, b_ref, out_ref, xt_ref, sem, *, th, w, cpad, nh):
    step = pl.program_id(0)
    n_steps = pl.num_programs(0)

    def dma(k, slot):
        bi = k // nh
        i = k % nh
        return pltpu.make_async_copy(
            x_hbm.at[bi, pl.ds(i * th, th + 4)], xt_ref.at[slot], sem.at[slot]
        )

    slot = jax.lax.rem(step, 2)
    nxt = jax.lax.rem(step + 1, 2)

    @pl.when(step == 0)
    def _():
        dma(step, slot).start()

    @pl.when(step + 1 < n_steps)
    def _():
        dma(step + 1, nxt).start()

    dma(step, slot).wait()
    acc = jnp.zeros((th, w, cpad), jnp.float32)
    for di in range(5):
        for dj in range(5):
            acc += (
                xt_ref[slot, di : di + th, dj : dj + w, :].astype(jnp.float32)
                * w_ref[di * 5 + dj, :].astype(jnp.float32)
            )
    out_ref[0] = (acc + b_ref[0, :].astype(jnp.float32)).astype(x_hbm.dtype)


def depthwise_conv5x5(
    x: jnp.ndarray,  # [B, H, W, C]
    wdw: jnp.ndarray,  # [5, 5, C]
    bias: jnp.ndarray,  # [C]
    *,
    tile_h: int = 16,
    interpret: bool = False,
) -> jnp.ndarray:
    """'SAME' depthwise 5x5 conv + bias, true-fp32 accumulation."""
    b, h, w, c = x.shape
    cpad = -(-c // 128) * 128
    th = tile_h
    hp = -(-h // th) * th
    # Mosaic DMA: sublane (W) slice sizes must be 8-aligned
    wpad = -(-(w + 4) // 8) * 8 - 4 - w
    xp = jnp.pad(x, ((0, 0), (2, 2 + hp - h), (2, 2 + wpad), (0, cpad - c)))
    wf = jnp.pad(wdw.reshape(25, c), ((0, 0), (0, cpad - c)))
    bf = jnp.pad(bias.reshape(1, c), ((0, 0), (0, cpad - c)))
    nh = hp // th
    out = pl.pallas_call(
        functools.partial(_dw_kernel, th=th, w=w, cpad=cpad, nh=nh),
        grid=(b * nh,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, th, w, cpad), lambda k: (k // nh, k % nh, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, cpad), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, th + 4, w + 4 + wpad, cpad), x.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary",),
        ),
        interpret=interpret,
    )(xp, wf, bf)
    return out[:, :h, :, :c]
