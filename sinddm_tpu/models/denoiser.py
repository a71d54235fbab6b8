"""The SinDDM denoiser, re-designed for TPU (flax.linen, NHWC).

Behavioral contract from the reference (``SinDDM/models.py:34-151``):

* fully convolutional — no downsampling, so it runs at any H×W;
  channels 3 -> dim/2 -> dim -> dim -> dim/2 -> 3 with dim=160 default,
* each block: depthwise 5×5 conv, add a per-block projection of the
  conditioning vector, then 3×3 conv -> GELU -> 3×3 conv, plus a 1×1
  residual (``models.py:51-80``),
* conditioning: 32-d sinusoidal embeddings of timestep t and scale s,
  concatenated and passed through Linear(64->128) -> GELU -> Linear(128->32)
  (``models.py:103-110, 136-141``).

TPU-first choices:
* NHWC layout throughout (the native TPU conv layout),
* optional ``compute_dtype=bfloat16`` casting of activations for MXU-rate
  convolutions while keeping float32 parameters,
* an optional ``valid mask`` input enabling *uniform padded shapes*: all
  pyramid scales can be padded to one (H_max, W_max) canvas and trained in
  a single compiled step (the whole train loop then runs as one
  ``lax.scan`` on device). Re-zeroing the padding region before every
  convolution makes padded compute **bit-equivalent** to running 'same'
  zero-padded convs on the unpadded image (the conv at a valid-region edge
  sees exactly the zeros it would have seen from 'same' padding).
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

TIME_DIM = 32  # reference models.py:101


def sinusoidal_pos_emb(x: jnp.ndarray, dim: int) -> jnp.ndarray:
    """Sinusoidal embedding of a [B] vector -> [B, dim].

    Matches reference ``SinusoidalPosEmb`` (``models.py:34-46``):
    freqs = exp(-log(10000) * arange(dim/2) / (dim/2 - 1)), cat(sin, cos).
    """
    half_dim = dim // 2
    emb = math.log(10000.0) / (half_dim - 1)
    freqs = jnp.exp(jnp.arange(half_dim, dtype=jnp.float32) * -emb)
    args = x.astype(jnp.float32)[:, None] * freqs[None, :]
    return jnp.concatenate([jnp.sin(args), jnp.cos(args)], axis=-1)


class ConvBlock(nn.Module):
    """One SinDDM conv block (reference ``SinDDMConvBlock``, models.py:51-80).

    h = ds_conv5x5(x) + Dense(GELU(cond))        # cond broadcast over H, W
    h = conv3x3 -> GELU -> conv3x3 (h)
    out = h + res_conv1x1(x)                      # identity if dims match
    """

    dim_out: int
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        cond: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        dim = x.shape[-1]
        dt = self.compute_dtype
        if mask is not None:
            x = x * mask
        h = nn.Conv(
            dim, (5, 5), padding="SAME", feature_group_count=dim,
            dtype=dt, name="ds_conv",
        )(x)
        # reference mlp: GELU -> Linear(time_dim, time_dim), then a 1x1 conv
        # (time_dim -> dim) — two chained linear maps of the cond vector.
        c = nn.Dense(cond.shape[-1], dtype=dt, name="cond_mlp")(
            nn.gelu(cond, approximate=False)
        )
        c = nn.Dense(dim, dtype=dt, name="cond_proj")(c)
        h = h + c[:, None, None, :]
        if mask is not None:
            h = h * mask
        h = nn.Conv(self.dim_out, (3, 3), padding="SAME", dtype=dt, name="net_conv1")(h)
        h = nn.gelu(h, approximate=False)
        if mask is not None:
            h = h * mask
        h = nn.Conv(self.dim_out, (3, 3), padding="SAME", dtype=dt, name="net_conv2")(h)
        if dim != self.dim_out:
            res = nn.Conv(self.dim_out, (1, 1), dtype=dt, name="res_conv")(x)
        else:
            res = x
        return h + res


class SinDDMNet(nn.Module):
    """(t, s)-conditioned fully-convolutional denoiser.

    forward: (x [B,H,W,C], t [B] int/float, s scalar) -> eps_pred [B,H,W,C].
    Reference: ``SinDDMNet`` (``models.py:85-151``).
    """

    dim: int = 160
    out_dim: Optional[int] = None
    channels: int = 3
    compute_dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        time: jnp.ndarray,
        scale: jnp.ndarray,
        mask: Optional[jnp.ndarray] = None,
    ) -> jnp.ndarray:
        in_dtype = x.dtype
        dt = self.compute_dtype
        x = x.astype(dt)
        if mask is not None:
            mask = mask.astype(dt)
            if mask.ndim == 3:
                mask = mask[..., None]

        t_emb = sinusoidal_pos_emb(jnp.asarray(time), TIME_DIM)
        s_vec = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), t_emb.shape[:1])
        s_emb = sinusoidal_pos_emb(s_vec, TIME_DIM)
        ts = jnp.concatenate([t_emb, s_emb], axis=-1).astype(dt)
        cond = nn.Dense(TIME_DIM * 4, dtype=dt, name="time_mlp1")(ts)
        cond = nn.gelu(cond, approximate=False)
        cond = nn.Dense(TIME_DIM, dtype=dt, name="time_mlp2")(cond)

        half_dim = int(self.dim / 2)
        x = ConvBlock(half_dim, dt, name="l1")(x, cond, mask)
        x = ConvBlock(self.dim, dt, name="l2")(x, cond, mask)
        x = ConvBlock(self.dim, dt, name="l3")(x, cond, mask)
        x = ConvBlock(half_dim, dt, name="l4")(x, cond, mask)
        if mask is not None:
            x = x * mask
        out_dim = self.out_dim if self.out_dim is not None else self.channels
        x = nn.Conv(out_dim, (1, 1), dtype=dt, name="final_conv")(x)
        if mask is not None:
            x = x * mask
        return x.astype(in_dtype)


def _dense(p, x):
    return x @ p["kernel"] + p["bias"]


def compute_cond_vec(params, time, scale) -> jnp.ndarray:
    """The (t, s) conditioning MLP as pure jnp over the flax param tree."""
    t_emb = sinusoidal_pos_emb(jnp.asarray(time), TIME_DIM)
    s_vec = jnp.broadcast_to(jnp.asarray(scale, jnp.float32), t_emb.shape[:1])
    s_emb = sinusoidal_pos_emb(s_vec, TIME_DIM)
    ts = jnp.concatenate([t_emb, s_emb], axis=-1)
    cond = _dense(params["time_mlp1"], ts)
    cond = jax.nn.gelu(cond, approximate=False)
    return _dense(params["time_mlp2"], cond)


def apply_denoiser_pallas(
    params, x: jnp.ndarray, time, scale, *, interpret: bool = False
) -> jnp.ndarray:
    """EXPERIMENTAL Pallas executor of :class:`SinDDMNet` (same param tree).

    Each conv block runs as ONE fused kernel (depthwise 5x5 + cond add +
    conv3x3 + GELU + conv3x3 + residual — single HBM read/write, MXU
    matmuls from VMEM; see ``ops/pallas_conv.py``). Verified equivalent to
    ``SinDDMNet.apply`` under the Pallas interpreter (tested); on current
    Mosaic the lowering of sub-lane slices diverges numerically and runs
    slower than XLA's conv emitter (which measures at ~77% of fp32 MXU
    peak here), so this path is OFF by default — use for kernel R&D only.
    """
    from sinddm_tpu.ops.pallas_conv import conv_block_reference, fused_conv_block

    cond = compute_cond_vec(params, time, scale).astype(x.dtype)
    for name in ("l1", "l2", "l3", "l4"):
        bp = params[name]
        cond_b = _dense(bp["cond_mlp"], jax.nn.gelu(cond, approximate=False))
        cond_b = _dense(bp["cond_proj"], cond_b)
        wres = bp.get("res_conv")
        args = (
            x,
            cond_b,
            bp["ds_conv"]["kernel"][:, :, 0, :],
            bp["ds_conv"]["bias"],
            bp["net_conv1"]["kernel"],
            bp["net_conv1"]["bias"],
            bp["net_conv2"]["kernel"],
            bp["net_conv2"]["bias"],
            None if wres is None else wres["kernel"][0, 0],
            None if wres is None else wres["bias"],
        )
        if x.shape[-1] % 8 == 0:
            x = fused_conv_block(*args, interpret=interpret)
        else:
            # Mosaic can't DMA-slice HBM refs with tiny unaligned lane dims
            # (l1's 3-channel input); the cheapest block runs through XLA
            x = conv_block_reference(*args)
    fc = params["final_conv"]
    return x @ fc["kernel"][0, 0] + fc["bias"]
