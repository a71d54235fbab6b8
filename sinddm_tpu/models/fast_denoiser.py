"""Fast sampling executor: the denoiser's convs as explicit MXU matmuls.

Motivation (round-1 profiling, RESULTS.md): XLA lowers fp32 convs to
bf16x3 — three MXU passes emulating fp32 to ~1e-2 — and its *single-pass*
bf16 conv emitter underperforms (6.5 ms vs a 2.7 ms roofline for the
3x3 160->160 conv at [16,186,248]). XLA's **dot** emitter, by contrast,
is excellent. This module recasts every conv in ``SinDDMNet`` as shifted
``dot_general`` calls (one matmul per kernel tap, fp32 accumulation via
``preferred_element_type``), which XLA fuses and schedules near MXU peak
in true single-pass bf16.

Pure function over the same flax param tree as ``SinDDMNet.apply``
(reference net: ``SinDDM/models.py:85-151``):

* fp32 mode reproduces ``model.apply`` to reduction-order tolerance,
* bf16 mode is the fast path for sampling (weights/activations bf16,
  fp32 accumulators) — one MXU pass instead of three per matmul.

Used by the sampling apps when ``fast_mode`` is set; gated by equality
tests (``tests/test_fast_denoiser.py``).

Round-2 measurement (real v5e, exclusive chip,
``benchmarks/tpu_conv_experiments.py --section fast``): the hypothesis
FAILED on device — the fp32 dot forward measured 317 ms vs flax/XLA's
39.8 ms at [16,186,248] dim=160. XLA materializes each shifted slice
before the matmul (pad+slice+reshape of a 472 MB activation, 9x per
conv), so the formulation is HBM-bound; its gradient OOMs outright. XLA's
conv emitter (fp32 via bf16x3 at ~60% MXU peak) is the fastest known
executor for this net; this module stays as a library-level experiment
record and a CPU-friendly alternative, deliberately without a CLI flag.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from sinddm_tpu.models.denoiser import compute_cond_vec


def _dot(x2d, w2d):
    return jax.lax.dot_general(
        x2d, w2d, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def conv2d_dot(x: jnp.ndarray, w: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """'SAME' KxK conv as K*K shifted matmuls. x [B,H,W,Cin], w [K,K,Cin,Cout].

    Returns fp32 accumulation cast back to x.dtype.
    """
    bsz, h, wd, cin = x.shape
    kh, kw, _, cout = w.shape
    ph, pw = kh // 2, kw // 2
    xp = jnp.pad(x, ((0, 0), (ph, ph), (pw, pw), (0, 0)))
    acc = None
    for di in range(kh):
        for dj in range(kw):
            xs = xp[:, di : di + h, dj : dj + wd, :].reshape(-1, cin)
            y = _dot(xs, w[di, dj])
            acc = y if acc is None else acc + y
    out = acc + b.astype(jnp.float32)
    return out.reshape(bsz, h, wd, cout).astype(x.dtype)


def depthwise5x5_shifted(
    x: jnp.ndarray, wdw: jnp.ndarray, b: jnp.ndarray
) -> jnp.ndarray:
    """'SAME' depthwise 5x5 as 25 shifted elementwise FMAs (VPU-friendly;
    avoids XLA's grouped-conv emitter). x [B,H,W,C], wdw [5,5,C]."""
    bsz, h, wd, c = x.shape
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2), (0, 0)))
    acc = jnp.zeros((bsz, h, wd, c), jnp.float32)
    for di in range(5):
        for dj in range(5):
            acc = acc + (
                xp[:, di : di + h, dj : dj + wd, :].astype(jnp.float32)
                * wdw[di, dj].astype(jnp.float32)
            )
    return (acc + b.astype(jnp.float32)).astype(x.dtype)


def _dense(p, x, dt):
    y = _dot(x.astype(dt), p["kernel"].astype(dt)) + p["bias"].astype(
        jnp.float32
    )
    return y.astype(dt)


def apply_denoiser_dot(
    params,
    x: jnp.ndarray,
    time,
    scale,
    *,
    compute_dtype=jnp.bfloat16,
) -> jnp.ndarray:
    """SinDDMNet forward with dot-formulated convs (same param tree)."""
    dt = compute_dtype
    in_dtype = x.dtype
    x = x.astype(dt)
    cond = compute_cond_vec(params, time, scale).astype(dt)

    for name in ("l1", "l2", "l3", "l4"):
        bp = params[name]
        h = depthwise5x5_shifted(
            x, bp["ds_conv"]["kernel"][:, :, 0, :].astype(dt),
            bp["ds_conv"]["bias"],
        )
        c = _dense(bp["cond_mlp"], jax.nn.gelu(cond, approximate=False), dt)
        c = _dense(bp["cond_proj"], c, dt)
        h = h + c[:, None, None, :]
        h = conv2d_dot(h, bp["net_conv1"]["kernel"].astype(dt),
                       bp["net_conv1"]["bias"])
        h = jax.nn.gelu(h, approximate=False)
        h = conv2d_dot(h, bp["net_conv2"]["kernel"].astype(dt),
                       bp["net_conv2"]["bias"])
        if "res_conv" in bp:
            res = conv2d_dot(x, bp["res_conv"]["kernel"].astype(dt),
                             bp["res_conv"]["bias"])
        else:
            res = x
        x = h + res

    fc = params["final_conv"]
    out = conv2d_dot(x, fc["kernel"].astype(dt), fc["bias"])
    return out.astype(in_dtype)
