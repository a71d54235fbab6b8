"""Closed-form FLOP accounting for MFU reporting (bench.py).

Counts algebraic multiply-add FLOPs (2 per MAC) of the hot computations so
the benchmark can report utilization (model FLOPs/s and %-of-peak) next to
seconds — perf regressions become attributable and "fast" becomes a
hardware statement, not a relative one. Elementwise/softmax/layer-norm
work is deliberately excluded (MFU convention), as are the per-batch cond
MLPs (O(dim^2) per IMAGE, ~1e-5 of the conv work).

Peaks for the bench chip (TPU v5e / v5 lite, one chip): 197 TFLOP/s bf16
on the MXU; fp32 convs/matmuls lower to 3-pass bf16x3 on this generation,
so the fp32-effective MXU ceiling is ~197/3 = 65.7 TFLOP/s.
"""

from __future__ import annotations

from typing import Sequence, Tuple

V5E_BF16_PEAK = 197e12
V5E_FP32_EFF_PEAK = V5E_BF16_PEAK / 3.0  # bf16x3 conv/matmul passes


def denoiser_flops_per_pixel(dim: int, channels: int = 3) -> float:
    """Forward FLOPs per output pixel of SinDDMNet (models/denoiser.py).

    Four ConvBlocks (C->D/2->D->D->D/2) + the final 1x1; each block is a
    5x5 depthwise + two 3x3 convs + (when dims differ) a 1x1 residual.
    """
    half = dim // 2

    def block(c_in: int, c_out: int) -> float:
        f = 2 * 25 * c_in  # 5x5 depthwise
        f += 2 * 9 * c_in * c_out  # net_conv1
        f += 2 * 9 * c_out * c_out  # net_conv2
        if c_in != c_out:
            f += 2 * c_in * c_out  # res_conv 1x1
        return f

    total = (
        block(channels, half)
        + block(half, dim)
        + block(dim, dim)
        + block(dim, half)
        + 2 * half * channels  # final 1x1
    )
    return float(total)


def sample_pyramid_flops(
    sizes_hw: Sequence[Tuple[int, int]],
    t_list: Sequence[int],
    batch: int,
    dim: int,
    timesteps: int = 100,
) -> float:
    """Total forward FLOPs of one full-pyramid sample.

    Scale 0 runs the full ``timesteps`` reverse chain; via scale s runs
    ``t_list[s-1]`` steps, one denoiser forward per step.
    """
    per_px = denoiser_flops_per_pixel(dim)
    total = timesteps * batch * sizes_hw[0][0] * sizes_hw[0][1] * per_px
    for s in range(1, len(sizes_hw)):
        h, w = sizes_hw[s]
        total += int(t_list[s - 1]) * batch * h * w * per_px
    return float(total)


def train_step_flops(
    sizes_hw: Sequence[Tuple[int, int]], batch: int, dim: int
) -> float:
    """Mean FLOPs of one grouped-mode train step (fwd + bwd ~= 3x fwd).

    The grouped chunk path visits every scale equally, at true shapes;
    the conventional 3x counts activation- and weight-gradient passes.
    """
    per_px = denoiser_flops_per_pixel(dim)
    mean_px = sum(h * w for h, w in sizes_hw) / len(sizes_hw)
    return float(3 * batch * mean_px * per_px)


def vit_b32_flops(image_hw: Tuple[int, int] = (224, 224)) -> float:
    """Forward FLOPs of one CLIP ViT-B/32 image (models/clip/model.py).

    width 768, 12 layers, patch 32: n_tok = 1 + HW/32^2 (50 at 224^2).
    Per layer: qkv+out projections 8nd^2, attention 4n^2 d, MLP 16nd^2.
    Plus the patch-embed conv (2 * n * 3*32*32 * d) and the final
    projection (negligible).
    """
    d, layers, patch = 768, 12, 32
    n = 1 + (image_hw[0] // patch) * (image_hw[1] // patch)
    per_layer = 2 * n * d * d * (4 + 8) + 4 * n * n * d
    embed = 2 * (n - 1) * 3 * patch * patch * d
    return float(layers * per_layer + embed)


def warp_mm_flops(
    n_out: int, src_hw: Tuple[int, int], channels: int = 3
) -> float:
    """One matmul-warp forward (ops/warp.py bilinear_sample_mm).

    Per channel: A[N,H] @ img[H,W] is 2*N*H*W, the B row-contraction is
    2*N*W (negligible). The adjoint costs the same again.
    """
    h, w = src_hw
    return float(channels * (2 * n_out * h * w + 2 * n_out * w))


def mfu_fields(total_flops: float, seconds: float) -> dict:
    """The bench JSON utilization sub-dict for a measured (flops, time)."""
    tps = total_flops / max(seconds, 1e-12)
    return {
        "model_tflops": round(total_flops / 1e12, 2),
        "tflops_per_s": round(tps / 1e12, 2),
        "mfu_vs_bf16_peak": round(tps / V5E_BF16_PEAK, 4),
        "mfu_vs_fp32_eff_peak": round(tps / V5E_FP32_EFF_PEAK, 4),
    }
