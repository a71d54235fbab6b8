"""InceptionV3 stem features (flax) for paper-exact SIFID.

SIFID (SinGAN / SinDDM papers) is the Frechet distance between *internal
InceptionV3 patch features* of the real and generated image — features at
the first pooling output (64-d, pytorch-fid "block 0"), at native image
resolution. The reference repo ships no metric code (SURVEY §6); this
module provides the Inception feature path natively, in the same
weights-pluggable pattern as the CLIP port (``models/clip/convert.py``):
the architecture and converter are complete and oracle-tested, and real
torchvision ``inception_v3`` weights drop in whenever a checkpoint file is
available (this environment cannot download one — see
``find_inception_weights``).

Implemented stem (torchvision ``inception_v3`` layer names / geometry):

  Conv2d_1a_3x3 (3->32, s2)  -> Conv2d_2a_3x3 (32->32) ->
  Conv2d_2b_3x3 (32->64, p1) -> maxpool1 (3, s2)          = block0 (64-d)
  Conv2d_3b_1x1 (64->80)     -> Conv2d_4a_3x3 (80->192) ->
  maxpool2 (3, s2)                                        = block1 (192-d)

Each conv is torchvision ``BasicConv2d``: Conv(bias=False) + BatchNorm
(eps=1e-3, inference stats) + ReLU.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm2d(eps=0.001)

# (name, kernel, stride, padding, c_out); padding in 'SAME'-style pairs
STEM_SPEC: Tuple[Tuple[str, int, int, int, int], ...] = (
    ("Conv2d_1a_3x3", 3, 2, 0, 32),
    ("Conv2d_2a_3x3", 3, 1, 0, 32),
    ("Conv2d_2b_3x3", 3, 1, 1, 64),
    # --- maxpool1 (block0 output: 64-d) ---
    ("Conv2d_3b_1x1", 1, 1, 0, 80),
    ("Conv2d_4a_3x3", 3, 1, 0, 192),
    # --- maxpool2 (block1 output: 192-d) ---
)


def _basic_conv(x: jnp.ndarray, p: Dict[str, jnp.ndarray], stride: int, pad: int):
    """Conv(bias=False) + inference BatchNorm + ReLU (BasicConv2d)."""
    x = jax.lax.conv_general_dilated(
        x, p["kernel"], (stride, stride), [(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    scale = p["bn_gamma"] / jnp.sqrt(p["bn_var"] + BN_EPS)
    x = (x - p["bn_mean"]) * scale + p["bn_beta"]
    return jax.nn.relu(x)


def _maxpool3s2(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def inception_stem_features(
    params: Dict[str, Any], x01: jnp.ndarray, *, block: str = "block0"
) -> jnp.ndarray:
    """[B, H, W, 3] images in [0, 1] -> stem feature map [B, H', W', D].

    ``block``: 'block0' (64-d, the SIFID layer) or 'block1' (192-d).
    Input scaling follows pytorch-fid: x in [0,1] -> 2x - 1.
    """
    x = 2.0 * x01 - 1.0
    for name, _, stride, pad, _ in STEM_SPEC[:3]:
        x = _basic_conv(x, params[name], stride, pad)
    x = _maxpool3s2(x)
    if block == "block0":
        return x
    if block != "block1":
        raise ValueError(f"block must be 'block0' or 'block1', got {block!r}")
    for name, _, stride, pad, _ in STEM_SPEC[3:]:
        x = _basic_conv(x, params[name], stride, pad)
    return _maxpool3s2(x)


def random_inception_params(seed: int = 0) -> Dict[str, Any]:
    """Random-init stem params (fixture / perf use; shapes match torchvision)."""
    rng = np.random.default_rng(seed)
    params: Dict[str, Any] = {}
    c_in = 3
    for name, k, _, _, c_out in STEM_SPEC:
        params[name] = {
            "kernel": jnp.asarray(
                rng.normal(0, 1.0 / np.sqrt(k * k * c_in), (k, k, c_in, c_out)),
                jnp.float32,
            ),
            "bn_gamma": jnp.asarray(rng.uniform(0.5, 1.5, (c_out,)), jnp.float32),
            "bn_beta": jnp.asarray(rng.normal(0, 0.1, (c_out,)), jnp.float32),
            "bn_mean": jnp.asarray(rng.normal(0, 0.1, (c_out,)), jnp.float32),
            "bn_var": jnp.asarray(rng.uniform(0.5, 1.5, (c_out,)), jnp.float32),
        }
        c_in = c_out
    return params


def inception_params_from_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """torchvision ``inception_v3`` state dict (numpy) -> stem param tree.

    Accepts full-model dicts (extra keys ignored). Layout: torch OIHW ->
    flax HWIO.
    """
    params: Dict[str, Any] = {}
    for name, _, _, _, _ in STEM_SPEC:
        params[name] = {
            "kernel": jnp.asarray(
                np.ascontiguousarray(
                    np.asarray(sd[f"{name}.conv.weight"]).transpose(2, 3, 1, 0)
                ),
                jnp.float32,
            ),
            "bn_gamma": jnp.asarray(sd[f"{name}.bn.weight"], jnp.float32),
            "bn_beta": jnp.asarray(sd[f"{name}.bn.bias"], jnp.float32),
            "bn_mean": jnp.asarray(sd[f"{name}.bn.running_mean"], jnp.float32),
            "bn_var": jnp.asarray(sd[f"{name}.bn.running_var"], jnp.float32),
        }
    return params


def load_inception(path: str) -> Dict[str, Any]:
    """Load stem params from a torch ``inception_v3`` checkpoint file."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    if hasattr(data, "state_dict"):
        data = data.state_dict()
    sd = {k: v.float().numpy() for k, v in data.items() if hasattr(v, "numpy")}
    return inception_params_from_state_dict(sd)


def find_inception_weights() -> Optional[str]:
    """Sniff known locations for an InceptionV3 checkpoint (None if absent)."""
    candidates = [
        os.environ.get("SINDDM_INCEPTION_WEIGHTS"),
        "checkpoints/inception_v3.pt",
        "checkpoints/inception_v3.pth",
        os.path.expanduser("~/.cache/torch/hub/checkpoints/inception_v3_google-0cc3c7bd.pth"),
    ]
    for c in candidates:
        if c and os.path.exists(c):
            return c
    return None
