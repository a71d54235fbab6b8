"""Import reference (PyTorch) SinDDM checkpoints into this framework.

The reference trainer saves ``model-{milestone}.pt`` containing
``{'step', 'model', 'ema', 'sched', ...}`` where model/ema are state
dicts of ``MultiScaleGaussianDiffusion`` (``SinDDM/trainer.py:161-170``):
denoiser weights under the ``denoise_fn.`` prefix plus registered schedule
buffers (betas, gammas, ... — recomputed here, not imported).

This converts those state dicts to :class:`~sinddm_tpu.models.SinDDMNet`
parameter pytrees so users of the reference can switch frameworks without
retraining. Layout mapping (torch OIHW / [out,in] -> flax HWIO / [in,out]):

  denoise_fn.time_mlp.{0,2}       -> time_mlp{1,2}         (Linear, W.T)
  denoise_fn.l{i}.mlp.1           -> l{i}/cond_mlp         (Linear, W.T)
  denoise_fn.l{i}.time_reshape    -> l{i}/cond_proj        (1x1 conv == Linear)
  denoise_fn.l{i}.ds_conv         -> l{i}/ds_conv          ([C,1,5,5] -> [5,5,1,C])
  denoise_fn.l{i}.net.{0,2}       -> l{i}/net_conv{1,2}    ([O,I,3,3] -> [3,3,I,O])
  denoise_fn.l{i}.res_conv        -> l{i}/res_conv         (absent when identity)
  denoise_fn.final_conv.0         -> final_conv
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax.numpy as jnp
import numpy as np


def _lin(sd, key):
    out = {"kernel": np.ascontiguousarray(sd[f"{key}.weight"].T)}
    if f"{key}.bias" in sd:
        out["bias"] = sd[f"{key}.bias"]
    return out


def _conv(sd, key):
    return {
        "kernel": np.ascontiguousarray(sd[f"{key}.weight"].transpose(2, 3, 1, 0)),
        "bias": sd[f"{key}.bias"],
    }


def _conv1x1_as_dense(sd, key):
    w = sd[f"{key}.weight"]  # [O, I, 1, 1]
    return {
        "kernel": np.ascontiguousarray(w[:, :, 0, 0].T),
        "bias": sd[f"{key}.bias"],
    }


def denoiser_params_from_state_dict(sd: Dict[str, np.ndarray]) -> Dict[str, Any]:
    """Reference ``MultiScaleGaussianDiffusion``/``SinDDMNet`` state dict
    (numpy arrays) -> flax params for :class:`SinDDMNet`."""
    # accept both bare SinDDMNet dicts and diffusion-wrapped ones
    prefix = "denoise_fn." if any(k.startswith("denoise_fn.") for k in sd) else ""

    def g(key):
        return f"{prefix}{key}"

    params: Dict[str, Any] = {
        "time_mlp1": _lin(sd, g("time_mlp.0")),
        "time_mlp2": _lin(sd, g("time_mlp.2")),
        "final_conv": _conv(sd, g("final_conv.0")),
    }
    for i in (1, 2, 3, 4):
        name = f"l{i}"
        block = {
            "cond_mlp": _lin(sd, g(f"{name}.mlp.1")),
            "cond_proj": _conv1x1_as_dense(sd, g(f"{name}.time_reshape")),
            "ds_conv": _conv(sd, g(f"{name}.ds_conv")),
            "net_conv1": _conv(sd, g(f"{name}.net.0")),
            "net_conv2": _conv(sd, g(f"{name}.net.2")),
        }
        if f"{g(name)}.res_conv.weight" in sd:
            block["res_conv"] = _conv(sd, g(f"{name}.res_conv"))
        params[name] = block
    return {k: _tree_to_jnp(v) for k, v in params.items()}


def _tree_to_jnp(x):
    if isinstance(x, dict):
        return {k: _tree_to_jnp(v) for k, v in x.items()}
    return jnp.asarray(np.asarray(x, np.float32))


def load_reference_checkpoint(path: str) -> Tuple[Dict, Dict, int]:
    """Load a reference ``model-{milestone}.pt`` -> (params, ema_params, step)."""
    import torch

    data = torch.load(path, map_location="cpu", weights_only=False)
    to_np = lambda d: {k: v.float().numpy() for k, v in d.items()}
    params = denoiser_params_from_state_dict(to_np(data["model"]))
    ema = denoiser_params_from_state_dict(to_np(data["ema"]))
    return params, ema, int(data.get("step", 0))
