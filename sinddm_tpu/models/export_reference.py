"""Export this framework's checkpoints back to the reference (PyTorch) format.

The inverse of :mod:`sinddm_tpu.models.convert_reference`: turns a
:class:`~sinddm_tpu.models.SinDDMNet` flax parameter pytree into a state
dict loadable by the reference ``MultiScaleGaussianDiffusion`` /
``SinDDMNet`` (``SinDDM/models.py:85-151``), and optionally a full
``model-{milestone}.pt`` payload that the reference trainer's strict
``load`` accepts (``SinDDM/trainer.py:161-187``: keys
``step/model/ema/sched/running_loss/running_scale``; the ``model``/``ema``
dicts carry the denoiser weights under the ``denoise_fn.`` prefix plus all
registered schedule buffers, ``SinDDM/models.py:247-287``).

Layout mapping (flax HWIO / [in,out] -> torch OIHW / [out,in]):

  time_mlp{1,2}      -> denoise_fn.time_mlp.{0,2}     (Linear, W.T)
  l{i}/cond_mlp      -> denoise_fn.l{i}.mlp.1         (Linear, W.T)
  l{i}/cond_proj     -> denoise_fn.l{i}.time_reshape  (Linear -> 1x1 conv)
  l{i}/ds_conv       -> denoise_fn.l{i}.ds_conv       ([5,5,1,C] -> [C,1,5,5])
  l{i}/net_conv{1,2} -> denoise_fn.l{i}.net.{0,2}     ([3,3,I,O] -> [O,I,3,3])
  l{i}/res_conv      -> denoise_fn.l{i}.res_conv      (omitted when identity)
  final_conv         -> denoise_fn.final_conv.0

Together with the importer this closes the round trip: users can move a
training run in either direction without retraining.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import numpy as np

from sinddm_tpu.schedules import Schedules

# Schedules field -> reference registered-buffer name (models.py:247-287).
# sigma_t is derived but never registered by the reference.
_BUFFER_FIELDS = (
    "betas",
    "alphas_cumprod",
    "alphas_cumprod_prev",
    "sqrt_alphas_cumprod",
    "sqrt_one_minus_alphas_cumprod",
    "log_one_minus_alphas_cumprod",
    "sqrt_recip_alphas_cumprod",
    "sqrt_recipm1_alphas_cumprod",
    "posterior_variance",
    "posterior_log_variance_clipped",
    "posterior_mean_coef1",
    "posterior_mean_coef2",
    "gammas",
)


def _np(x) -> np.ndarray:
    return np.asarray(x, dtype=np.float32)


def _lin(p) -> Dict[str, np.ndarray]:
    out = {"weight": np.ascontiguousarray(_np(p["kernel"]).T)}
    if "bias" in p:
        out["bias"] = _np(p["bias"])
    return out


def _conv(p) -> Dict[str, np.ndarray]:
    # HWIO -> OIHW
    return {
        "weight": np.ascontiguousarray(_np(p["kernel"]).transpose(3, 2, 0, 1)),
        "bias": _np(p["bias"]),
    }


def _dense_as_conv1x1(p) -> Dict[str, np.ndarray]:
    # [I, O] -> [O, I, 1, 1]
    return {
        "weight": np.ascontiguousarray(_np(p["kernel"]).T)[:, :, None, None],
        "bias": _np(p["bias"]),
    }


def state_dict_from_denoiser_params(
    params: Dict[str, Any], prefix: str = "denoise_fn."
) -> Dict[str, np.ndarray]:
    """Flax :class:`SinDDMNet` params -> reference-name state dict (numpy).

    ``prefix=''`` yields a bare ``SinDDMNet`` state dict; the default
    ``denoise_fn.`` prefix matches the diffusion-wrapped checkpoints the
    reference trainer saves.
    """
    flat: Dict[str, np.ndarray] = {}

    def put(name: str, tensors: Dict[str, np.ndarray]) -> None:
        for k, v in tensors.items():
            flat[f"{prefix}{name}.{k}"] = v

    put("time_mlp.0", _lin(params["time_mlp1"]))
    put("time_mlp.2", _lin(params["time_mlp2"]))
    for i in (1, 2, 3, 4):
        block = params[f"l{i}"]
        put(f"l{i}.mlp.1", _lin(block["cond_mlp"]))
        put(f"l{i}.time_reshape", _dense_as_conv1x1(block["cond_proj"]))
        put(f"l{i}.ds_conv", _conv(block["ds_conv"]))
        put(f"l{i}.net.0", _conv(block["net_conv1"]))
        put(f"l{i}.net.2", _conv(block["net_conv2"]))
        if "res_conv" in block:
            put(f"l{i}.res_conv", _conv(block["res_conv"]))
    flat[f"{prefix}final_conv.0.weight"] = _conv(params["final_conv"])["weight"]
    flat[f"{prefix}final_conv.0.bias"] = _conv(params["final_conv"])["bias"]
    return flat


def diffusion_state_dict(
    params: Dict[str, Any], sched: Schedules
) -> Dict[str, np.ndarray]:
    """Full ``MultiScaleGaussianDiffusion`` state dict: denoiser + buffers."""
    sd = state_dict_from_denoiser_params(params)
    for field in _BUFFER_FIELDS:
        sd[field] = _np(getattr(sched, field))
    return sd


def save_reference_checkpoint(
    path: str,
    params: Dict[str, Any],
    ema_params: Dict[str, Any],
    sched: Schedules,
    *,
    step: int = 0,
    train_lr: float = 1e-3,
    sched_milestones: Sequence[int] = (20000, 40000, 70000, 80000, 90000, 110000),
    sched_gamma: float = 0.5,
    running_loss: Optional[Sequence[float]] = None,
) -> None:
    """Write a reference-format ``model-{milestone}.pt``.

    The payload passes the reference trainer's strict
    ``load_state_dict`` (``trainer.py:182-186``) including a genuine torch
    ``MultiStepLR`` state dict advanced to ``step`` (the reference default
    schedule: gamma 0.5 at [20,40,70,80,90,110]k — ``main.py:45-46,65``).
    """
    import torch

    to_torch = lambda sd: {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd.items()}
    opt = torch.optim.Adam([torch.nn.Parameter(torch.zeros(1))], lr=train_lr)
    scheduler = torch.optim.lr_scheduler.MultiStepLR(
        opt, milestones=list(sched_milestones), gamma=sched_gamma, last_epoch=-1
    )
    # advance last_epoch without stepping `step` times
    state = scheduler.state_dict()
    state["last_epoch"] = int(step)
    state["_step_count"] = int(step) + 1
    scheduler.load_state_dict(state)

    data = {
        "step": int(step),
        "model": to_torch(diffusion_state_dict(params, sched)),
        "ema": to_torch(diffusion_state_dict(ema_params, sched)),
        "sched": scheduler.state_dict(),
        "running_loss": list(running_loss or []),
        "running_scale": [],
    }
    torch.save(data, path)
