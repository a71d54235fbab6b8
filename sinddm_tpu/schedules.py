"""Diffusion schedules and derived buffers, as one immutable pytree.

Replaces the mutable registered-buffer state of the reference
``MultiScaleGaussianDiffusion.__init__`` (``SinDDM/models.py:227-287``)
with a pure, precomputed ``Schedules`` dataclass. Everything a sampler or
loss needs is a gather from these arrays — no object state.

Derivations (all float64 on host, stored float32):
  * cosine beta schedule, T=100 (reference ``functions.py:117-127``)
  * standard DDPM buffers (reference ``models.py:247-267``)
  * sigma_t = sqrt(1 - abar) / sqrt(abar) (reference ``models.py:269``)
  * per-scale starting timesteps ``num_timesteps_ideal[s] =
    argmax(sigma_t > loss_factor * rescale_losses[s-1])`` (``models.py:272-280``)
  * reblur schedule ``gammas[s-1, t] = clip(sigma_t / (loss_factor *
    rescale_losses[s-1]), 0, 1)`` (``models.py:283-287``); use sites clamp
    again to <= 0.55 (``models.py:314,358``).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from flax import struct

GAMMA_SAMPLING_CLAMP = 0.55  # reference models.py:314,358


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule as in the reference (``functions.py:117-127``)."""
    steps = timesteps + 1
    x = np.linspace(0, steps, steps)
    alphas_cumprod = np.cos(((x / steps) + s) / (1 + s) * np.pi * 0.5) ** 2
    alphas_cumprod = alphas_cumprod / alphas_cumprod[0]
    betas = 1 - (alphas_cumprod[1:] / alphas_cumprod[:-1])
    return np.clip(betas, a_min=0, a_max=0.999)


@struct.dataclass
class Schedules:
    """All diffusion buffers as jnp arrays plus static pyramid-derived ints.

    Array fields are leaves (traced / device-resident); the ``*_ideal`` /
    ``*_trained`` tuples and scalars are static aux data.
    """

    betas: jnp.ndarray
    alphas_cumprod: jnp.ndarray
    alphas_cumprod_prev: jnp.ndarray
    sqrt_alphas_cumprod: jnp.ndarray
    sqrt_one_minus_alphas_cumprod: jnp.ndarray
    log_one_minus_alphas_cumprod: jnp.ndarray
    sqrt_recip_alphas_cumprod: jnp.ndarray
    sqrt_recipm1_alphas_cumprod: jnp.ndarray
    posterior_variance: jnp.ndarray
    posterior_log_variance_clipped: jnp.ndarray
    posterior_mean_coef1: jnp.ndarray
    posterior_mean_coef2: jnp.ndarray
    sigma_t: jnp.ndarray
    # [n_scales - 1, T]; row s-1 is the reblur mixing schedule of scale s.
    gammas: jnp.ndarray

    num_timesteps: int = struct.field(pytree_node=False, default=100)
    num_timesteps_ideal: Tuple[int, ...] = struct.field(
        pytree_node=False, default=()
    )
    num_timesteps_trained: Tuple[int, ...] = struct.field(
        pytree_node=False, default=()
    )
    n_scales: int = struct.field(pytree_node=False, default=1)

    def gammas_row(self, s: int) -> jnp.ndarray:
        """Training-time gamma row for scale s > 0 (unclamped)."""
        return self.gammas[s - 1]

    def gammas_row_sampling(self, s: int) -> jnp.ndarray:
        """Sampling-time gamma row for scale s > 0 (clamped to 0.55)."""
        return jnp.clip(self.gammas[s - 1], 0.0, GAMMA_SAMPLING_CLAMP)

    def zero_gamma_row(self, s: int) -> "Schedules":
        """Return a copy with gammas[s-1] zeroed.

        Functional equivalent of the reference i2i in-place mutation
        ``ema_model.gammas[start_s-1].clamp_(0, 0)`` (``trainer.py:326-327``):
        the entry scale of image2image runs with no reblur mixing.
        """
        return self.replace(gammas=self.gammas.at[s - 1].set(0.0))


def make_schedules(
    *,
    timesteps: int = 100,
    scale_losses: Optional[Sequence[float]] = None,
    n_scales: int = 1,
    loss_factor: float = 1.0,
    train_full_t: bool = True,
    betas: Optional[np.ndarray] = None,
    dtype=jnp.float32,
) -> Schedules:
    """Precompute every diffusion buffer.

    Args mirror the knobs of the reference constructor
    (``SinDDM/models.py:156-287``): ``scale_losses`` are the pyramid's
    ``rescale_losses``; ``train_full_t=True`` is the shipped default
    (``main.py:94``).
    """
    if betas is None:
        betas = cosine_beta_schedule(timesteps)
    betas = np.asarray(betas, dtype=np.float64)
    (timesteps,) = betas.shape

    alphas = 1.0 - betas
    alphas_cumprod = np.cumprod(alphas, axis=0)
    alphas_cumprod_prev = np.append(1.0, alphas_cumprod[:-1])

    posterior_variance = betas * (1.0 - alphas_cumprod_prev) / (1.0 - alphas_cumprod)
    sigma_t = np.sqrt(1.0 - alphas_cumprod) / np.sqrt(alphas_cumprod)

    num_timesteps_ideal = [int(timesteps)]
    num_timesteps_trained = [int(timesteps)]
    if scale_losses is not None:
        for i in range(n_scales - 1):
            ideal = int(np.argmax(sigma_t > loss_factor * scale_losses[i]))
            num_timesteps_ideal.append(ideal)
            num_timesteps_trained.append(int(timesteps) if train_full_t else ideal)

    if n_scales > 1:
        if scale_losses is None:
            raise ValueError("scale_losses required when n_scales > 1")
        gammas = np.stack(
            [
                np.clip(sigma_t / (loss_factor * scale_losses[i]), 0.0, 1.0)
                for i in range(n_scales - 1)
            ]
        )
    else:
        gammas = np.zeros((0, timesteps))

    f32 = lambda a: jnp.asarray(a, dtype=dtype)
    return Schedules(
        betas=f32(betas),
        alphas_cumprod=f32(alphas_cumprod),
        alphas_cumprod_prev=f32(alphas_cumprod_prev),
        sqrt_alphas_cumprod=f32(np.sqrt(alphas_cumprod)),
        sqrt_one_minus_alphas_cumprod=f32(np.sqrt(1.0 - alphas_cumprod)),
        log_one_minus_alphas_cumprod=f32(np.log(1.0 - alphas_cumprod)),
        sqrt_recip_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod)),
        sqrt_recipm1_alphas_cumprod=f32(np.sqrt(1.0 / alphas_cumprod - 1.0)),
        posterior_variance=f32(posterior_variance),
        posterior_log_variance_clipped=f32(
            np.log(np.maximum(posterior_variance, 1e-20))
        ),
        posterior_mean_coef1=f32(
            betas * np.sqrt(alphas_cumprod_prev) / (1.0 - alphas_cumprod)
        ),
        posterior_mean_coef2=f32(
            (1.0 - alphas_cumprod_prev) * np.sqrt(alphas) / (1.0 - alphas_cumprod)
        ),
        sigma_t=f32(sigma_t),
        gammas=f32(gammas),
        num_timesteps=int(timesteps),
        num_timesteps_ideal=tuple(num_timesteps_ideal),
        num_timesteps_trained=tuple(num_timesteps_trained),
        n_scales=int(n_scales),
    )
