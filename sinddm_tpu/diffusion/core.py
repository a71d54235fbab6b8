"""Multi-scale Gaussian diffusion as pure functions.

This is the TPU-native redesign of the reference
``MultiScaleGaussianDiffusion`` (``SinDDM/models.py:155-631``): instead of
a mutable ``nn.Module`` whose guidance flags and reblur state are poked on
from outside, every process here is a pure function over

  * a :class:`~sinddm_tpu.schedules.Schedules` pytree (precomputed buffers),
  * a ``model_fn(x, t_vec, s) -> eps`` closure over the denoiser params,
  * explicit ``jax.random`` keys,
  * an optional guidance hook threaded through the timestep scan.

Timestep loops are ``lax.scan``s — the entire reverse process of a scale
compiles to a single XLA computation (the reference pays a Python/CUDA
launch round-trip per step, ``models.py:480,540``).

Math contract (verified against the reference, see file:line cites):
  * ``q_sample``                    — models.py:570-576
  * ``predict_start_from_noise``    — models.py:306-318 (incl. reblur deblend)
  * ``q_posterior``                 — models.py:321-352 (incl. the custom
    reblur posterior with omega-scaled variance)
  * ``p_mean_variance`` / ``p_sample`` — models.py:354-459
  * scale-0 loop                    — models.py:462-499
  * via-scale loop                  — models.py:501-568
  * training losses                 — models.py:578-631

Shapes are NHWC. ``s`` (the scale index) is always a static Python int —
each scale has a different image shape, so each gets its own cached XLA
specialization, exactly one per (shape, t-count) pair.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from sinddm_tpu.schedules import Schedules

# model_fn(x [B,H,W,C], t [B], s scalar) -> eps [B,H,W,C]
ModelFn = Callable[[jnp.ndarray, jnp.ndarray, jnp.ndarray], jnp.ndarray]

# guidance_fn(x_recon, x_t, t, s, key, carry) -> (x_recon, carry, aux)
GuidanceFn = Callable[..., Tuple[jnp.ndarray, Any, Dict[str, jnp.ndarray]]]


def extract(a: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Gather schedule coefficients by per-sample timestep -> [B, 1, 1, 1].

    Reference ``functions.py:105-108``.
    """
    return a[t][:, None, None, None]


def q_sample(
    sched: Schedules, x_start: jnp.ndarray, t: jnp.ndarray, noise: jnp.ndarray
) -> jnp.ndarray:
    """Forward noising q(x_t | x_0). Reference models.py:570-576."""
    t = jnp.asarray(t)
    if t.ndim == 0:
        t = jnp.full((x_start.shape[0],), t)
    return (
        extract(sched.sqrt_alphas_cumprod, t) * x_start
        + extract(sched.sqrt_one_minus_alphas_cumprod, t) * noise
    )


def predict_start_from_noise(
    sched: Schedules,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    s: int,
    reblurring: bool,
    img_prev: Optional[jnp.ndarray] = None,
    gammas_row: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Predict (x_tm1_mix, x_t_mix) from predicted noise.

    Reference models.py:306-318. At s=0 (or reblurring off) both outputs
    are the plain DDPM x0 estimate. At s>0 with reblurring the first output
    additionally solves for the *deblurred* image
    ``(x0_pred - gamma_t * img_prev) / (1 - gamma_t)`` where ``img_prev``
    is the upsampled previous-scale output and gamma is the sampling row
    (clamped <= 0.55).
    """
    x_recon_ddpm = (
        extract(sched.sqrt_recip_alphas_cumprod, t) * x_t
        - extract(sched.sqrt_recipm1_alphas_cumprod, t) * noise
    )
    if not reblurring or s == 0:
        return x_recon_ddpm, x_recon_ddpm
    g = extract(gammas_row, t)
    x_tm1_mix = (x_recon_ddpm - g * img_prev) / (1.0 - g)
    return x_tm1_mix, x_recon_ddpm


def q_posterior(
    sched: Schedules,
    x_start: jnp.ndarray,
    x_t_mix: jnp.ndarray,
    x_t: jnp.ndarray,
    t: jnp.ndarray,
    *,
    s: int,
    reblurring: bool,
    omega: float = 0.0,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Posterior mean and log-variance. Reference models.py:321-352.

    For s=0 / no reblurring: the standard DDPM posterior. For s>0 with
    reblurring and t>0: the custom SinDDM posterior
      mean = sqrt(abar_{t-1}) * x_tm1_mix
           + sqrt(1 - abar_{t-1} - var) * (x_t - sqrt(abar_t) * x_t_mix)
             / sqrt(1 - abar_t)
      var  = omega * (1 - abar_{t-1})
    and at t==0 the mean is x_start with no noise (the t==0 noise mask in
    :func:`p_sample` makes the variance irrelevant there).
    """
    if not reblurring or s == 0:
        mean = (
            extract(sched.posterior_mean_coef1, t) * x_start
            + extract(sched.posterior_mean_coef2, t) * x_t
        )
        logvar = extract(sched.posterior_log_variance_clipped, t)
        return mean, logvar

    tm1 = jnp.maximum(t - 1, 0)
    var_t = omega * (1.0 - extract(sched.alphas_cumprod, tm1))
    logvar_pos = jnp.log(jnp.clip(var_t, 1e-20, None))
    mean_pos = extract(sched.sqrt_alphas_cumprod, tm1) * x_start + jnp.sqrt(
        1.0 - extract(sched.alphas_cumprod, tm1) - var_t
    ) * (x_t - extract(sched.sqrt_alphas_cumprod, t) * x_t_mix) / extract(
        sched.sqrt_one_minus_alphas_cumprod, t
    )

    # t == 0: mean = x_start, standard (unused) variance.
    is_pos = (t > 0).astype(x_t.dtype)[:, None, None, None]
    mean = is_pos * mean_pos + (1.0 - is_pos) * x_start
    logvar0 = extract(sched.posterior_log_variance_clipped, t)
    logvar = is_pos * logvar_pos + (1.0 - is_pos) * logvar0
    return mean, logvar


def p_sample_step(
    model_fn: ModelFn,
    sched: Schedules,
    x: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
    *,
    s: int,
    reblurring: bool,
    img_prev: Optional[jnp.ndarray] = None,
    omega: float = 0.0,
    clip_denoised: bool = True,
    guidance_fn: Optional[GuidanceFn] = None,
    guidance_carry: Any = None,
    guidance_params: Any = None,
    gammas_row: Optional[jnp.ndarray] = None,
    s_value: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Any, Dict[str, jnp.ndarray]]:
    """One reverse step x_t -> x_{t-1}. Reference models.py:354-459.

    ``t`` is a scalar (traced inside the scan); ``s`` is static and picks
    the code path. The shape-bucketed sampler (``diffusion/bucketed.py``)
    runs ONE graph for every scale: it passes a dynamically gathered
    ``gammas_row`` plus a traced ``s_value`` for the denoiser's scale
    embedding while keeping ``s`` as a static stand-in (>0) for branching.
    Returns (x_next, guidance_carry, guidance_aux).
    """
    b = x.shape[0]
    t = jnp.asarray(t)
    t_vec = jnp.full((b,), t, dtype=jnp.int32)
    s_emb = jnp.asarray(s, jnp.float32) if s_value is None else s_value
    eps = model_fn(x, t_vec, s_emb)

    if gammas_row is None:
        gammas_row = sched.gammas_row_sampling(s) if (reblurring and s > 0) else None
    x_recon, x_t_mix = predict_start_from_noise(
        sched, x, t_vec, eps, s=s, reblurring=reblurring,
        img_prev=img_prev, gammas_row=gammas_row,
    )

    aux: Dict[str, jnp.ndarray] = {}
    if guidance_fn is not None:
        key, gkey = jax.random.split(key)
        s_arg = s if s_value is None else s_value
        if guidance_params is None:
            x_recon, guidance_carry, aux = guidance_fn(
                x_recon, x, t, s_arg, gkey, guidance_carry
            )
        else:
            # large frozen towers (CLIP) arrive as TRACED arguments, never
            # as closure constants: a ViT-B/32 embedded as HLO constants
            # is a ~600MB program the compile service rejects
            x_recon, guidance_carry, aux = guidance_fn(
                x_recon, x, t, s_arg, gkey, guidance_carry, guidance_params
            )

    if reblurring and s > 0:
        # re-mix with gamma_{t-1} when t > 0 (models.py:434-438)
        tm1 = jnp.maximum(t_vec - 1, 0)
        g_prev = extract(gammas_row, tm1)
        is_pos = (t_vec > 0).astype(x.dtype)[:, None, None, None]
        x_tm1_mix = is_pos * (g_prev * img_prev + (1.0 - g_prev) * x_recon) + (
            1.0 - is_pos
        ) * x_recon
    else:
        x_tm1_mix = x_recon

    if clip_denoised:
        x_tm1_mix = jnp.clip(x_tm1_mix, -1.0, 1.0)
        x_t_mix = jnp.clip(x_t_mix, -1.0, 1.0)

    mean, logvar = q_posterior(
        sched, x_tm1_mix, x_t_mix, x, t_vec, s=s, reblurring=reblurring, omega=omega
    )

    noise = jax.random.normal(key, x.shape, dtype=x.dtype)
    nonzero = (t_vec > 0).astype(x.dtype)[:, None, None, None]
    x_next = mean + nonzero * jnp.exp(0.5 * logvar) * noise
    return x_next, guidance_carry, aux


def _scan_reverse(
    model_fn: ModelFn,
    sched: Schedules,
    x: jnp.ndarray,
    key: jax.Array,
    t_start: int,
    t_min: int,
    *,
    s: int,
    reblurring: bool,
    img_prev: Optional[jnp.ndarray],
    omega: float,
    guidance_fn: Optional[GuidanceFn],
    guidance_carry: Any,
    guidance_params: Any = None,
    collect_interm: bool = False,
) -> Tuple[jnp.ndarray, Any, Any]:
    """Run the reverse chain t = t_start-1 .. t_min as one lax.scan.

    ``collect_interm=True`` additionally stacks every intermediate state
    into the aux output under key ``"interm"`` (the functional equivalent
    of the reference's ``save_interm`` image dumps, models.py:469-475 —
    the host saves the frames after the scan instead of inside the loop).
    """
    ts = jnp.arange(t_start - 1, t_min - 1, -1)
    if ts.shape[0] == 0:
        return x, guidance_carry, None

    def body(carry, t):
        x, key, gcarry = carry
        key, sub = jax.random.split(key)
        x, gcarry, aux = p_sample_step(
            model_fn, sched, x, t, sub,
            s=s, reblurring=reblurring, img_prev=img_prev, omega=omega,
            guidance_fn=guidance_fn, guidance_carry=gcarry,
            guidance_params=guidance_params,
        )
        if collect_interm:
            aux = dict(aux, interm=x)
        return (x, key, gcarry), aux

    (x, _, guidance_carry), auxs = jax.lax.scan(body, (x, key, guidance_carry), ts)
    return x, guidance_carry, auxs


def sample_scale0(
    model_fn: ModelFn,
    sched: Schedules,
    shape: Tuple[int, ...],
    key: jax.Array,
    *,
    s: int = 0,
    t_min: int = 0,
    omega: float = 0.0,
    guidance_fn: Optional[GuidanceFn] = None,
    guidance_carry: Any = None,
    guidance_params: Any = None,
    sharding=None,
    collect_interm: bool = False,
) -> Tuple[jnp.ndarray, Any, Any]:
    """Sample from pure noise at the coarsest scale. Reference models.py:462-499.

    ``shape`` is (B, H, W, C); the reverse chain runs T-1 .. t_min
    (``t_min = num_timesteps_ideal[s+1]`` under --sample_limited_t).
    ``sharding``: optional NamedSharding for the [B, H, W, C] state — one
    constraint on the initial noise propagates through the whole scan
    (batch over 'data', optionally H over 'spatial'; XLA inserts the conv
    halo exchanges).
    """
    key, k0 = jax.random.split(key)
    x = jax.random.normal(k0, shape, dtype=jnp.float32)
    if sharding is not None:
        x = jax.lax.with_sharding_constraint(x, sharding)
    return _scan_reverse(
        model_fn, sched, x, key, sched.num_timesteps, t_min,
        s=s, reblurring=False, img_prev=None, omega=omega,
        guidance_fn=guidance_fn, guidance_carry=guidance_carry,
        guidance_params=guidance_params, collect_interm=collect_interm,
    )


def sample_via_scale(
    model_fn: ModelFn,
    sched: Schedules,
    img_prev: jnp.ndarray,
    key: jax.Array,
    *,
    s: int,
    total_t: int,
    t_min: int = 0,
    reblurring: bool = True,
    omega: float = 0.0,
    guidance_fn: Optional[GuidanceFn] = None,
    guidance_carry: Any = None,
    guidance_params: Any = None,
    sharding=None,
    collect_interm: bool = False,
) -> Tuple[jnp.ndarray, Any, Any]:
    """Denoise at scale s conditioned on the (already resized) previous output.

    Reference ``p_sample_via_scale_loop`` (models.py:501-547): the caller
    resizes the previous scale's output to this scale's size (see
    :func:`sinddm_tpu.ops.resize_bilinear`); we stash it as the reblur
    anchor, forward-noise it to ``total_t`` and reverse-denoise
    ``total_t - 1 .. t_min``.
    """
    if sharding is not None:
        img_prev = jax.lax.with_sharding_constraint(img_prev, sharding)
    key, kn = jax.random.split(key)
    noise = jax.random.normal(kn, img_prev.shape, dtype=img_prev.dtype)
    x = q_sample(sched, img_prev, jnp.asarray(total_t), noise)
    return _scan_reverse(
        model_fn, sched, x, key, total_t, t_min,
        s=s, reblurring=reblurring, img_prev=img_prev, omega=omega,
        guidance_fn=guidance_fn, guidance_carry=guidance_carry,
        guidance_params=guidance_params, collect_interm=collect_interm,
    )


def p_losses(
    model_fn: ModelFn,
    sched: Schedules,
    x_start: jnp.ndarray,
    t: jnp.ndarray,
    noise: jnp.ndarray,
    *,
    s: int,
    x_orig: Optional[jnp.ndarray] = None,
    loss_type: str = "l1",
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Training loss. Reference models.py:578-611.

    At s>0, ``x_start`` is the blurry upsampled (recon) image and
    ``x_orig`` the true scale-s image; the target mix is
    ``gamma_t * x_start + (1 - gamma_t) * x_orig`` with the *unclamped*
    gamma row. At s=0 it is plain DDPM on ``x_start``.

    ``valid_mask`` ([H, W, 1] or broadcastable) restricts the loss to valid
    pixels for uniform-padded-shape training.
    """
    if s > 0:
        g = extract(sched.gammas_row(s), t)
        x_mix = g * x_start + (1.0 - g) * x_orig
    else:
        x_mix = x_start
    x_noisy = q_sample(sched, x_mix, t, noise)
    x_recon = model_fn(x_noisy, t, jnp.asarray(s, jnp.float32))

    def _mean(err):
        if valid_mask is None:
            return jnp.mean(err)
        w = jnp.broadcast_to(valid_mask, err.shape).astype(err.dtype)
        return jnp.sum(err * w) / jnp.sum(w)

    if loss_type == "l1":
        return _mean(jnp.abs(noise - x_recon))
    if loss_type == "l2":
        return _mean((noise - x_recon) ** 2)
    if loss_type == "l1_pred_img":
        if s > 0:
            g = sched.gammas_row(s)
            tm1 = jnp.maximum(t - 1, 0)
            g_prev = extract(g, tm1)
            mix_prev = g_prev * x_start + (1.0 - g_prev) * x_orig
            # reference checks t[0] (first batch element) — models.py:600
            x_mix_prev = jnp.where(t[0] > 0, mix_prev, jnp.broadcast_to(x_orig, mix_prev.shape))
        else:
            x_mix_prev = jnp.broadcast_to(x_start, x_recon.shape)
        return _mean(jnp.abs(x_mix_prev - x_recon))
    raise NotImplementedError(loss_type)


def training_loss(
    model_fn: ModelFn,
    sched: Schedules,
    key: jax.Array,
    x_orig: jnp.ndarray,
    x_blurry: jnp.ndarray,
    *,
    s: int,
    batch_size: int,
    loss_type: str = "l1",
    valid_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Draw t ~ U[0, trained[s]) and noise, then compute p_losses.

    Mirrors ``MultiScaleGaussianDiffusion.forward`` (models.py:613-631);
    ``x_orig``/``x_blurry`` may be [1, H, W, C] and broadcast over batch.
    """
    kt, kn = jax.random.split(key)
    t = jax.random.randint(kt, (batch_size,), 0, sched.num_timesteps_trained[s])
    shape = (batch_size,) + x_orig.shape[1:]
    noise = jax.random.normal(kn, shape, dtype=x_orig.dtype)
    if s > 0:
        return p_losses(
            model_fn, sched, x_blurry, t, noise,
            s=s, x_orig=x_orig, loss_type=loss_type, valid_mask=valid_mask,
        )
    return p_losses(
        model_fn, sched, x_orig, t, noise,
        s=s, loss_type=loss_type, valid_mask=valid_mask,
    )
