"""Multiscale trainer: jitted train steps, EMA, checkpoints, logging.

Re-design of the reference ``MultiscaleTrainer`` (``SinDDM/trainer.py:66-224``)
for TPU:

* the training data is a constant per-scale tensor set (the reference
  caches one batch per scale at construction and reuses it forever,
  ``trainer.py:127-132``) — we stage one [1, H, W, 3] pair per scale on
  device and broadcast over the batch inside the loss,
* Adam + MultiStep LR decay via an optax chain whose schedule reproduces
  torch's ``MultiStepLR(gamma=0.5)`` step-for-step,
* EMA with the reference warmup semantics: hard copy until
  ``step_start_ema``, then a 0.995 lerp every ``update_ema_every`` steps
  (``trainer.py:83-84,155-159``), implemented branchlessly inside jit,
* **fused chunk path** (the TPU-first hot loop): all scales are padded to
  one (H_max, W_max) canvas with per-scale validity masks (the denoiser
  re-zeroes padding before every conv, making padded compute exactly
  equivalent — see ``models/denoiser.py``), the per-step scale choice is
  drawn on device, and ``steps_per_chunk`` whole optimization steps run as
  a single ``lax.scan`` — one device call per chunk instead of one per
  step. The reference pays a full Python->CUDA round trip per step.
* orbax checkpoints that — unlike the reference (``trainer.py:161-187``,
  which drops Adam moments) — include the optimizer state.
"""

from __future__ import annotations

import functools
import json
import time
from pathlib import Path
from typing import Any, Callable, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct

from sinddm_tpu.config import DiffusionConfig, TrainConfig
from sinddm_tpu.diffusion.core import extract, q_sample, training_loss
from sinddm_tpu.pyramid import Pyramid
from sinddm_tpu.schedules import Schedules


@struct.dataclass
class TrainState:
    step: jnp.ndarray  # int32 scalar
    params: Any
    ema_params: Any
    opt_state: Any


def make_lr_schedule(cfg: TrainConfig) -> optax.Schedule:
    """torch MultiStepLR(gamma) equivalence: lr(k) = lr0 * g^|{m <= k}|."""
    return optax.piecewise_constant_schedule(
        init_value=cfg.train_lr,
        boundaries_and_scales={int(m): cfg.lr_gamma for m in cfg.sched_milestones},
    )


def make_optimizer(cfg: TrainConfig) -> optax.GradientTransformation:
    return optax.adam(learning_rate=make_lr_schedule(cfg))


def _ema_update(
    ema: Any, params: Any, step: jnp.ndarray, cfg: TrainConfig
) -> Any:
    """Branchless reference EMA semantics (trainer.py:155-159, models.py:18-31)."""
    do = (step % cfg.update_ema_every) == 0
    warm = step < cfg.step_start_ema
    b = cfg.ema_decay

    def leaf(e, p):
        lerped = e * b + (1.0 - b) * p
        new = jnp.where(warm, p, lerped)
        return jnp.where(do, new, e)

    return jax.tree.map(leaf, ema, params)


def _stack_padded(
    pyramid: Pyramid,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Pad each scale's (orig, blur) pair onto a common canvas + masks.

    Returns (orig [S,Hm,Wm,3], blur [S,Hm,Wm,3], mask [S,Hm,Wm,1]); images
    sit in the top-left corner, masks are 1 on valid pixels.
    """
    hm = max(h for h, _ in pyramid.sizes_hw)
    wm = max(w for _, w in pyramid.sizes_hw)
    s_n = pyramid.n_scales
    orig = np.zeros((s_n, hm, wm, 3), np.float32)
    blur = np.zeros((s_n, hm, wm, 3), np.float32)
    mask = np.zeros((s_n, hm, wm, 1), np.float32)
    for s in range(s_n):
        h, w = pyramid.sizes_hw[s]
        orig[s, :h, :w] = pyramid.images[s]
        blur[s, :h, :w] = pyramid.recon_images[s]
        mask[s, :h, :w] = 1.0
    return orig, blur, mask


class MultiscaleTrainer:
    """Owns params/EMA/opt state and the training loop; apps live elsewhere."""

    def __init__(
        self,
        model,
        sched: Schedules,
        pyramid: Pyramid,
        train_cfg: TrainConfig,
        diff_cfg: DiffusionConfig,
        results_folder: str,
        seed: int = 0,
        mesh=None,
    ):
        self.model = model
        self.sched = sched
        self.pyramid = pyramid
        self.cfg = train_cfg
        self.diff_cfg = diff_cfg
        # optional jax.sharding.Mesh: batch over 'data', image H over
        # 'spatial'; one constraint on the noise shards the whole step and
        # XLA all-reduces the gradients over ICI
        self.mesh = mesh
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            self._batch_sharding = NamedSharding(
                mesh, P("data", "spatial", None, None)
            )
            # every host-produced jit input must be a committed GLOBAL
            # array once the mesh spans processes (multi-host); explicit
            # replication is also the honest layout single-process
            repl = NamedSharding(mesh, P())
            self._stage = lambda x: jax.device_put(x, repl)
        else:
            self._batch_sharding = None
            self._stage = lambda x: x
        self.results_folder = Path(results_folder)
        self.results_folder.mkdir(parents=True, exist_ok=True)

        self.key = jax.random.PRNGKey(seed)
        self.key, init_key = jax.random.split(self.key)
        h0, w0 = pyramid.sizes_hw[0]
        dummy_x = jnp.zeros((1, h0, w0, 3), jnp.float32)
        params = model.init(
            init_key, dummy_x, jnp.zeros((1,), jnp.int32), jnp.asarray(0.0)
        )["params"]

        self.opt = make_optimizer(train_cfg)
        self.state = self._stage(TrainState(
            step=jnp.asarray(0, jnp.int32),
            params=params,
            ema_params=jax.tree.map(jnp.copy, params),
            opt_state=self.opt.init(params),
        ))

        # per-scale device-resident (orig, blur) pairs, [1, H, W, 3]
        self.data_list = [
            (
                self._stage(jnp.asarray(pyramid.images[s])[None]),
                self._stage(jnp.asarray(pyramid.recon_images[s])[None]),
            )
            for s in range(pyramid.n_scales)
        ]
        self._orig_p, self._blur_p, self._mask_p = (
            self._stage(jnp.asarray(a)) for a in _stack_padded(pyramid)
        )
        # s ~ multinomial(num_timesteps_trained) — uniform under train_full_t
        # (reference trainer.py:193-197)
        w = np.asarray(sched.num_timesteps_trained, np.float64)
        self._s_probs = w / w.sum()

        self.running_loss: List[float] = []
        self.running_scale: List[int] = []
        self._rng = np.random.default_rng(seed + 1)
        self._step_fn = self._build_step_fn()
        self._chunk_fn = self._build_chunk_fn()
        self._scale_chunk_fn = self._build_scale_chunk_fn()

    # ------------------------------------------------------------------
    # reference-shaped path: one jitted device call per train step
    # ------------------------------------------------------------------
    def _build_step_fn(self):
        model, sched, cfg = self.model, self.sched, self.cfg
        opt = self.opt
        loss_type = self.diff_cfg.loss_type
        G = cfg.grad_accumulate
        B = cfg.train_batch_size

        batch_sharding = self._batch_sharding

        @functools.partial(jax.jit, static_argnames=("s",), donate_argnums=(0,))
        def step_fn(state: TrainState, x_orig, x_blur, key, s: int):
            def loss_fn(params):
                def model_fn(x, t, sc):
                    x_in = (
                        jax.lax.with_sharding_constraint(x, batch_sharding)
                        if batch_sharding is not None
                        else x
                    )
                    return model.apply({"params": params}, x_in, t, sc)

                keys = jax.random.split(key, G)
                losses = [
                    training_loss(
                        model_fn, sched, keys[g], x_orig, x_blur,
                        s=s, batch_size=B, loss_type=loss_type,
                    )
                    for g in range(G)
                ]
                return jnp.mean(jnp.stack(losses))

            loss, grads = jax.value_and_grad(loss_fn)(state.params)
            updates, opt_state = opt.update(grads, state.opt_state, state.params)
            params = optax.apply_updates(state.params, updates)
            ema = _ema_update(state.ema_params, params, state.step, cfg)
            return (
                TrainState(
                    step=state.step + 1,
                    params=params,
                    ema_params=ema,
                    opt_state=opt_state,
                ),
                loss,
            )

        return step_fn

    def train_step(self, s: Optional[int] = None) -> float:
        """One reference-semantics train step (host chooses the scale)."""
        if s is None:
            s = int(self._rng.choice(len(self._s_probs), p=self._s_probs))
        self.key, sub = jax.random.split(self.key)
        x_orig, x_blur = self.data_list[s]
        self.state, loss = self._step_fn(
            self.state, x_orig, x_blur, self._stage(sub), s
        )
        return float(loss)

    # ------------------------------------------------------------------
    # fused path: `steps_per_chunk` whole steps per device call
    # ------------------------------------------------------------------
    def _build_chunk_fn(self):
        model, sched, cfg = self.model, self.sched, self.cfg
        opt = self.opt
        loss_type = self.diff_cfg.loss_type
        G = cfg.grad_accumulate
        B = cfg.train_batch_size
        batch_sharding = self._batch_sharding
        n_scales = self.pyramid.n_scales
        T = sched.num_timesteps
        # gamma row per scale on the padded stack; row 0 is zeros so the
        # uniform mixing formula reduces to plain DDPM at scale 0
        if n_scales > 1:
            gammas_all = jnp.concatenate(
                [jnp.zeros((1, T), jnp.float32), sched.gammas], axis=0
            )
        else:
            gammas_all = jnp.zeros((1, T), jnp.float32)
        trained = jnp.asarray(sched.num_timesteps_trained, jnp.int32)
        logits = jnp.log(jnp.asarray(self._s_probs, jnp.float32))

        if loss_type not in ("l1", "l2"):
            return None  # fused path supports the shipped losses only

        @functools.partial(jax.jit, static_argnames=("n_steps",), donate_argnums=(0,))
        def chunk_fn(state: TrainState, orig_p, blur_p, mask_p, key, n_steps: int):
            def one_step(state: TrainState, step_key):
                ks, kg = jax.random.split(step_key)
                s = jax.random.categorical(ks, logits)
                x_orig = jnp.take(orig_p, s, axis=0)[None]
                x_blur = jnp.take(blur_p, s, axis=0)[None]
                mask = jnp.take(mask_p, s, axis=0)
                g_row = jnp.take(gammas_all, s, axis=0)
                t_hi = jnp.take(trained, s)

                def loss_fn(params):
                    def model_fn(x, t, sc):
                        return model.apply(
                            {"params": params}, x, t, sc, mask=mask[None]
                        )

                    def one_loss(k):
                        kt, kn = jax.random.split(k)
                        u = jax.random.uniform(kt, (B,))
                        t = (u * t_hi).astype(jnp.int32)
                        noise = jax.random.normal(
                            kn, (B,) + x_orig.shape[1:], jnp.float32
                        )
                        if batch_sharding is not None:
                            noise = jax.lax.with_sharding_constraint(
                                noise, batch_sharding
                            )
                        g = extract(g_row, t)
                        x_mix = g * x_blur + (1.0 - g) * x_orig
                        x_noisy = q_sample(sched, x_mix, t, noise)
                        pred = model_fn(x_noisy, t, s.astype(jnp.float32))
                        err = (
                            jnp.abs(noise - pred)
                            if loss_type == "l1"
                            else (noise - pred) ** 2
                        )
                        w = jnp.broadcast_to(mask[None], err.shape)
                        return jnp.sum(err * w) / jnp.sum(w)

                    keys = jax.random.split(kg, G)
                    return jnp.mean(
                        jnp.stack([one_loss(keys[g]) for g in range(G)])
                    )

                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                updates, opt_state = opt.update(
                    grads, state.opt_state, state.params
                )
                params = optax.apply_updates(state.params, updates)
                ema = _ema_update(state.ema_params, params, state.step, cfg)
                return (
                    TrainState(
                        step=state.step + 1,
                        params=params,
                        ema_params=ema,
                        opt_state=opt_state,
                    ),
                    (loss, s),
                )

            keys = jax.random.split(key, n_steps)
            state, (losses, s_seq) = jax.lax.scan(one_step, state, keys)
            return state, losses, s_seq

        return chunk_fn

    # ------------------------------------------------------------------
    # grouped fused path: per-scale sub-chunks at TRUE shapes (no padding
    # waste: ~2.5x fewer conv FLOPs than the padded canvas). Each chunk
    # visits every scale once with n_steps / n_scales steps, in a shuffled
    # order — deterministic uniform counts instead of the reference's
    # i.i.d. multinomial scale draw (identical marginals; the reference's
    # distribution is uniform anyway under train_full_t, trainer.py:193-197)
    # ------------------------------------------------------------------
    def _build_scale_chunk_fn(self):
        model, sched, cfg = self.model, self.sched, self.cfg
        opt = self.opt
        loss_type = self.diff_cfg.loss_type
        G = cfg.grad_accumulate
        B = cfg.train_batch_size
        batch_sharding = self._batch_sharding

        if loss_type not in ("l1", "l2", "l1_pred_img"):
            return None

        @functools.partial(
            jax.jit, static_argnames=("s", "n_steps"), donate_argnums=(0,)
        )
        def scale_chunk_fn(
            state: TrainState, x_orig, x_blur, key, s: int, n_steps: int
        ):
            def one_step(state: TrainState, step_key):
                def loss_fn(params):
                    def model_fn(x, t, sc):
                        x_in = (
                            jax.lax.with_sharding_constraint(x, batch_sharding)
                            if batch_sharding is not None
                            else x
                        )
                        return model.apply({"params": params}, x_in, t, sc)

                    keys = jax.random.split(step_key, G)
                    losses = [
                        training_loss(
                            model_fn, sched, keys[g], x_orig, x_blur,
                            s=s, batch_size=B, loss_type=loss_type,
                        )
                        for g in range(G)
                    ]
                    return jnp.mean(jnp.stack(losses))

                loss, grads = jax.value_and_grad(loss_fn)(state.params)
                updates, opt_state = opt.update(
                    grads, state.opt_state, state.params
                )
                params = optax.apply_updates(state.params, updates)
                ema = _ema_update(state.ema_params, params, state.step, cfg)
                return (
                    TrainState(
                        step=state.step + 1,
                        params=params,
                        ema_params=ema,
                        opt_state=opt_state,
                    ),
                    loss,
                )

            keys = jax.random.split(key, n_steps)
            state, losses = jax.lax.scan(one_step, state, keys)
            return state, losses

        return scale_chunk_fn

    def train_chunk_grouped(self, n_steps: int) -> np.ndarray:
        """n_steps fused steps as shuffled per-scale sub-chunks."""
        assert self._scale_chunk_fn is not None
        n_scales = self.pyramid.n_scales
        per = max(n_steps // n_scales, 1)
        order = self._rng.permutation(n_scales)
        losses = []
        done = 0
        for idx, s in enumerate(order):
            k = per if idx < n_scales - 1 else max(n_steps - done, 0)
            k = min(k, n_steps - done)
            if k <= 0:
                break
            self.key, sub = jax.random.split(self.key)
            x_orig, x_blur = self.data_list[int(s)]
            self.state, ls = self._scale_chunk_fn(
                self.state, x_orig, x_blur, self._stage(sub), int(s), int(k)
            )
            losses.append(np.asarray(ls))
            self.running_scale.extend([int(s)] * int(k))
            done += k
        return np.concatenate(losses) if losses else np.zeros((0,))

    def train_chunk(self, n_steps: int) -> np.ndarray:
        """Run n_steps fused steps in one device call; returns the losses."""
        assert self._chunk_fn is not None, (
            f"fused path unsupported for loss_type={self.diff_cfg.loss_type}"
        )
        self.key, sub = jax.random.split(self.key)
        self.state, losses, s_seq = self._chunk_fn(
            self.state, self._orig_p, self._blur_p, self._mask_p,
            self._stage(sub), n_steps,
        )
        self.running_scale.extend(np.asarray(s_seq).tolist())
        return np.asarray(losses)

    # ------------------------------------------------------------------
    # outer loop
    # ------------------------------------------------------------------
    @property
    def step(self) -> int:
        return int(self.state.step)

    def train(
        self,
        fused: bool = True,
        on_milestone: Optional[Callable[[int, "MultiscaleTrainer"], None]] = None,
        log_fn: Callable[[str], None] = print,
    ) -> None:
        """Train to cfg.train_num_steps, checkpointing every
        cfg.save_and_sample_every steps (reference trainer.py:189-224)."""
        cfg = self.cfg
        loss_window: List[float] = []
        t0 = time.time()
        grouped = (
            cfg.fused_mode == "grouped" and self._scale_chunk_fn is not None
        )
        while self.step < cfg.train_num_steps:
            if fused and self._chunk_fn is not None and cfg.steps_per_chunk > 1:
                boundary = min(
                    cfg.train_num_steps,
                    self.step
                    + cfg.save_and_sample_every
                    - self.step % cfg.save_and_sample_every,
                )
                n = min(cfg.steps_per_chunk, boundary - self.step)
                losses = (
                    self.train_chunk_grouped(n) if grouped else self.train_chunk(n)
                )
                loss_window.extend(losses.tolist())
            else:
                loss_window.append(self.train_step())

            while len(loss_window) >= cfg.avg_window:
                window = loss_window[: cfg.avg_window]
                loss_window = loss_window[cfg.avg_window :]
                avg = float(np.mean(window))
                self.running_loss.append(avg)
                sps = self.step / max(time.time() - t0, 1e-9)
                log_fn(f"step:{self.step} loss:{avg:.5f} ({sps:.1f} steps/s)")

            if self.step % cfg.save_and_sample_every == 0 and self.step > 0:
                milestone = self.step // cfg.save_and_sample_every
                self.save(milestone)
                if on_milestone is not None:
                    on_milestone(milestone, self)
        log_fn("training completed")

    # ------------------------------------------------------------------
    # checkpointing (orbax) — includes opt state, unlike the reference
    # ------------------------------------------------------------------
    def _ckpt_dir(self, milestone: int) -> Path:
        return (self.results_folder / f"model-{milestone}").absolute()

    def save(self, milestone: int) -> None:
        import orbax.checkpoint as ocp

        path = self._ckpt_dir(milestone)
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(
            path,
            {
                "step": self.state.step,
                "params": self.state.params,
                "ema": self.state.ema_params,
                "opt_state": self.state.opt_state,
            },
            force=True,
        )
        ckptr.wait_until_finished()
        if jax.process_index() != 0:
            # multi-host: the orbax save above is collective (each process
            # commits its addressable shards), host-side artifacts are not
            return
        (self.results_folder / f"model-{milestone}.loss.json").write_text(
            json.dumps({"running_loss": self.running_loss})
        )
        # running-loss curve (reference trainer.py:171-177)
        try:
            import matplotlib

            matplotlib.use("Agg")
            from matplotlib import pyplot as plt

            plt.figure(figsize=(16, 8))
            plt.plot(self.running_loss)
            plt.grid(True)
            plt.ylim((0, 0.2))
            plt.savefig(str(self.results_folder / "running_loss.png"))
            plt.close()
        except Exception:
            pass

    def latest_milestone(self) -> Optional[int]:
        """Highest milestone with a checkpoint in results_folder (or None)."""
        found = [
            int(p.name.split("-")[1])
            for p in self.results_folder.glob("model-*")
            if p.is_dir() and p.name.split("-")[1].isdigit()
        ]
        return max(found) if found else None

    def load(self, milestone: int) -> None:
        """Restore a milestone; milestone=-1 resumes from the latest one
        (elastic-recovery convenience the reference lacks, SURVEY §5)."""
        if milestone == -1:
            latest = self.latest_milestone()
            if latest is None:
                raise FileNotFoundError(
                    f"no checkpoints under {self.results_folder}"
                )
            milestone = latest
        self.load_path(self._ckpt_dir(milestone))
        loss_file = self.results_folder / f"model-{milestone}.loss.json"
        if loss_file.exists():
            self.running_loss = json.loads(loss_file.read_text())["running_loss"]

    def load_path(self, path) -> None:
        """Restore state from any orbax checkpoint directory."""
        import orbax.checkpoint as ocp

        ckptr = ocp.StandardCheckpointer()
        template = {
            "step": self.state.step,
            "params": self.state.params,
            "ema": self.state.ema_params,
            "opt_state": self.state.opt_state,
        }
        if self.mesh is not None:
            # restore directly as global replicated arrays over the mesh
            # (single- OR multi-process): an abstract template with a
            # sharding makes orbax assemble the global array — the only
            # correct path under multi-host, where a post-hoc device_put
            # of process-local arrays cannot build a global array
            from jax.sharding import NamedSharding, PartitionSpec as P

            repl = NamedSharding(self.mesh, P())
            template = jax.tree.map(
                lambda x: jax.ShapeDtypeStruct(
                    jnp.shape(x), x.dtype, sharding=repl
                ),
                template,
            )
        restored = ckptr.restore(Path(path).absolute(), template)
        self.state = TrainState(
            step=jnp.asarray(restored["step"], jnp.int32),
            params=restored["params"],
            ema_params=restored["ema"],
            opt_state=restored["opt_state"],
        )

    # ------------------------------------------------------------------
    def ema_model_fn(self):
        """model_fn closure over EMA params — all sampling/apps use EMA
        (reference trainer.py:218,261,269)."""
        params = self.state.ema_params
        model = self.model

        def model_fn(x, t, s):
            return model.apply({"params": params}, x, t, s)

        return model_fn
