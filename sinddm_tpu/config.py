"""Typed configuration for every layer of the framework.

The reference scatters hyperparameters between ~25 argparse flags
(``main.py:13-60``) and hardcoded per-mode constants (``main.py:156-237``,
``trainer.py:73-85``). Here each layer gets one dataclass; the CLI
(`sinddm_tpu.cli`) constructs them from flags with the same defaults.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """Denoiser size. Reference defaults: main.py:34."""

    dim: int = 160
    channels: int = 3
    compute_dtype: str = "float32"  # "bfloat16" for MXU-rate convs


@dataclasses.dataclass(frozen=True)
class DiffusionConfig:
    """Diffusion process knobs. Reference: main.py:36-38,56-58,84-104."""

    timesteps: int = 100
    scale_factor: float = 1.411
    loss_factor: float = 1.0
    loss_type: str = "l1"
    train_full_t: bool = True
    reblurring: bool = True
    sample_limited_t: bool = False
    omega: float = 0.0
    auto_scale: Optional[int] = 50000


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    """Training schedule. Reference: main.py:39-46, trainer.py:68-150."""

    train_batch_size: int = 32
    train_lr: float = 1e-3
    train_num_steps: int = 120001
    grad_accumulate: int = 1
    ema_decay: float = 0.995
    step_start_ema: int = 2000
    update_ema_every: int = 10
    save_and_sample_every: int = 10000
    avg_window: int = 100
    # milestones in steps (reference takes k-steps and multiplies by 1000)
    sched_milestones: Tuple[int, ...] = (20000, 40000, 70000, 80000, 90000, 110000)
    lr_gamma: float = 0.5
    # TPU fast path: number of train steps fused into one device call
    # (lax.scan). 0 disables the fused path.
    steps_per_chunk: int = 100
    # 'grouped': equal per-scale sub-chunks at true shapes (fastest;
    #   deterministic uniform scale counts per chunk instead of the
    #   reference's i.i.d. multinomial draw — identical marginals);
    # 'padded': on-device multinomial scale choice over one padded canvas
    #   (exact reference scale distribution, ~2.5x more conv FLOPs);
    # fused_mode is ignored when steps_per_chunk == 0.
    fused_mode: str = "grouped"


@dataclasses.dataclass(frozen=True)
class SampleConfig:
    """Sampling-time knobs. Reference: main.py:49-51."""

    sample_batch_size: int = 16
    scale_mul: Tuple[float, float] = (1.0, 1.0)
    sample_t_list: Optional[Tuple[int, ...]] = None


@dataclasses.dataclass(frozen=True)
class GuidanceConfig:
    """CLIP guidance knobs. Reference hardcodes per mode: main.py:153-255."""

    clip_model_name: str = "ViT-B/32"
    n_aug: int = 16
    affine_transform_fill: bool = True
    strength: float = 0.3
    quantile: float = 0.8  # = 1 - fill_factor
    llambda: float = 0.0
    stop_guidance: int = 3
    guidance_sub_iters: Tuple[int, ...] = ()
    clip_input_size: int = 224


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device mesh layout: ('data', 'spatial') axes over available devices.

    ``data * spatial`` devices are used; (1, 1) means no mesh. Built by the
    CLI from ``--mesh_data`` / ``--mesh_spatial``.
    """

    data: int = 1
    spatial: int = 1

    @property
    def n_devices(self) -> int:
        return self.data * self.spatial

    def build(self, devices=None):
        """Return a ('data', 'spatial') Mesh, or None for the 1x1 layout.

        Raises ValueError with an actionable message when fewer devices
        are visible than the layout needs.
        """
        if self.n_devices <= 1:
            return None
        import jax

        from sinddm_tpu.parallel.mesh import make_mesh

        devices = list(devices if devices is not None else jax.devices())
        if len(devices) < self.n_devices:
            raise ValueError(
                f"mesh data={self.data} x spatial={self.spatial} needs "
                f"{self.n_devices} devices; only {len(devices)} visible"
            )
        return make_mesh(devices[: self.n_devices], spatial=self.spatial)

    def validate_batch(self, batch_size: int, what: str) -> None:
        """Fail fast when a batch can't be laid out over the data axis.

        ``jax.device_put`` requires the sharded axis length to be divisible
        by the mesh axis size; a mismatch otherwise surfaces as an opaque
        error deep inside jit.
        """
        if self.data > 1 and batch_size % self.data != 0:
            raise ValueError(
                f"{what} ({batch_size}) must be divisible by "
                f"--mesh_data ({self.data})"
            )

    def validate_spatial(self, h: int, what: str) -> None:
        """Like :meth:`validate_batch` for an H axis staged via device_put."""
        if self.spatial > 1 and h % self.spatial != 0:
            raise ValueError(
                f"{what} height ({h}) must be divisible by "
                f"--mesh_spatial ({self.spatial})"
            )
