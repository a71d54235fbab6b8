"""sinddm_tpu — a TPU-native (JAX / XLA / Pallas) single-image diffusion framework.

A from-scratch re-design of the capabilities of SinDDM (ICML 2023,
"SinDDM: A Single Image Denoising Diffusion Model") for TPU hardware:

* the multi-scale image pyramid and its derived noise/reblur schedules
  (reference: ``SinDDM/functions.py``, ``SinDDM/models.py``),
* a small fully-convolutional denoiser conditioned on (timestep, scale)
  (reference: ``SinDDM/models.py:85-151``), built NHWC for the TPU MXU,
* the multi-scale Gaussian diffusion processes — training loss, reverse
  samplers with the SinDDM "reblurring" mechanism — expressed as pure
  functions over explicit state, with every timestep loop a ``lax.scan``,
* a jitted trainer (optax + EMA + orbax checkpoints) whose hot path runs
  entire chunks of training steps in a single device call,
* CLIP-guided / ROI-guided sampling, harmonization and style transfer.

Everything is functional: no mutable module state, explicit PRNG keys,
shardings expressed through a single ``jax.sharding.Mesh``.
"""

__version__ = "0.1.0"

from sinddm_tpu.pyramid import Pyramid, build_pyramid  # noqa: F401
from sinddm_tpu.schedules import Schedules, make_schedules  # noqa: F401
