from sinddm_tpu.models.denoiser import SinDDMNet  # noqa: F401
