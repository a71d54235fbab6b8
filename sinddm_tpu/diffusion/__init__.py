from sinddm_tpu.diffusion.core import (  # noqa: F401
    p_losses,
    p_sample_step,
    predict_start_from_noise,
    q_posterior,
    q_sample,
    sample_scale0,
    sample_via_scale,
)
