from sinddm_tpu.apps.sampling import sample_scales  # noqa: F401
