from sinddm_tpu.ops.resize import resize_bilinear, resize_nearest  # noqa: F401
