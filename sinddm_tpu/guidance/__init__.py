from sinddm_tpu.guidance.roi import make_roi_guidance, rescale_bb  # noqa: F401
