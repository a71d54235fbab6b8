from sinddm_tpu.training.trainer import MultiscaleTrainer, TrainState  # noqa: F401
