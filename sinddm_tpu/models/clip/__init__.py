from sinddm_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize  # noqa: F401
