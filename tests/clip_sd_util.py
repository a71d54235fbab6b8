"""Shared test helper: synthesize a torch-layout CLIP state dict.

Mirrors the key/shape layout of the reference's OpenAI checkpoint
(``clip/model.py:445-484`` infers the config from exactly these shapes) so
converter and CLI tests can exercise the real ``--clip_weights`` loading
path without the 150M-param download.
"""

import numpy as np

from sinddm_tpu.models.clip.model import CLIPConfig


def make_torch_clip_state_dict(cfg: CLIPConfig, seed: int = 0) -> dict:
    rng = np.random.default_rng(seed)
    W, V, ps = cfg.vision_width, cfg.transformer_width, cfg.vision_patch_size
    grid = cfg.image_resolution // ps
    sd = {
        "visual.conv1.weight": rng.normal(size=(W, 3, ps, ps)).astype(np.float32) * 0.05,
        "visual.class_embedding": rng.normal(size=(W,)).astype(np.float32),
        "visual.positional_embedding": rng.normal(size=(grid * grid + 1, W)).astype(np.float32),
        "visual.ln_pre.weight": np.ones(W, np.float32),
        "visual.ln_pre.bias": np.zeros(W, np.float32),
        "visual.ln_post.weight": np.ones(W, np.float32),
        "visual.ln_post.bias": np.zeros(W, np.float32),
        "visual.proj": rng.normal(size=(W, cfg.embed_dim)).astype(np.float32) * 0.05,
        "positional_embedding": rng.normal(size=(cfg.context_length, V)).astype(np.float32),
        "text_projection": rng.normal(size=(V, cfg.embed_dim)).astype(np.float32) * 0.05,
        "logit_scale": np.float32(2.6593),
        "token_embedding.weight": rng.normal(size=(cfg.vocab_size, V)).astype(np.float32) * 0.02,
        "ln_final.weight": np.ones(V, np.float32),
        "ln_final.bias": np.zeros(V, np.float32),
    }
    for tower, layers, width in [
        ("visual.transformer", cfg.vision_layers, W),
        ("transformer", cfg.transformer_layers, V),
    ]:
        for i in range(layers):
            p = f"{tower}.resblocks.{i}"
            sd[f"{p}.ln_1.weight"] = np.ones(width, np.float32)
            sd[f"{p}.ln_1.bias"] = np.zeros(width, np.float32)
            sd[f"{p}.ln_2.weight"] = np.zeros(width, np.float32) + 1
            sd[f"{p}.ln_2.bias"] = np.zeros(width, np.float32)
            sd[f"{p}.attn.in_proj_weight"] = rng.normal(size=(3 * width, width)).astype(np.float32) * 0.05
            sd[f"{p}.attn.in_proj_bias"] = np.zeros(3 * width, np.float32)
            sd[f"{p}.attn.out_proj.weight"] = rng.normal(size=(width, width)).astype(np.float32) * 0.05
            sd[f"{p}.attn.out_proj.bias"] = np.zeros(width, np.float32)
            sd[f"{p}.mlp.c_fc.weight"] = rng.normal(size=(4 * width, width)).astype(np.float32) * 0.05
            sd[f"{p}.mlp.c_fc.bias"] = np.zeros(4 * width, np.float32)
            sd[f"{p}.mlp.c_proj.weight"] = rng.normal(size=(width, 4 * width)).astype(np.float32) * 0.05
            sd[f"{p}.mlp.c_proj.bias"] = np.zeros(width, np.float32)
    return sd


def cli_tiny_clip_config() -> CLIPConfig:
    """Tiny config whose shapes survive ``config_from_state_dict``'s real
    head-inference rule (width // 64), so the full ``--clip_weights``
    loading path works end-to-end."""
    return CLIPConfig(
        embed_dim=32,
        image_resolution=32,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=8,
        context_length=77,
        vocab_size=49408,
        transformer_width=64,
        transformer_heads=1,
        transformer_layers=2,
    )
