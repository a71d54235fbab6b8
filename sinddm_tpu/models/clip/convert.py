"""Convert OpenAI CLIP checkpoints (torch) to flax parameter pytrees.

The reference downloads ViT-B/32 at runtime with a SHA256 check
(``clip/clip.py:42-71``); this environment has no egress, so weights are
supplied as a local file (``--clip_weights``) — either the original
TorchScript archive or a plain state dict — and converted here once.
``random_clip_params`` builds an equivalently-shaped random tree for
tests/fixtures (SURVEY §4.5: guidance math must be testable without the
150M-param download).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from sinddm_tpu.models.clip.model import CLIPConfig, CLIPModel, VIT_B_32


def load_torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    try:
        model = torch.jit.load(path, map_location="cpu")
        sd = model.state_dict()
    except RuntimeError:
        sd = torch.load(path, map_location="cpu")
        if isinstance(sd, dict) and "state_dict" in sd:
            sd = sd["state_dict"]
    return {k: v.float().numpy() for k, v in sd.items()}


def config_from_state_dict(sd: Dict[str, np.ndarray]) -> CLIPConfig:
    """Infer the CLIPConfig (build_model parity, clip/model.py:445-466)."""
    vision_width = sd["visual.conv1.weight"].shape[0]
    vision_patch_size = sd["visual.conv1.weight"].shape[-1]
    grid = int(round((sd["visual.positional_embedding"].shape[0] - 1) ** 0.5))
    vision_layers = len(
        {k.split(".")[3] for k in sd if k.startswith("visual.transformer.resblocks.")}
    )
    return CLIPConfig(
        embed_dim=sd["text_projection"].shape[1],
        image_resolution=grid * vision_patch_size,
        vision_layers=vision_layers,
        vision_width=vision_width,
        vision_patch_size=vision_patch_size,
        context_length=sd["positional_embedding"].shape[0],
        vocab_size=sd["token_embedding.weight"].shape[0],
        transformer_width=sd["ln_final.weight"].shape[0],
        transformer_heads=sd["ln_final.weight"].shape[0] // 64,
        transformer_layers=len(
            {
                k.split(".")[2]
                for k in sd
                if k.startswith("transformer.resblocks.")
            }
        ),
    )


def _block(sd: Dict[str, np.ndarray], prefix: str) -> Dict[str, Any]:
    return {
        "ln_1": {"scale": sd[f"{prefix}.ln_1.weight"], "bias": sd[f"{prefix}.ln_1.bias"]},
        "ln_2": {"scale": sd[f"{prefix}.ln_2.weight"], "bias": sd[f"{prefix}.ln_2.bias"]},
        "attn": {
            "in_proj": {
                "kernel": sd[f"{prefix}.attn.in_proj_weight"].T,
                "bias": sd[f"{prefix}.attn.in_proj_bias"],
            },
            "out_proj": {
                "kernel": sd[f"{prefix}.attn.out_proj.weight"].T,
                "bias": sd[f"{prefix}.attn.out_proj.bias"],
            },
        },
        "c_fc": {
            "kernel": sd[f"{prefix}.mlp.c_fc.weight"].T,
            "bias": sd[f"{prefix}.mlp.c_fc.bias"],
        },
        "c_proj": {
            "kernel": sd[f"{prefix}.mlp.c_proj.weight"].T,
            "bias": sd[f"{prefix}.mlp.c_proj.bias"],
        },
    }


def convert_state_dict(sd: Dict[str, np.ndarray], cfg: CLIPConfig) -> Dict[str, Any]:
    """torch state dict -> flax params for :class:`CLIPModel`."""
    params: Dict[str, Any] = {}
    vis: Dict[str, Any] = {
        "conv1": {"kernel": sd["visual.conv1.weight"].transpose(2, 3, 1, 0)},
        "class_embedding": sd["visual.class_embedding"],
        "positional_embedding": sd["visual.positional_embedding"],
        "ln_pre": {
            "scale": sd["visual.ln_pre.weight"],
            "bias": sd["visual.ln_pre.bias"],
        },
        "ln_post": {
            "scale": sd["visual.ln_post.weight"],
            "bias": sd["visual.ln_post.bias"],
        },
        "proj": sd["visual.proj"],
        "transformer": {
            f"resblocks_{i}": _block(sd, f"visual.transformer.resblocks.{i}")
            for i in range(cfg.vision_layers)
        },
    }
    params["visual"] = vis
    params["transformer"] = {
        f"resblocks_{i}": _block(sd, f"transformer.resblocks.{i}")
        for i in range(cfg.transformer_layers)
    }
    params["token_embedding"] = {"embedding": sd["token_embedding.weight"]}
    params["positional_embedding"] = sd["positional_embedding"]
    params["ln_final"] = {
        "scale": sd["ln_final.weight"],
        "bias": sd["ln_final.bias"],
    }
    params["text_projection"] = sd["text_projection"]
    params["logit_scale"] = sd["logit_scale"]
    return jax.tree.map(jnp.asarray, params)


def load_clip(path: str, compute_dtype: "str | None" = None):
    """Load a torch CLIP checkpoint -> (CLIPModel, params).

    ``compute_dtype='bfloat16'`` runs the vision tower at MXU rate (the
    TPU analog of the reference's fp16 CLIP, clip/model.py:421-442).
    """
    import dataclasses

    sd = load_torch_state_dict(path)
    cfg = config_from_state_dict(sd)
    if compute_dtype:
        cfg = dataclasses.replace(cfg, compute_dtype=compute_dtype)
    model = CLIPModel(cfg)
    return model, {"params": convert_state_dict(sd, cfg)}


def find_clip_weights() -> "str | None":
    """Sniff for a real ViT-B/32 checkpoint at the documented paths.

    Zero-egress environments cannot download the weights (reference
    ``clip/clip.py:42-71`` downloads with a SHA256 check); the moment a
    file appears at any of these locations, every CLIP mode and the
    CLIP-feature SIFID run against it with no code changes (see
    docs/REAL_CLIP.md):

    1. ``$SINDDM_CLIP_WEIGHTS``
    2. ``<repo>/checkpoints/ViT-B-32.pt``
    3. ``~/.cache/clip/ViT-B-32.pt`` (the reference's own download dir)
    """
    import os

    candidates = [os.environ.get("SINDDM_CLIP_WEIGHTS")]
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.abspath(os.path.join(here, "..", "..", ".."))
    candidates.append(os.path.join(repo, "checkpoints", "ViT-B-32.pt"))
    candidates.append(os.path.expanduser("~/.cache/clip/ViT-B-32.pt"))
    for c in candidates:
        if c and os.path.isfile(c):
            return c
    return None


def random_clip_params(cfg: CLIPConfig, seed: int = 0):
    """Random-init params of the right shapes (test fixture)."""
    model = CLIPModel(cfg)
    imgs = jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3))
    toks = jnp.zeros((1, cfg.context_length), jnp.int32)
    variables = model.init(jax.random.PRNGKey(seed), imgs, toks)
    return model, variables
