"""CLIP (ViT + text transformer) in flax, with interpolatable pos-embedding.

Architecture contract: OpenAI CLIP ViT-B/32 (the only tower the reference
uses, ``main.py:156``) plus the Text2LIVE modification the guidance stack
depends on — bicubic interpolation of the vision positional embedding so
the encoder accepts **arbitrary input resolutions** (reference
``clip/model.py:221-246``, from DINO). The reference flattens the
interpolated grid transposed relative to the patch tokens for non-square
inputs; that quirk is replicated for parity (see
``_interpolate_pos_embedding``).

TPU-first: NHWC patchify conv, fused qkv projection (one [W, 3W] matmul
on the MXU), everything jit/grad-compatible — CLIP guidance differentiates
through this encoder (``jax.grad`` replaces the reference's
``torch.autograd.grad``, ``SinDDM/models.py:387``).
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax.ad_checkpoint import checkpoint_name


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    embed_dim: int = 512
    image_resolution: int = 224
    vision_layers: int = 12
    vision_width: int = 768
    vision_patch_size: int = 32
    context_length: int = 77
    vocab_size: int = 49408
    transformer_width: int = 512
    transformer_heads: int = 8
    transformer_layers: int = 12
    # 'bfloat16' runs the vision tower's matmuls at MXU rate with float32
    # params and float32 LayerNorms — the TPU analog of the reference's
    # fp16 CLIP (clip/model.py:421-442 converts weights to half and keeps
    # LayerNorm fp32). None/'float32' = full fp32.
    compute_dtype: Optional[str] = None
    # Attention executor experiment knob (benchmarks/tower_bench.py):
    # 'einsum' is the production path; 'skip' replaces softmax(qk^T)v with
    # v — NUMERICALLY WRONG, used only to measure the attention math's
    # total wall share (the upper bound on any fused-attention win).
    attn_impl: str = "einsum"

    @property
    def vision_heads(self) -> int:
        return self.vision_width // 64

    @property
    def vision_dtype(self):
        return jnp.bfloat16 if self.compute_dtype == "bfloat16" else jnp.float32


VIT_B_32 = CLIPConfig()

# normalization constants (reference text2live_util/clip_extractor.py:30-32)
CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


def tiny_clip_config() -> CLIPConfig:
    """A miniature CLIP for tests/fixtures (no 150M-param download)."""
    return CLIPConfig(
        embed_dim=32,
        image_resolution=32,
        vision_layers=2,
        vision_width=64,
        vision_patch_size=8,
        context_length=77,
        vocab_size=49408,
        transformer_width=32,
        transformer_heads=2,
        transformer_layers=2,
    )


def quick_gelu(x: jnp.ndarray) -> jnp.ndarray:
    return x * jax.nn.sigmoid(1.702 * x)


class MultiheadAttention(nn.Module):
    """Torch-layout MHA: fused qkv Dense + out projection."""

    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "einsum"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        B, L, W = x.shape
        hd = W // self.heads
        qkv = nn.Dense(3 * W, dtype=self.dtype, name="in_proj")(x)  # [B, L, 3W]
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads_split(t):
            return t.reshape(B, L, self.heads, hd).transpose(0, 2, 1, 3)

        q, k, v = map(heads_split, (q, k, v))
        if self.attn_impl == "skip":
            # experiment-only upper bound: drop the attention math entirely
            out = v
        else:
            attn = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(hd)
            if mask is not None:
                attn = attn + mask
            attn = jax.nn.softmax(attn, axis=-1)
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, L, W)
        return nn.Dense(W, dtype=self.dtype, name="out_proj")(out)


class ResidualAttentionBlock(nn.Module):
    width: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "einsum"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        # LayerNorms stay float32 (reference fp32 LayerNorm inside the fp16
        # CLIP, clip/model.py:154-160); Dense layers compute in self.dtype
        x = x + MultiheadAttention(
            self.width, self.heads, self.dtype, self.attn_impl, name="attn"
        )(nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_1")(x), mask)
        h = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="ln_2")(x)
        h = nn.Dense(self.width * 4, dtype=self.dtype, name="c_fc")(h)
        h = quick_gelu(h)
        h = nn.Dense(self.width, dtype=self.dtype, name="c_proj")(h)
        return x + h


class TransformerStack(nn.Module):
    width: int
    layers: int
    heads: int
    dtype: jnp.dtype = jnp.float32
    attn_impl: str = "einsum"

    @nn.compact
    def __call__(self, x: jnp.ndarray, mask: Optional[jnp.ndarray] = None):
        for i in range(self.layers):
            x = ResidualAttentionBlock(
                self.width, self.heads, self.dtype, self.attn_impl,
                name=f"resblocks_{i}"
            )(x, mask)
        return x


def _interpolate_pos_embedding(
    pos: jnp.ndarray, h: int, w: int, patch_size: int
) -> jnp.ndarray:
    """Bicubic-resize the [N+1, width] pos embedding to an h x w image.

    Replicates reference ``clip/model.py:221-246`` including its
    transposed flatten for non-square grids: the grid is resized to
    (W/ps, H/ps) and flattened in that order.
    """
    n = pos.shape[0] - 1
    side = int(math.sqrt(n))
    hp, wp = h // patch_size, w // patch_size
    if hp * wp == n and h == w:
        return pos
    cls_pos, patch_pos = pos[:1], pos[1:]
    grid = patch_pos.reshape(side, side, -1)
    # reference resizes to (w0, h0) then flattens row-major — replicate
    resized = jax.image.resize(
        grid, (wp, hp, grid.shape[-1]), method="bicubic"
    ).reshape(wp * hp, -1)
    return jnp.concatenate([cls_pos, resized], axis=0)


class VisionTransformer(nn.Module):
    cfg: CLIPConfig

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, return_tokens: bool = False
    ) -> jnp.ndarray:
        """x: [B, H, W, 3] (already CLIP-normalized) -> [B, embed_dim].

        With ``return_tokens=True``, returns the post-transformer patch
        tokens [B, Hp*Wp, width] (CLS dropped, no ln_post/proj) — the
        analog of the reference's ``transformer_first_blocks_forward``
        token exposure (``clip/model.py:259-273``), used for
        CLIP-feature SIFID.
        """
        cfg = self.cfg
        B, H, W, _ = x.shape
        ps = cfg.vision_patch_size
        x = nn.Conv(
            cfg.vision_width, (ps, ps), strides=(ps, ps), use_bias=False,
            padding="VALID", dtype=cfg.vision_dtype,
            name="conv1",  # torch Conv2d: no padding
        )(x)
        # named remat residual: guidance's save_only_these_names policy
        # keeps the post-patchify tokens so a backward replay never
        # re-runs conv1 (guidance/clip_extractor.embed_image_views)
        x = checkpoint_name(x, "vit_patches")
        x = x.astype(jnp.float32)
        x = x.reshape(B, -1, cfg.vision_width)  # [B, Hp*Wp, width]
        cls = self.param(
            "class_embedding",
            lambda k: jax.random.normal(k, (cfg.vision_width,))
            * cfg.vision_width ** -0.5,
        )
        x = jnp.concatenate(
            [jnp.broadcast_to(cls, (B, 1, cfg.vision_width)), x], axis=1
        )
        n_pos = (cfg.image_resolution // ps) ** 2 + 1
        pos = self.param(
            "positional_embedding",
            lambda k: jax.random.normal(k, (n_pos, cfg.vision_width))
            * cfg.vision_width ** -0.5,
        )
        x = x + _interpolate_pos_embedding(pos, H, W, ps)[None]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_pre")(x)
        x = TransformerStack(
            cfg.vision_width, cfg.vision_layers, cfg.vision_heads,
            cfg.vision_dtype, cfg.attn_impl, name="transformer",
        )(x)
        x = x.astype(jnp.float32)
        if return_tokens:
            return x[:, 1:, :]
        x = nn.LayerNorm(epsilon=1e-5, name="ln_post")(x[:, 0, :])
        proj = self.param(
            "proj",
            lambda k: jax.random.normal(k, (cfg.vision_width, cfg.embed_dim))
            * cfg.vision_width ** -0.5,
        )
        return x @ proj


class CLIPModel(nn.Module):
    """Image/text encoders; method-selectable apply.

    ``apply(vars, images, method='encode_image')`` /
    ``apply(vars, tokens, method='encode_text')``.
    """

    cfg: CLIPConfig = VIT_B_32

    def setup(self):
        cfg = self.cfg
        self.visual = VisionTransformer(cfg, name="visual")
        self.transformer = TransformerStack(
            cfg.transformer_width, cfg.transformer_layers, cfg.transformer_heads,
            name="transformer",
        )
        self.token_embedding = nn.Embed(
            cfg.vocab_size, cfg.transformer_width, name="token_embedding"
        )
        self.positional_embedding = self.param(
            "positional_embedding",
            lambda k: jax.random.normal(
                k, (cfg.context_length, cfg.transformer_width)
            )
            * 0.01,
        )
        self.ln_final = nn.LayerNorm(epsilon=1e-5, name="ln_final")
        self.text_projection = self.param(
            "text_projection",
            lambda k: jax.random.normal(
                k, (cfg.transformer_width, cfg.embed_dim)
            )
            * cfg.transformer_width ** -0.5,
        )
        self.logit_scale = self.param(
            "logit_scale", lambda k: jnp.asarray(np.log(1 / 0.07), jnp.float32)
        )

    def encode_image(self, images: jnp.ndarray) -> jnp.ndarray:
        return self.visual(images)

    def encode_image_tokens(self, images: jnp.ndarray) -> jnp.ndarray:
        """Post-transformer patch tokens [B, Hp*Wp, width] (no CLS/proj)."""
        return self.visual(images, return_tokens=True)

    def encode_text(self, tokens: jnp.ndarray) -> jnp.ndarray:
        cfg = self.cfg
        x = self.token_embedding(tokens)  # [B, L, W]
        x = x + self.positional_embedding[None, : x.shape[1]]
        L = x.shape[1]
        mask = jnp.triu(jnp.full((L, L), -jnp.inf), k=1)
        x = self.transformer(x, mask)
        x = self.ln_final(x)
        # EOT token = highest id in each row (reference clip/model.py:400)
        eot = jnp.argmax(tokens, axis=-1)
        x = x[jnp.arange(x.shape[0]), eot]
        return x @ self.text_projection

    def __call__(self, images, tokens):
        img = self.encode_image(images)
        txt = self.encode_text(tokens)
        img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
        txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
        scale = jnp.exp(self.logit_scale)
        logits = scale * img @ txt.T
        return logits, logits.T


def clip_normalize(x01: jnp.ndarray) -> jnp.ndarray:
    """Normalize [B, H, W, 3] images in [0,1] with the CLIP mean/std."""
    mean = jnp.asarray(CLIP_MEAN, x01.dtype)
    std = jnp.asarray(CLIP_STD, x01.dtype)
    return (x01 - mean) / std
