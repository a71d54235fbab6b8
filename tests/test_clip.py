"""CLIP stack: tokenizer goldens, model shapes, torch parity, conversion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sinddm_tpu.models.clip.model import (
    CLIPModel,
    VIT_B_32,
    clip_normalize,
    tiny_clip_config,
)
from sinddm_tpu.models.clip.tokenizer import SimpleTokenizer, tokenize


@pytest.fixture(scope="module")
def tiny_clip():
    from sinddm_tpu.models.clip.convert import random_clip_params

    return random_clip_params(tiny_clip_config(), seed=0)


def test_tokenizer_known_ids():
    tok = SimpleTokenizer()
    # golden: standard OpenAI CLIP BPE ids
    assert tok.encode("a photo of a cat") == [320, 1125, 539, 320, 2368]
    assert tok.sot_token == 49406
    assert tok.eot_token == 49407
    assert len(tok.encoder) == 49408


def test_tokenize_matrix():
    t = tokenize(["a photo of a cat", "hello world"])
    assert t.shape == (2, 77)
    assert t[0, 0] == 49406
    assert t[0, 6] == 49407
    assert t[0, 7:].sum() == 0
    with pytest.raises(RuntimeError):
        tokenize("word " * 100)
    tr = tokenize("word " * 100, truncate=True)
    assert tr.shape == (1, 77) and tr[0, -1] == 49407


def test_clip_encoders_shapes(tiny_clip):
    model, variables = tiny_clip
    cfg = model.cfg
    img = jnp.zeros((2, cfg.image_resolution, cfg.image_resolution, 3))
    emb = model.apply(variables, img, method=model.encode_image)
    assert emb.shape == (2, cfg.embed_dim)
    toks = jnp.asarray(tokenize(["a cat", "a dog"]))
    temb = model.apply(variables, toks, method=model.encode_text)
    assert temb.shape == (2, cfg.embed_dim)


def test_clip_arbitrary_resolution(tiny_clip):
    """Interpolated positional embedding admits non-square inputs
    (the Text2LIVE modification, reference clip/model.py:221-246)."""
    model, variables = tiny_clip
    for h, w in [(48, 64), (64, 48), (40, 40)]:
        img = jax.random.normal(jax.random.PRNGKey(0), (1, h, w, 3))
        emb = model.apply(variables, img, method=model.encode_image)
        assert emb.shape == (1, model.cfg.embed_dim)
        assert np.isfinite(np.asarray(emb)).all()


def test_clip_image_grad_flows(tiny_clip):
    """Guidance needs d(embedding)/d(image)."""
    model, variables = tiny_clip

    def loss(x):
        e = model.apply(variables, x, method=model.encode_image)
        return jnp.sum(e**2)

    x = jax.random.normal(jax.random.PRNGKey(1), (1, 32, 32, 3))
    g = jax.grad(loss)(x)
    assert g.shape == x.shape
    assert float(jnp.abs(g).max()) > 0


def test_eot_pooling_uses_highest_token(tiny_clip):
    """Text features come from the EOT position (argmax of ids)."""
    model, variables = tiny_clip
    toks = np.zeros((1, 77), np.int32)
    toks[0, 0] = 49406
    toks[0, 1] = 320
    toks[0, 2] = 49407
    e1 = model.apply(variables, jnp.asarray(toks), method=model.encode_text)
    # garbage AFTER the EOT position must not change the embedding
    toks2 = toks.copy()
    toks2[0, 10] = 5  # low id, argmax still at EOT
    e2 = model.apply(variables, jnp.asarray(toks2), method=model.encode_text)
    # causal mask => positions after EOT can't affect EOT's representation
    np.testing.assert_allclose(np.asarray(e1), np.asarray(e2), atol=1e-5)


def test_mha_matches_torch():
    """Our fused-qkv attention == torch.nn.MultiheadAttention forward."""
    torch = pytest.importorskip("torch")
    from sinddm_tpu.models.clip.model import MultiheadAttention

    W, H, L, B = 32, 4, 7, 2
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, L, W)).astype(np.float32)
    in_w = rng.normal(size=(3 * W, W)).astype(np.float32) * 0.1
    in_b = rng.normal(size=(3 * W,)).astype(np.float32) * 0.1
    out_w = rng.normal(size=(W, W)).astype(np.float32) * 0.1
    out_b = rng.normal(size=(W,)).astype(np.float32) * 0.1

    mod = MultiheadAttention(W, H)
    params = {
        "in_proj": {"kernel": jnp.asarray(in_w.T), "bias": jnp.asarray(in_b)},
        "out_proj": {"kernel": jnp.asarray(out_w.T), "bias": jnp.asarray(out_b)},
    }
    mask = jnp.triu(jnp.full((L, L), -jnp.inf), k=1)
    ours = mod.apply({"params": params}, jnp.asarray(x), mask)

    mha = torch.nn.MultiheadAttention(W, H, batch_first=True)
    with torch.no_grad():
        mha.in_proj_weight.copy_(torch.from_numpy(in_w))
        mha.in_proj_bias.copy_(torch.from_numpy(in_b))
        mha.out_proj.weight.copy_(torch.from_numpy(out_w))
        mha.out_proj.bias.copy_(torch.from_numpy(out_b))
    tmask = torch.triu(torch.full((L, L), float("-inf")), diagonal=1)
    expected, _ = mha(
        torch.from_numpy(x), torch.from_numpy(x), torch.from_numpy(x),
        attn_mask=tmask, need_weights=False,
    )
    np.testing.assert_allclose(
        np.asarray(ours), expected.detach().numpy(), atol=2e-5
    )


def test_convert_state_dict_roundtrip():
    """A synthetic torch-layout state dict converts and runs."""
    from sinddm_tpu.models.clip.convert import (
        config_from_state_dict,
        convert_state_dict,
    )

    from clip_sd_util import make_torch_clip_state_dict

    cfg = tiny_clip_config()
    sd = make_torch_clip_state_dict(cfg)

    import dataclasses

    inferred = config_from_state_dict(sd)
    # the width//64 head rule only applies to real CLIP widths (512 -> 8)
    assert dataclasses.replace(inferred, transformer_heads=cfg.transformer_heads) == cfg
    params = convert_state_dict(sd, cfg)
    model = CLIPModel(cfg)
    img = jnp.zeros((1, cfg.image_resolution, cfg.image_resolution, 3))
    toks = jnp.asarray(tokenize("a cat"))
    logits, logits_t = model.apply({"params": params}, img, toks)
    assert logits.shape == (1, 1)
    assert np.isfinite(np.asarray(logits)).all()
