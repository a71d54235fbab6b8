"""Output-fidelity metrics: SIFID / FID machinery with pluggable features.

The SinDDM paper evaluates with SIFID (Single-Image FID, from SinGAN):
the Frechet distance between the *internal patch-feature statistics* of
the real image and of each generated sample, using an InceptionV3 feature
map. The reference repo itself ships no metric code (SURVEY §6); this
module provides the full metric machinery natively:

* :func:`frechet_distance` — the exact FID formula (sqrtm via eigen
  decomposition of the symmetrized product, no scipy needed),
* :func:`patch_feature_stats` / :func:`sifid` — per-image patch-feature
  mean/covariance and the single-image FID between two images,
* feature extractors are pluggable functions ``img -> [N_patches, D]``:
  :func:`conv_feature_extractor` (a random-but-fixed conv net — a
  weight-free proxy usable in a no-egress environment; random-feature
  FIDs are well-correlated with Inception FIDs for ranking) and
  :func:`clip_feature_extractor` (patch tokens of the CLIP ViT, when
  real weights are available via ``--clip_weights``).

* :func:`inception_feature_extractor` — the paper-exact SIFID layer
  (InceptionV3 first-pool features, ``models/inception.py``); the
  architecture+converter are oracle-tested and real torchvision weights
  drop in via ``find_inception_weights`` (this environment cannot
  download them).
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

FeatureFn = Callable[[jnp.ndarray], jnp.ndarray]  # [H,W,3] -> [N, D]


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """||mu1-mu2||^2 + Tr(S1 + S2 - 2 sqrt(S1 S2)) (classic FID)."""
    mu1 = np.asarray(mu1, np.float64)
    mu2 = np.asarray(mu2, np.float64)
    sigma1 = np.asarray(sigma1, np.float64)
    sigma2 = np.asarray(sigma2, np.float64)
    diff = mu1 - mu2
    # sqrtm(S1 @ S2) via the symmetric trick: sqrtm(A B) has the same
    # trace as sqrtm(sqrt(A) B sqrt(A)), which is symmetric PSD
    s1_half = _sqrtm_psd(sigma1)
    inner = s1_half @ sigma2 @ s1_half
    tr_covmean = np.sum(np.sqrt(np.maximum(np.linalg.eigvalsh(inner), 0.0)))
    return float(diff @ diff + np.trace(sigma1) + np.trace(sigma2) - 2.0 * tr_covmean)


def _sqrtm_psd(a: np.ndarray) -> np.ndarray:
    w, v = np.linalg.eigh(a)
    w = np.maximum(w, 0.0)
    return (v * np.sqrt(w)) @ v.T


def patch_feature_stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """[N, D] features -> (mean [D], covariance [D, D])."""
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, sigma


def sifid(
    real_img: np.ndarray,
    fake_img: np.ndarray,
    feature_fn: FeatureFn,
) -> float:
    """Single-image FID between two images' internal patch features."""
    f_real = np.asarray(feature_fn(jnp.asarray(real_img, jnp.float32)))
    f_fake = np.asarray(feature_fn(jnp.asarray(fake_img, jnp.float32)))
    return frechet_distance(
        *patch_feature_stats(f_real), *patch_feature_stats(f_fake)
    )


def sifid_batch(
    real_img: np.ndarray, fake_batch: np.ndarray, feature_fn: FeatureFn
) -> np.ndarray:
    """SIFID of each sample in [B, H, W, 3] against the real image."""
    return np.asarray(
        [sifid(real_img, fake_batch[b], feature_fn) for b in range(len(fake_batch))]
    )


# ---------------------------------------------------------------------------
# feature extractors
# ---------------------------------------------------------------------------


def conv_feature_extractor(dim: int = 64, depth: int = 2, seed: int = 0) -> FeatureFn:
    """A fixed random conv feature map (weight-free SIFID proxy).

    Two 3x3 conv + leaky-relu stages, stride 1 — patch statistics over a
    receptive field comparable to Inception's first block. Deterministic
    given the seed.
    """
    keys = jax.random.split(jax.random.PRNGKey(seed), depth)

    def feature_fn(img: jnp.ndarray) -> jnp.ndarray:
        x = img[None]  # [1, H, W, 3]
        cin = 3
        for d in range(depth):
            k = jax.random.normal(keys[d], (3, 3, cin, dim)) / np.sqrt(
                9 * cin
            )
            x = jax.lax.conv_general_dilated(
                x, k, (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC")
            )
            x = jax.nn.leaky_relu(x, 0.2)
            cin = dim
        return x[0].reshape(-1, dim)

    return feature_fn


def inception_feature_extractor(
    inception_params, block: str = "block0"
) -> FeatureFn:
    """InceptionV3 stem features as the SIFID map (paper-exact layer).

    ``block0`` (64-d, the first-pool output) is the layer SIFID is defined
    on in the SinGAN/SinDDM papers; ``block1`` gives the 192-d second-pool
    features. Build ``inception_params`` with
    :func:`sinddm_tpu.models.inception.load_inception` (real torchvision
    weights, auto-sniffed by ``find_inception_weights``) or
    ``random_inception_params`` (weight-free proxy).
    """
    from sinddm_tpu.models.inception import inception_stem_features

    def feature_fn(img: jnp.ndarray) -> jnp.ndarray:
        x01 = jnp.clip((img + 1.0) * 0.5, 0.0, 1.0)[None]
        feats = inception_stem_features(inception_params, x01, block=block)
        return feats[0].reshape(-1, feats.shape[-1])

    return feature_fn


def clip_feature_extractor(
    clip_model, clip_variables, feature: str = "tokens"
) -> FeatureFn:
    """Patch features of the (frozen) CLIP ViT as the SIFID map.

    ``feature`` selects the representation:

    * ``"tokens"`` — post-transformer patch tokens
      (``CLIPModel.encode_image_tokens``): per-patch features with global
      context, the closest CLIP analog of Inception's pooled mid-level map.
    * ``"conv1"`` — the pre-transformer conv patch embedding alone:
      cheap, purely local (one matmul over patches), the extractor used by
      ``benchmarks/sifid_correlation.py``'s ``tinyclip_conv1`` entry.

    (``encode_image`` itself is unusable here: it pools everything to a
    single CLS embedding, leaving no patch population to take statistics
    over.)
    """
    from sinddm_tpu.models.clip.model import clip_normalize

    if feature not in ("tokens", "conv1"):
        raise ValueError(f"feature must be 'tokens' or 'conv1', got {feature!r}")

    def feature_fn(img: jnp.ndarray) -> jnp.ndarray:
        x01 = jnp.clip((img + 1.0) * 0.5, 0.0, 1.0)[None]
        x = clip_normalize(x01)
        if feature == "tokens":
            toks = clip_model.apply(
                clip_variables, x, method="encode_image_tokens"
            )
            return toks[0]
        ps = clip_model.cfg.vision_patch_size
        kernel = clip_variables["params"]["visual"]["conv1"]["kernel"]
        patches = jax.lax.conv_general_dilated(
            x, kernel, (ps, ps), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return patches[0].reshape(-1, patches.shape[-1])

    return feature_fn
