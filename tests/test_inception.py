"""InceptionV3 stem port: torch oracle parity + SIFID integration.

Builds the torchvision ``inception_v3`` stem in torch from its spec
(BasicConv2d = Conv(bias=False) + BatchNorm(eps=1e-3) + ReLU; layer
geometry Conv2d_1a..Conv2d_4a + 3x3/s2 maxpools), runs it with random
weights, converts the state dict with ``inception_params_from_state_dict``
and checks the flax stem reproduces the torch features — the same
oracle pattern as tests/test_convert_reference.py. A second test gates on
real weights (auto-skips without a checkpoint file).
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sinddm_tpu.metrics import (
    conv_feature_extractor,
    inception_feature_extractor,
    sifid,
)
from sinddm_tpu.models.inception import (
    find_inception_weights,
    inception_params_from_state_dict,
    inception_stem_features,
    load_inception,
    random_inception_params,
)


def _torch_stem():
    import torch.nn as nn

    class BasicConv2d(nn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = nn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return torch.relu(self.bn(self.conv(x)))

    class Stem(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
            self.pool1 = nn.MaxPool2d(3, stride=2)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.pool2 = nn.MaxPool2d(3, stride=2)

        def forward(self, x, block):
            x = self.Conv2d_2b_3x3(self.Conv2d_2a_3x3(self.Conv2d_1a_3x3(x)))
            x = self.pool1(x)
            if block == "block0":
                return x
            return self.pool2(self.Conv2d_4a_3x3(self.Conv2d_3b_1x1(x)))

    return Stem()


@pytest.mark.parametrize("block", ["block0", "block1"])
def test_stem_matches_torch_oracle(block):
    torch.manual_seed(0)
    stem = _torch_stem()
    # randomize BN stats away from init (running_var=1, mean=0)
    for m in stem.modules():
        if hasattr(m, "running_mean"):
            m.running_mean.normal_(0, 0.3)
            m.running_var.uniform_(0.5, 1.5)
    stem.eval()

    x01 = torch.rand(2, 3, 75, 83)
    with torch.no_grad():
        expected = stem(2 * x01 - 1, block).permute(0, 2, 3, 1).numpy()

    params = inception_params_from_state_dict(
        {k: v.numpy() for k, v in stem.state_dict().items()}
    )
    out = inception_stem_features(
        params, jnp.asarray(x01.permute(0, 2, 3, 1).numpy()), block=block
    )
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-4, rtol=2e-4)


def test_inception_sifid_ranks_corruption_series():
    """Weight-free sanity: Inception-layer SIFID orders a graded noise
    series like the conv proxy (the ranking claim backing metrics.py)."""
    from scipy import stats

    rng = np.random.default_rng(0)
    real = rng.uniform(-1, 1, (96, 128, 3)).astype(np.float32)
    series = [
        np.clip(real + s * rng.standard_normal(real.shape), -1, 1)
        for s in (0.05, 0.2, 0.5, 1.0)
    ]
    f_inc = inception_feature_extractor(random_inception_params(), "block0")
    f_proxy = conv_feature_extractor()
    s_inc = [sifid(real, x, f_inc) for x in series]
    s_proxy = [sifid(real, x, f_proxy) for x in series]
    assert stats.spearmanr(s_inc, s_proxy).statistic > 0.9, (s_inc, s_proxy)


@pytest.mark.skipif(
    find_inception_weights() is None,
    reason="no InceptionV3 checkpoint available (no-egress environment)",
)
def test_real_inception_weights_load_and_extract():
    params = load_inception(find_inception_weights())
    img = np.zeros((96, 128, 3), np.float32)
    feats = inception_feature_extractor(params, "block0")(jnp.asarray(img))
    assert feats.shape[-1] == 64 and np.isfinite(np.asarray(feats)).all()
