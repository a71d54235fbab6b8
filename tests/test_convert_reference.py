"""Reference-checkpoint import: numerical parity with a torch oracle.

Builds the reference denoiser computation in torch (per the architecture
spec, SURVEY §2.1 #4 / models.py:34-151), runs it with random weights,
converts the state dict with ``denoiser_params_from_state_dict``, and
checks our flax net reproduces the torch outputs — end-to-end layout
parity of the checkpoint importer.
"""

import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from sinddm_tpu.models import SinDDMNet
from sinddm_tpu.models.convert_reference import denoiser_params_from_state_dict


def _torch_oracle(dim=16, device="cpu"):
    """The reference SinDDMNet computation, built from its spec."""
    import torch.nn as nn

    time_dim = 32
    half = dim // 2

    class Block(nn.Module):
        def __init__(self, cin, cout):
            super().__init__()
            self.mlp = nn.Sequential(nn.GELU(), nn.Linear(time_dim, time_dim))
            self.time_reshape = nn.Conv2d(time_dim, cin, 1)
            self.ds_conv = nn.Conv2d(cin, cin, 5, padding=2, groups=cin)
            self.net = nn.Sequential(
                nn.Conv2d(cin, cout, 3, padding=1),
                nn.GELU(),
                nn.Conv2d(cout, cout, 3, padding=1),
            )
            self.res_conv = nn.Conv2d(cin, cout, 1) if cin != cout else nn.Identity()

        def forward(self, x, cond):
            h = self.ds_conv(x)
            c = self.time_reshape(self.mlp(cond)[:, :, None, None])
            h = h + c
            return self.net(h) + self.res_conv(x)

    class Net(nn.Module):
        def __init__(self):
            super().__init__()
            self.time_mlp = nn.Sequential(
                nn.Linear(time_dim * 2, time_dim * 4),
                nn.GELU(),
                nn.Linear(time_dim * 4, time_dim),
            )
            self.l1 = Block(3, half)
            self.l2 = Block(half, dim)
            self.l3 = Block(dim, dim)
            self.l4 = Block(dim, half)
            self.final_conv = nn.Sequential(nn.Conv2d(half, 3, 1))

        def sin_emb(self, x):
            half_d = time_dim // 2
            emb = math.log(10000) / (half_d - 1)
            emb = torch.exp(torch.arange(half_d) * -emb)
            emb = x[:, None] * emb[None, :]
            return torch.cat((emb.sin(), emb.cos()), dim=-1)

        def forward(self, x, t, s):
            ts = torch.cat(
                [self.sin_emb(t), self.sin_emb(torch.ones_like(t) * s)], dim=1
            )
            cond = self.time_mlp(ts)
            x = self.l1(x, cond)
            x = self.l2(x, cond)
            x = self.l3(x, cond)
            x = self.l4(x, cond)
            return self.final_conv(x)

    return Net()


def _rename(sd):
    """torch module names of the oracle -> reference checkpoint names."""
    out = {}
    for k, v in sd.items():
        k = k.replace("mlp.1.", "mlp.1.")  # same
        out["denoise_fn." + k] = v.numpy()
    return out


def test_converted_checkpoint_matches_torch_forward():
    torch.manual_seed(0)
    oracle = _torch_oracle(dim=16)
    oracle.eval()

    x = torch.randn(2, 3, 20, 28)
    t = torch.tensor([7.0, 42.0])
    with torch.no_grad():
        expected = oracle(x, t, 2.0).permute(0, 2, 3, 1).numpy()

    params = denoiser_params_from_state_dict(_rename(oracle.state_dict()))
    model = SinDDMNet(dim=16)
    out = model.apply(
        {"params": params},
        jnp.asarray(x.permute(0, 2, 3, 1).numpy()),
        jnp.asarray([7, 42]),
        jnp.asarray(2.0),
    )
    np.testing.assert_allclose(np.asarray(out), expected, atol=2e-4, rtol=2e-4)


def test_identity_residual_blocks_have_no_res_conv():
    torch.manual_seed(1)
    oracle = _torch_oracle(dim=16)
    params = denoiser_params_from_state_dict(_rename(oracle.state_dict()))
    assert "res_conv" in params["l1"]  # 3 -> 8 expands
    assert "res_conv" not in params["l3"]  # 16 -> 16 identity
