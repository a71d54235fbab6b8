import os as _os, sys as _sys, time
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import jax
from sinddm_tpu import build_pyramid, make_schedules
from sinddm_tpu.apps import sample_scales
from sinddm_tpu.models import SinDDMNet

precompile = sys.argv[1] == "1"
pyr = build_pyramid("/root/reference/datasets/balloons/balloons.png")
sched = make_schedules(timesteps=100, scale_losses=pyr.rescale_losses, n_scales=pyr.n_scales)
model = SinDDMNet(dim=160)
key = jax.random.PRNGKey(0)
h0, w0 = pyr.sizes_hw[0]
params = model.init(key, jax.numpy.zeros((1, h0, w0, 3)),
                    jax.numpy.zeros((1,), jax.numpy.int32), jax.numpy.asarray(0.0))["params"]
t0 = time.time()
outs = sample_scales(model, params, sched, pyr.sizes_hw, key,
                     scale_factor=pyr.scale_factor, n_scales=pyr.n_scales,
                     batch_size=16, custom_sample=True, precompile=precompile)
float(outs[-1].sum())
print(f"precompile={precompile} cold compile+first-run: {time.time()-t0:.1f}s", flush=True)
