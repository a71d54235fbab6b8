import os as _os, sys as _sys, time
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))
import sys
import jax
from sinddm_tpu import build_pyramid, make_schedules
from sinddm_tpu.apps.clip_apps import clip_sampling
from sinddm_tpu.guidance.clip_extractor import ClipExtractor
from sinddm_tpu.models import SinDDMNet
from sinddm_tpu.models.clip.convert import random_clip_params
from sinddm_tpu.models.clip.model import tiny_clip_config

precompile = sys.argv[1] == "1"
pyr = build_pyramid("/root/reference/datasets/balloons/balloons.png")
sched = make_schedules(timesteps=100, scale_losses=pyr.rescale_losses, n_scales=pyr.n_scales)
model = SinDDMNet(dim=160)
key = jax.random.PRNGKey(0)
h0, w0 = pyr.sizes_hw[0]
params = model.init(key, jax.numpy.zeros((1, h0, w0, 3)),
                    jax.numpy.zeros((1,), jax.numpy.int32), jax.numpy.asarray(0.0))["params"]
clip_model, clip_vars = random_clip_params(tiny_clip_config(), seed=0)
extractor = ClipExtractor(clip_model, clip_vars, n_aug=16)
t0 = time.time()
outs, aux = clip_sampling(
    model, params, sched, pyr, extractor, key,
    text_input="fire", strength=0.3, sample_batch_size=4,
    guidance_sub_iters=[0, 1, 1, 1, 1], quantile=0.8, llambda=0.2,
    precompile=precompile,
)
float(outs[-1].sum())
print(f"guided precompile={precompile} cold compile+first-run: {time.time()-t0:.1f}s", flush=True)
