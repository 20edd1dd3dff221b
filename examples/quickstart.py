"""Quickstart: train, evaluate, sample, and serve on synthetic data.

    python examples/quickstart.py

Runs in ~2 minutes on CPU, faster on an attached TPU. Walks the full API
surface: data → model init → compiled training → best-of-K eval → stage-2
sampler → serving Predictor.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import optax

from sttode_tpu.data.batching import scene_batches
from sttode_tpu.data.synthetic import make_social_scenes
from sttode_tpu.evaluation import evaluate_scenes
from sttode_tpu.models import (
    SamplerConfig, STTODEConfig, sampler_init, sttode_init,
)
from sttode_tpu.serving import Predictor
from sttode_tpu.train import (
    make_sampler_train_step, make_train_step, train_epoch,
)

# 1. data — synthetic multi-agent scenes in the framework's scene contract
train_scenes = make_social_scenes(200, seed=0)
test_scenes = make_social_scenes(40, seed=1)

# 2. model — small config; compat="tpu"/agent-axis = masked agent attention
cfg = STTODEConfig(hidden_dim=32, zdim=16, num_heads=4, ff_dim=128,
                   sample_k=20, compat="tpu", attn_axis="agent")
key = jax.random.PRNGKey(0)
key, k_init = jax.random.split(key)
params = sttode_init(k_init, cfg)

# 3. compiled training
opt = optax.adam(1e-3)
opt_state = opt.init(params)
step_fn = make_train_step(cfg, opt, donate=False)
nprng = np.random.default_rng(0)
for epoch in range(5):
    key, k_ep = jax.random.split(key)
    params, opt_state, means = train_epoch(
        step_fn, params, opt_state,
        scene_batches(train_scenes, training=True, rng=nprng,
                      scenes_per_batch=8),
        k_ep)
    print(f"epoch {epoch}: total {means['total']:.3f}")

# 4. best-of-20 evaluation
metrics = evaluate_scenes(params, cfg, test_scenes, jax.random.PRNGKey(7))
print(f"min-ADE {metrics['ade']:.3f}  min-FDE {metrics['fde']:.3f}  "
      f"miss-rate {metrics['miss_rate']:.3f}")

# 5. stage-2 diversity sampler on the frozen net
scfg = SamplerConfig(nk=cfg.sample_k, nz=cfg.zdim)
key, k_s = jax.random.split(key)
sp = sampler_init(k_s, scfg, pred_model_dim=cfg.hidden_dim,
                  past_feature_dim=2 * cfg.hidden_dim)
s_opt = optax.adam(1e-3)
s_state = s_opt.init(sp)
s_step = make_sampler_train_step(cfg, scfg, s_opt, donate=False)
for batch, _ in scene_batches(train_scenes[:64], training=True, rng=nprng,
                              scenes_per_batch=8):
    key, sub = jax.random.split(key)
    batch = jax.tree_util.tree_map(jax.numpy.asarray, batch)
    sp, s_state, s_metrics = s_step(sp, params, s_state, batch, sub)
print(f"sampler step metrics: " +
      " ".join(f"{k}={float(v):.3f}" for k, v in s_metrics.items()))

# 6. serving: compiled bucketed inference
predictor = Predictor(params, cfg)
obs = np.asarray(test_scenes[0]["obs"])          # [N, 8, 2] absolute coords
samples = predictor.predict(obs, seed=3)          # [K, N, 12, 2]
print(f"served {samples.shape[0]} futures for {samples.shape[1]} agents")
