#!/usr/bin/env python
"""Dump the optimized HLO of the benchmark forward to /tmp/comet_hlo.txt so
trace op names (copy.NNNN, fusion.NN) can be mapped to JAX source scopes."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from comet_tpu.config import get_config
from comet_tpu.models import COMET
from comet_tpu.utils import cast_params_for_inference

cfg = get_config("ours")
model = COMET(cfg)
key = jax.random.PRNGKey(0)
images = jax.random.normal(
    key, (1, cfg.seqlen, cfg.img_size, cfg.img_size, 3), jnp.float32
)
queries = (
    jax.random.uniform(key, (1, cfg.track_num, 2)) * (cfg.img_size - 64) + 32
).astype(jnp.float32)
params = jax.jit(model.init)(key, images, queries)
params = cast_params_for_inference(params, cfg.dtype)

fwd = jax.jit(lambda p, im, q: model.apply(p, im, q)["pred_pose_enc"].sum())
txt = fwd.lower(params, images, queries).compile().as_text()
out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/comet_hlo.txt"
with open(out, "w") as f:
    f.write(txt)
print(out, len(txt))
