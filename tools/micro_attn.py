#!/usr/bin/env python
"""Micro-bench fused_attention vs the XLA einsum reference at COMET shapes."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from comet_tpu.ops.pallas_attn import _reference_attention, fused_attention
from comet_tpu.utils.profiling import benchmark_fn

SHAPES = [
    # (name, B, Lq, Lk, C, H)
    ("uf-time coarse", 576, 16, 16, 384, 8),
    ("uf-time fine", 512, 16, 16, 256, 8),
    ("uf-space v2p", 16, 64, 512, 384, 8),
    ("uf-space p2v", 16, 512, 64, 384, 8),
    ("uf-space vself", 16, 64, 64, 384, 8),
    ("vit self", 16, 581, 581, 768, 12),
    ("agg self", 16, 578, 578, 768, 8),
    ("agg cross", 1, 8670, 578, 768, 8),
]

for name, b, lq, lk, c, h in SHAPES:
    key = jax.random.PRNGKey(0)
    kq, kk, kv = jax.random.split(key, 3)
    dt = jnp.bfloat16
    q = jax.random.normal(kq, (b, lq, c), dt)
    k = jax.random.normal(kk, (b, lk, c), dt)
    v = jax.random.normal(kv, (b, lk, c), dt)
    ref = jax.jit(lambda q, k, v: _reference_attention(q, k, v, h, (c // h) ** -0.5))
    fus = jax.jit(lambda q, k, v: fused_attention(q, k, v, h))
    o1 = ref(q, k, v)
    o2 = fus(q, k, v)
    err = float(jnp.max(jnp.abs(o1.astype(jnp.float32) - o2.astype(jnp.float32))))
    s1 = benchmark_fn(ref, q, k, v, reps=16)
    s2 = benchmark_fn(fus, q, k, v, reps=16)
    print(
        f"{name:16s} xla {s1['ms_per_call']:7.3f} ms  pallas {s2['ms_per_call']:7.3f} ms"
        f"  maxerr={err:.2e}"
    )
