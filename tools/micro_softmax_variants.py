#!/usr/bin/env python
"""Kernel-isolated A/B of softmax formulations inside the blocked Pallas
attention kernel at the ViT/aggregator shapes (the ~30%-MFU, VPU-bound
bucket in PROFILE.md).

Variants:
  base   - jax.nn.softmax on f32 logits (shipped kernel)
  nomax  - raw exp/sum without the max subtraction (saves a reduce + sub;
           numerically unsafe in general, measured for the ceiling only)
  exp2   - fold log2(e) into the attention scale, then exp2(l - max);
           TPU's transcendental unit computes exp via exp2, so this saves
           the x*log2e multiply per element
  bf16e  - f32 max-subtract, then exp and normalize in bf16 (halves VPU
           register traffic if Mosaic packs bf16 ALU ops)
"""

import os
import sys
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from comet_tpu.ops.pallas_attn import _reference_attention, _round_up
from comet_tpu.utils.profiling import benchmark_fn


def _heads_attend_variant(q, k, v, num_heads, d, scale, bias, variant):
    outs = []
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        logits = jax.lax.dot_general(
            q[:, sl], k[:, sl],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if bias is not None:
            logits = logits + bias
        if variant == "base":
            w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        elif variant == "nomax":
            e = jnp.exp(logits)
            w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        elif variant == "exp2":
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp2(logits - m)
            w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        elif variant == "bf16e":
            m = jnp.max(logits, axis=-1, keepdims=True)
            e = jnp.exp((logits - m).astype(jnp.bfloat16))
            w = (e / jnp.sum(e, axis=-1, keepdims=True)).astype(q.dtype)
        else:
            raise ValueError(variant)
        outs.append(
            jax.lax.dot_general(
                w, v[:, sl],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(q.dtype)
        )
    return jnp.concatenate(outs, axis=-1)


def _blocked_kernel_variant(num_heads, d, scale, lk_true, variant,
                            q_ref, k_ref, v_ref, o_ref):
    rk = k_ref.shape[1]
    if rk > lk_true:
        cols = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[1], rk), 1)
        bias = jnp.where(cols < lk_true, 0.0, -jnp.inf).astype(jnp.float32)
    else:
        bias = None
    o_ref[0] = _heads_attend_variant(
        q_ref[0], k_ref[0], v_ref[0], num_heads, d, scale, bias, variant
    )


def blocked_attention(q, k, v, num_heads, variant):
    b, lq, c = q.shape
    lk = k.shape[1]
    d = c // num_heads
    scale = d ** -0.5
    if variant == "exp2":
        scale = scale * 1.4426950408889634  # log2(e), exp -> exp2
    bq = _round_up(lq, 8)
    lkp = _round_up(lk, 8)
    if lkp != lk:
        k = jnp.pad(k, ((0, 0), (0, lkp - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lkp - lk), (0, 0)))
    lqp = _round_up(lq, bq)
    if lqp != lq:
        q = jnp.pad(q, ((0, 0), (0, lqp - lq), (0, 0)))
    grid = (b, lqp // bq)
    out = pl.pallas_call(
        functools.partial(
            _blocked_kernel_variant, num_heads, d, scale, lk, variant
        ),
        out_shape=jax.ShapeDtypeStruct((b, lqp, c), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, lkp, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, lkp, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0)),
        interpret=jax.default_backend() == "cpu",
    )(q, k, v)
    return out[:, :lq] if lqp != lq else out


SHAPES = [
    ("vit self", 16, 581, 581, 768, 12),
    ("agg self", 16, 578, 578, 768, 8),
]

for name, b, lq, lk, c, h in SHAPES:
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(0), 3)
    dt = jnp.bfloat16
    q = jax.random.normal(kq, (b, lq, c), dt)
    k = jax.random.normal(kk, (b, lk, c), dt)
    v = jax.random.normal(kv, (b, lk, c), dt)
    ref = jax.jit(
        lambda q, k, v: _reference_attention(q, k, v, h, (c // h) ** -0.5)
    )
    o_ref = ref(q, k, v).astype(jnp.float32)
    print(f"== {name} [{b}x{lq}x{c}, {h} heads]")
    for variant in ["base", "nomax", "exp2", "bf16e"]:
        fn = jax.jit(functools.partial(
            blocked_attention, num_heads=h, variant=variant
        ))
        o = fn(q, k, v).astype(jnp.float32)
        err = float(jnp.max(jnp.abs(o - o_ref)))
        stats = benchmark_fn(fn, q, k, v, reps=32)
        print(f"  {variant:6s} {stats['ms_per_call']:7.3f} ms  maxerr={err:.2e}")
