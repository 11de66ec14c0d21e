"""Fused multi-head attention as Pallas TPU kernels.

Motivation (jax.profiler, round 2): XLA's einsum-softmax-einsum attention
at this model's shapes pays more in layout than in math —

- the [*, H, D] head split materializes D=48/64/96-lane tensors (a 128-lane
  tile wastes 2.7x at D=48), costing ~6 ms/fwd of reshape copies;
- small-sequence logits ([B*N, 8, 16, 16] in the track updateformers) tile
  to (8,128) so softmax fusions touch 8x padding, ~8 ms/fwd;
- the ViT's [16, 12, 581, 581] logits make three HBM round trips
  (QK write, softmax, AV read), ~7 ms/fwd.

The kernels read Q/K/V in their NATIVE [rows, H*D] projection layout (no
head-split tensor ever exists), keep logits entirely in VMEM in f32, and
write only the [rows, H*D] output. Two regimes:

- **packed** (L <= 64, many rows): G = rows_per_block/L sequences are packed
  into one [G*L, C] block and attended jointly under a block-diagonal mask,
  so the MXU sees [512, D] x [D, 512] dots instead of 8192 [16, D] slivers.
- **blocked** (long L): grid over (batch, query blocks of BQ=256/512 rows),
  full K/V for that batch resident in VMEM; logits [BQ, Lk] never leave
  VMEM.

Numerics: logits accumulate in f32 on the MXU, softmax in f32 on the VPU
(matching the jnp reference, which also uses preferred_element_type=f32);
the backward pass is the plain-jnp reference via custom_vjp (tracker
attention runs under stop_gradient anyway; camera-side training gradients
stay exact XLA). On CPU the kernels run in interpret mode so the same code
path is tested.

Parity target: torch nn.MultiheadAttention / DINOv2 Attention semantics as
replicated by models/blocks.MultiHeadAttention (modules.py:157-246) and
models/vit.ViTAttention (camera_predictor10.py backbone blocks).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _reference_attention(q, k, v, num_heads: int, scale: float):
    """Plain-jnp MHA on [B, L, C] inputs (f32 logits + softmax)."""
    b, lq, c = q.shape
    lk = k.shape[1]
    d = c // num_heads
    qh = q.reshape(b, lq, num_heads, d)
    kh = k.reshape(b, lk, num_heads, d)
    vh = v.reshape(b, lk, num_heads, d)
    logits = jnp.einsum(
        "bqhd,bkhd->bhqk", qh * jnp.asarray(scale, qh.dtype), kh,
        preferred_element_type=jnp.float32,
    )
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", w, vh)
    return out.reshape(b, lq, c)


def _heads_attend(q, k, v, num_heads: int, d: int, scale: float, bias):
    """Shared kernel inner loop: per-head slice, dot, softmax, dot.

    q [RQ, C], k/v [RK, C] f32/bf16 values already read from refs;
    bias [RQ, RK] f32 additive mask (0 / -inf) or None.
    Returns [RQ, C] in q.dtype.
    """
    outs = []
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        qh = q[:, sl]
        kh = k[:, sl]
        vh = v[:, sl]
        logits = jax.lax.dot_general(
            qh, kh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if bias is not None:
            logits = logits + bias
        w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
        outs.append(
            jax.lax.dot_general(
                w, vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).astype(q.dtype)
        )
    return jnp.concatenate(outs, axis=-1)


def _packed_kernel(num_heads, d, scale, lq, lk, q_ref, k_ref, v_ref, o_ref):
    rq, rk = q_ref.shape[0], k_ref.shape[0]
    # block-diagonal mask: query row i belongs to sequence i // lq
    qb = jax.lax.broadcasted_iota(jnp.int32, (rq, rk), 0) // lq
    kb = jax.lax.broadcasted_iota(jnp.int32, (rq, rk), 1) // lk
    bias = jnp.where(qb == kb, 0.0, -jnp.inf).astype(jnp.float32)
    o_ref[...] = _heads_attend(
        q_ref[...], k_ref[...], v_ref[...], num_heads, d, scale, bias
    )


def _blocked_kernel(num_heads, d, scale, lk_true, q_ref, k_ref, v_ref, o_ref):
    rk = k_ref.shape[1]
    if rk > lk_true:
        cols = jax.lax.broadcasted_iota(jnp.int32, (q_ref.shape[1], rk), 1)
        bias = jnp.where(cols < lk_true, 0.0, -jnp.inf).astype(jnp.float32)
    else:
        bias = None
    o_ref[0] = _heads_attend(
        q_ref[0], k_ref[0], v_ref[0], num_heads, d, scale, bias
    )


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _fused_attention_fwd_impl(q, k, v, num_heads: int, scale: float):
    b, lq, c = q.shape
    lk = k.shape[1]
    d = c // num_heads
    interpret = jax.default_backend() == "cpu"

    if lq <= 64 and lk <= 64:
        # ---- packed regime ----
        g = max(512 // max(lq, lk), 1)
        bp = _round_up(b, g)
        if bp != b:
            pad = ((0, bp - b), (0, 0), (0, 0))
            q = jnp.pad(q, pad)
            k = jnp.pad(k, pad)
            v = jnp.pad(v, pad)
        q2 = q.reshape(bp * lq, c)
        k2 = k.reshape(bp * lk, c)
        v2 = v.reshape(bp * lk, c)
        grid = (bp // g,)
        out = pl.pallas_call(
            functools.partial(_packed_kernel, num_heads, d, scale, lq, lk),
            out_shape=jax.ShapeDtypeStruct((bp * lq, c), q.dtype),
            grid=grid,
            in_specs=[
                pl.BlockSpec((g * lq, c), lambda i: (i, 0)),
                pl.BlockSpec((g * lk, c), lambda i: (i, 0)),
                pl.BlockSpec((g * lk, c), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((g * lq, c), lambda i: (i, 0)),
            interpret=interpret,
        )(q2, k2, v2)
        out = out.reshape(bp, lq, c)
        return out[:b] if bp != b else out

    # ---- blocked regime ----
    # one whole-sequence query block when it fits VMEM comfortably: fewer,
    # larger per-head MXU dots (the 24-small-dots-per-program variant at
    # BQ=256 ran latency-bound at ~3 TFLOP/s on the ViT's 581 tokens)
    if lq <= 768:
        bq = _round_up(lq, 8)
    else:
        bq = 256
    lqp = _round_up(lq, bq)
    lkp = _round_up(lk, 8)
    if lqp != lq:
        q = jnp.pad(q, ((0, 0), (0, lqp - lq), (0, 0)))
    if lkp != lk:
        k = jnp.pad(k, ((0, 0), (0, lkp - lk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, lkp - lk), (0, 0)))
    grid = (b, lqp // bq)
    out = pl.pallas_call(
        functools.partial(_blocked_kernel, num_heads, d, scale, lk),
        out_shape=jax.ShapeDtypeStruct((b, lqp, c), q.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, lkp, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, lkp, c), lambda i, j: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bq, c), lambda i, j: (i, j, 0)),
        interpret=interpret,
    )(q, k, v)
    return out[:, :lq] if lqp != lq else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _fused_attention(q, k, v, num_heads, scale):
    return _fused_attention_fwd_impl(q, k, v, num_heads, scale)


def _fa_fwd(q, k, v, num_heads, scale):
    return _fused_attention_fwd_impl(q, k, v, num_heads, scale), (q, k, v)


def _fa_bwd(num_heads, scale, res, g):
    q, k, v = res
    _, vjp = jax.vjp(
        lambda q, k, v: _reference_attention(q, k, v, num_heads, scale), q, k, v
    )
    return vjp(g)


_fused_attention.defvjp(_fa_fwd, _fa_bwd)


def fused_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    num_heads: int,
    scale: Optional[float] = None,
) -> jax.Array:
    """Multi-head attention on projected activations.

    q: [B, Lq, C]; k, v: [B, Lk, C] with C = num_heads * head_dim; returns
    [B, Lq, C] (pre-output-projection). Equivalent to the jnp reference
    (f32 logits + f32 softmax) within matmul-reassociation noise.

    Falls back to the jnp reference for shapes the kernels don't serve well
    (tiny single-row calls, Lq == 1 cross-attention).
    """
    b, lq, c = q.shape
    lk = k.shape[1]
    if scale is None:
        scale = 1.0 / (c // num_heads) ** 0.5
    if q.dtype != jnp.bfloat16 and jax.default_backend() != "cpu":
        # f32 on real TPU: the kernels' VMEM blocking is sized for bf16
        # operands (f32 whole-sequence ViT blocks measured 25.8 MB > the
        # 16 MB scoped-VMEM ceiling — found by the train bench suite).
        # bf16 is the production inference dtype; f32 runs the bit-exact
        # XLA reference. CPU keeps interpret-mode kernels for parity tests.
        return _reference_attention(q, k, v, num_heads, scale)
    small = lq <= 64 and lk <= 64
    if small:
        if b * lq < 256:  # too little work to amortize a kernel launch
            return _reference_attention(q, k, v, num_heads, scale)
    elif lq == 1 or lk < 128 or min(lq, lk) < 8:
        # blocked regime only pays when K/V are long enough that the
        # logits' HBM round-trip dominates (measured: Lk=64 regresses 3x)
        return _reference_attention(q, k, v, num_heads, scale)
    return _fused_attention(q, k, v, num_heads, scale)
