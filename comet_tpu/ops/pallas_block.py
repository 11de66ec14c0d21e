"""Fully fused transformer block (LN -> qkv -> attention -> out-proj ->
residual -> LN -> MLP -> residual) as ONE Pallas TPU kernel.

Motivation (jax.profiler, round 2): the track updateformers' time blocks
run at M=8-9k rows x C=256/384 — every Dense/LN/attention op at that size
is HBM-bound, and the unfused chain makes ~8 HBM round trips over the
activations per block (~0.67 ms per coarse block application measured,
vs a ~0.35 ms compute floor). This kernel keeps the whole block's
intermediates in VMEM: per 512-row grid step it reads x once, runs the
packed-qkv matmul, the block-diagonal small-sequence attention (same
inner loop as ops/pallas_attn), the out-projection, both LayerNorms, the
MLP, and writes the final residual-summed rows once. Weights (~3.6 MB
bf16 at C=384) have constant block indices, so Mosaic keeps them resident
across grid steps.

Semantics are EXACTLY models/blocks.AttnBlock (modules.py:248-295
parity): the residual stream is re-based on the normalized input
(x = ln1(x); x = x + attn(x); y = ln2(x); x = x + mlp(y)), LayerNorms are
scale/bias-free with eps=1e-6 and f32 statistics, attention logits and
softmax are f32, GELU follows blocks.gelu (exact erf in f32, tanh under
bf16). The backward pass is the plain-jnp reference via custom_vjp
(the tracker runs under stop_gradient at train time, so this path only
serves inference; gradients remain exact regardless). On CPU the kernel
runs in interpret mode so parity tests exercise the same code path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .pallas_attn import _heads_attend, _round_up


def _gelu(x):
    # blocks.gelu without the import cycle: exact erf in f32 (parity
    # tests), tanh approximation under bf16 (same rule as the unfused path)
    import flax.linen as nn

    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


def _ln(x, eps=1e-6):
    """Scale/bias-free LayerNorm, f32 statistics (FusedLayerNorm ref)."""
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype)


def _block_reference(x, wqkv, bqkv, wout, bout, w1, b1, w2, b2, num_heads):
    """Plain-jnp AttnBlock on [rows, C] with block-diagonal attention over
    length-lq groups — the semantic spec of the kernel AND the backward."""
    c = x.shape[-1]
    d = c // num_heads
    scale = 1.0 / (d ** 0.5)
    xn = _ln(x)
    qkv = xn @ wqkv + bqkv
    q, k, v = jnp.split(qkv, 3, axis=-1)
    rows = x.shape[0]
    outs = []
    for h in range(num_heads):
        sl = slice(h * d, (h + 1) * d)
        logits = (
            jnp.einsum("qd,kd->qk", q[:, sl], k[:, sl],
                       preferred_element_type=jnp.float32) * scale
        )
        outs.append(logits)
    # caller reshapes per-sequence; here rows == one sequence (lq == rows)
    att = []
    for h, logits in enumerate(outs):
        w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
        sl = slice(h * d, (h + 1) * d)
        att.append(w @ v[:, sl])
    a = jnp.concatenate(att, axis=-1)
    x1 = xn + (a @ wout + bout)
    y = _ln(x1)
    h1 = _gelu(y @ w1 + b1)
    return x1 + (h1 @ w2 + b2)


def _seq_reference(x, wqkv, bqkv, wout, bout, w1, b1, w2, b2, num_heads):
    """Reference on [B, L, C]: per-sequence attention via vmap."""
    return jax.vmap(
        lambda s: _block_reference(
            s, wqkv, bqkv, wout, bout, w1, b1, w2, b2, num_heads
        )
    )(x)


def _lane_packed_attend(q, k, v, num_heads, d, scale, lq):
    """Block-diagonal multi-head attention as THREE full-lane contractions
    (the lane-packing win PROFILE round-1 headroom #1 asked for; measured
    0.700 vs 0.853 ms/block on the coarse shape, tools/micro_lane_packing).

    Requires hl = num_heads * lq to be lane-aligned (multiple of 128).
    Mosaic forbids the head-split reshape (minor dim d is not
    lane-aligned), so the packed operands use ALIGNED ops only: tile K/V
    num_heads times along rows and zero channels outside each row-block's
    head with a constant mask. One [lq, C] x [C, hl] contraction per
    group then yields every head's logits side by side
    (logits[g, q, (h, kq)] = q_h . k_h — 4x fewer FLOPs than the masked
    512-row block-diagonal dots, full 128-lane contraction depth), and
    the per-head softmax runs reshape-free: a row-wise max over all hl
    columns is a uniform per-row shift (per-block softmax invariant),
    and per-16-block sums come from a constant block-diagonal matmul.
    """
    rows, c = q.shape
    g = rows // lq
    hl = num_heads * lq
    q3 = q.reshape(g, lq, c)
    k3 = k.reshape(g, lq, c)
    v3 = v.reshape(g, lq, c)
    row_head = jax.lax.broadcasted_iota(jnp.int32, (hl, c), 0) // lq
    col_head = jax.lax.broadcasted_iota(jnp.int32, (hl, c), 1) // d
    mask = (row_head == col_head).astype(q.dtype)  # [hl, C]
    kp = jnp.concatenate([k3] * num_heads, axis=1) * mask  # [g, hl, C]
    logits = jax.lax.dot_general(
        q3, kp,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [g, lq, hl]
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    blk_r = jax.lax.broadcasted_iota(jnp.int32, (hl, hl), 0) // lq
    blk_c = jax.lax.broadcasted_iota(jnp.int32, (hl, hl), 1) // lq
    ssum = (blk_r == blk_c).astype(jnp.float32)  # [hl, hl] block-diag ones
    denom = jax.lax.dot_general(
        e, ssum,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # ADVICE r3 #1: the row max is shared across ALL heads' column blocks;
    # a head whose logits sit ~88+ below the row's global max underflows
    # its whole exp block to 0 and 0/0 would emit NaN. Clamping the
    # denominator turns that (already fully-saturated-softmax) case into
    # exact zeros instead.
    w = (e / jnp.maximum(denom, 1e-30)).astype(q.dtype)
    vp = jnp.concatenate([v3] * num_heads, axis=1) * mask  # [g, hl, C]
    return jax.lax.dot_general(
        w, vp,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(q.dtype).reshape(rows, c)


def _fused_kernel(
    num_heads, d, scale, lq,
    x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
):
    x = x_ref[...]
    xn = _ln(x)
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + bqkv_ref[...]
    c = x.shape[-1]
    q, k, v = qkv[:, :c], qkv[:, c : 2 * c], qkv[:, 2 * c :]

    rq = x.shape[0]
    if (num_heads * lq) % 128 == 0 and c % 128 == 0 and rq % lq == 0:
        a = _lane_packed_attend(q, k, v, num_heads, d, scale, lq)
    else:
        qb = jax.lax.broadcasted_iota(jnp.int32, (rq, rq), 0) // lq
        kb = jax.lax.broadcasted_iota(jnp.int32, (rq, rq), 1) // lq
        bias = jnp.where(qb == kb, 0.0, -jnp.inf).astype(jnp.float32)
        a = _heads_attend(q, k, v, num_heads, d, scale, bias)

    x1 = xn + (
        jax.lax.dot_general(
            a, wout_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + bout_ref[...]
    )
    y = _ln(x1)
    h1 = _gelu(
        jax.lax.dot_general(
            y, w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + b1_ref[...]
    )
    o_ref[...] = x1 + (
        jax.lax.dot_general(
            h1, w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + b2_ref[...]
    )


def _fused_block_fwd_impl(
    x, wqkv, bqkv, wout, bout, w1, b1, w2, b2, num_heads
):
    b, lq, c = x.shape
    d = c // num_heads
    scale = 1.0 / (d ** 0.5)
    interpret = jax.default_backend() == "cpu"

    g = max(512 // lq, 1)
    bp = _round_up(b, g)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0), (0, 0)))
    x2 = x.reshape(bp * lq, c)
    rows_per_block = g * lq
    hidden = w1.shape[1]

    out = pl.pallas_call(
        functools.partial(_fused_kernel, num_heads, d, scale, lq),
        out_shape=jax.ShapeDtypeStruct((bp * lq, c), x.dtype),
        grid=(bp // g,),
        in_specs=[
            pl.BlockSpec((rows_per_block, c), lambda i: (i, 0)),
            pl.BlockSpec((c, 3 * c), lambda i: (0, 0)),
            pl.BlockSpec((3 * c,), lambda i: (0,)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden,), lambda i: (0,)),
            pl.BlockSpec((hidden, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((rows_per_block, c), lambda i: (i, 0)),
        interpret=interpret,
    )(x2, wqkv, bqkv, wout, bout, w1, b1, w2, b2)
    out = out.reshape(bp, lq, c)
    return out[:b] if bp != b else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _fused_block(x, wqkv, bqkv, wout, bout, w1, b1, w2, b2, num_heads):
    return _fused_block_fwd_impl(
        x, wqkv, bqkv, wout, bout, w1, b1, w2, b2, num_heads
    )


def _fb_fwd(x, wqkv, bqkv, wout, bout, w1, b1, w2, b2, num_heads):
    out = _fused_block_fwd_impl(
        x, wqkv, bqkv, wout, bout, w1, b1, w2, b2, num_heads
    )
    return out, (x, wqkv, bqkv, wout, bout, w1, b1, w2, b2)


def _fb_bwd(num_heads, res, g):
    x, wqkv, bqkv, wout, bout, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _seq_reference(*a, num_heads=num_heads),
        x, wqkv, bqkv, wout, bout, w1, b1, w2, b2,
    )
    return vjp(g)


_fused_block.defvjp(_fb_fwd, _fb_bwd)


def _cross_reference(
    x, ctx, gamma, beta, wq, bq, wkv, bkv, wout, bout, w1, b1, w2, b2,
    num_heads,
):
    """Plain-jnp CrossAttnBlock on [B, Lq, C] / [B, Lk, C] — the semantic
    spec of the cross kernel AND its backward (modules.py:298-344 parity:
    norm1/norm2 scale-free, norm_context affine, residual re-based on the
    normalized query stream)."""
    c = x.shape[-1]
    d = c // num_heads
    scale = 1.0 / (d ** 0.5)
    xn = _ln(x)
    cn = _ln(ctx) * gamma + beta
    q = xn @ wq + bq
    kv = cn @ wkv + bkv
    k, v = jnp.split(kv, 2, axis=-1)
    b, lq, _ = x.shape
    lk = ctx.shape[1]
    qh = q.reshape(b, lq, num_heads, d)
    kh = k.reshape(b, lk, num_heads, d)
    vh = v.reshape(b, lk, num_heads, d)
    logits = (
        jnp.einsum("bqhd,bkhd->bhqk", qh, kh,
                   preferred_element_type=jnp.float32) * scale
    )
    w = jax.nn.softmax(logits, axis=-1).astype(x.dtype)
    a = jnp.einsum("bhqk,bkhd->bqhd", w, vh).reshape(b, lq, c)
    x1 = xn + (a @ wout + bout)
    y = _ln(x1)
    h1 = _gelu(y @ w1 + b1)
    return x1 + (h1 @ w2 + b2)


def _cross_kernel(
    num_heads, d, scale, lq, lk,
    x_ref, c_ref, gamma_ref, beta_ref, wq_ref, bq_ref, wkv_ref, bkv_ref,
    wout_ref, bout_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
):
    x = x_ref[...]
    xn = _ln(x)
    cn = _ln(c_ref[...]) * gamma_ref[...] + beta_ref[...]
    q = jax.lax.dot_general(
        xn, wq_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + bq_ref[...]
    kv = jax.lax.dot_general(
        cn, wkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + bkv_ref[...]
    c = x.shape[-1]
    k, v = kv[:, :c], kv[:, c:]

    rq, rk = x.shape[0], k.shape[0]
    qb = jax.lax.broadcasted_iota(jnp.int32, (rq, rk), 0) // lq
    kb = jax.lax.broadcasted_iota(jnp.int32, (rq, rk), 1) // lk
    bias = jnp.where(qb == kb, 0.0, -jnp.inf).astype(jnp.float32)
    a = _heads_attend(q, k, v, num_heads, d, scale, bias)

    x1 = xn + (
        jax.lax.dot_general(
            a, wout_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + bout_ref[...]
    )
    y = _ln(x1)
    h1 = _gelu(
        jax.lax.dot_general(
            y, w1_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + b1_ref[...]
    )
    o_ref[...] = x1 + (
        jax.lax.dot_general(
            h1, w2_ref[...],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        + b2_ref[...]
    )


def _cross_block_fwd_impl(
    x, ctx, gamma, beta, wq, bq, wkv, bkv, wout, bout, w1, b1, w2, b2,
    num_heads,
):
    b, lq, c = x.shape
    lk = ctx.shape[1]
    d = c // num_heads
    scale = 1.0 / (d ** 0.5)
    interpret = jax.default_backend() == "cpu"

    # VMEM budget (~16 MB/core, double-buffered blocks): target ~256 query
    # rows and cap the packed kv block at ~1024 rows so f32 logits stay
    # under ~1 MB per grid step.
    g = min(max(256 // lq, 1), max(1024 // lk, 1))
    bp = _round_up(b, g)
    if bp != b:
        x = jnp.pad(x, ((0, bp - b), (0, 0), (0, 0)))
        ctx = jnp.pad(ctx, ((0, bp - b), (0, 0), (0, 0)))
    x2 = x.reshape(bp * lq, c)
    c2 = ctx.reshape(bp * lk, c)
    hidden = w1.shape[1]

    out = pl.pallas_call(
        functools.partial(_cross_kernel, num_heads, d, scale, lq, lk),
        out_shape=jax.ShapeDtypeStruct((bp * lq, c), x.dtype),
        grid=(bp // g,),
        in_specs=[
            pl.BlockSpec((g * lq, c), lambda i: (i, 0)),
            pl.BlockSpec((g * lk, c), lambda i: (i, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, 2 * c), lambda i: (0, 0)),
            pl.BlockSpec((2 * c,), lambda i: (0,)),
            pl.BlockSpec((c, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
            pl.BlockSpec((c, hidden), lambda i: (0, 0)),
            pl.BlockSpec((hidden,), lambda i: (0,)),
            pl.BlockSpec((hidden, c), lambda i: (0, 0)),
            pl.BlockSpec((c,), lambda i: (0,)),
        ],
        out_specs=pl.BlockSpec((g * lq, c), lambda i: (i, 0)),
        interpret=interpret,
    )(x2, c2, gamma, beta, wq, bq, wkv, bkv, wout, bout, w1, b1, w2, b2)
    out = out.reshape(bp, lq, c)
    return out[:b] if bp != b else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(14,))
def _cross_block(
    x, ctx, gamma, beta, wq, bq, wkv, bkv, wout, bout, w1, b1, w2, b2,
    num_heads,
):
    return _cross_block_fwd_impl(
        x, ctx, gamma, beta, wq, bq, wkv, bkv, wout, bout, w1, b1, w2, b2,
        num_heads,
    )


def _cb_fwd(
    x, ctx, gamma, beta, wq, bq, wkv, bkv, wout, bout, w1, b1, w2, b2,
    num_heads,
):
    out = _cross_block_fwd_impl(
        x, ctx, gamma, beta, wq, bq, wkv, bkv, wout, bout, w1, b1, w2, b2,
        num_heads,
    )
    return out, (x, ctx, gamma, beta, wq, bq, wkv, bkv, wout, bout, w1, b1,
                 w2, b2)


def _cb_bwd(num_heads, res, g):
    _, vjp = jax.vjp(
        lambda *a: _cross_reference(*a, num_heads=num_heads), *res
    )
    return vjp(g)


_cross_block.defvjp(_cb_fwd, _cb_bwd)


def fused_cross_block(
    x: jax.Array,  # [B, Lq, C] query stream
    ctx: jax.Array,  # [B, Lk, C] context (keys/values)
    gamma: jax.Array,  # [C] norm_context scale
    beta: jax.Array,  # [C] norm_context bias
    wq: jax.Array,  # [C, C] query projection (in_proj[:, :C])
    bq: jax.Array,  # [C]
    wkv: jax.Array,  # [C, 2C] packed kv projection (in_proj[:, C:])
    bkv: jax.Array,  # [2C]
    wout: jax.Array,  # [C, C]
    bout: jax.Array,  # [C]
    w1: jax.Array,  # [C, hidden]
    b1: jax.Array,  # [hidden]
    w2: jax.Array,  # [hidden, C]
    b2: jax.Array,  # [C]
    num_heads: int,
) -> jax.Array:
    """One CrossAttnBlock application, fully fused. Falls back to the jnp
    reference for shapes with too little work to amortize a kernel, and
    for f32 inputs on real TPU: the exact-erf GELU the f32 path mandates
    has no Mosaic lowering (erf/erfc unimplemented — found by the train
    bench suite), and XLA's erfc-based gelu is the bit-exact reference
    anyway. bf16 (the production inference dtype) uses tanh-GELU and
    stays fused; CPU runs the kernel in interpret mode for parity tests."""
    b, lq, c = x.shape
    lk = ctx.shape[1]
    f32_on_tpu = (
        x.dtype != jnp.bfloat16 and jax.default_backend() != "cpu"
    )
    if lq > 512 or lk > 1024 or b * lq < 256 or f32_on_tpu:
        return _cross_reference(
            x, ctx, gamma, beta, wq, bq, wkv, bkv, wout, bout, w1, b1, w2,
            b2, num_heads,
        )
    return _cross_block(
        x, ctx, gamma, beta, wq, bq, wkv, bkv, wout, bout, w1, b1, w2, b2,
        num_heads,
    )


def fused_attn_block(
    x: jax.Array,  # [B, L, C] — L <= 64, self-attention, no mask
    wqkv: jax.Array,  # [C, 3C] packed qkv (torch in_proj layout)
    bqkv: jax.Array,  # [3C]
    wout: jax.Array,  # [C, C]
    bout: jax.Array,  # [C]
    w1: jax.Array,  # [C, hidden]
    b1: jax.Array,  # [hidden]
    w2: jax.Array,  # [hidden, C]
    b2: jax.Array,  # [C]
    num_heads: int,
) -> jax.Array:
    """One AttnBlock application, fully fused. Falls back to the jnp
    reference for shapes with too little work to amortize a kernel, and
    for f32 inputs on real TPU (exact-erf GELU has no Mosaic lowering —
    see fused_cross_block)."""
    b, lq, c = x.shape
    f32_on_tpu = (
        x.dtype != jnp.bfloat16 and jax.default_backend() != "cpu"
    )
    if lq > 64 or b * lq < 256 or f32_on_tpu:
        return _seq_reference(
            x, wqkv, bqkv, wout, bout, w1, b1, w2, b2, num_heads
        )
    return _fused_block(x, wqkv, bqkv, wout, bout, w1, b1, w2, b2, num_heads)
