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
    reference for shapes with too little work to amortize a kernel."""
    b, lq, c = x.shape
    if lq > 64 or b * lq < 256:
        return _seq_reference(
            x, wqkv, bqkv, wout, bout, w1, b1, w2, b2, num_heads
        )
    return _fused_block(x, wqkv, bqkv, wout, bout, w1, b1, w2, b2, num_heads)
