#!/usr/bin/env python
"""Recorded attempt at the updateformer lane-packing idea (VERDICT r2
item 2; PROFILE.md round-1 headroom #1).

The fused block kernel's attention runs per-head [512, 48] x [48, 512]
dots (48/128 contraction lanes) against a block-diagonal mask where only
lq/512 of each logits row is useful. The packed variant exploits the
block-diagonal structure directly: per group of lq=16 rows, embed each
head's K (and V) into a block-diagonal [C, H*lq] (resp. [H*lq, C])
operand so ONE full-lane contraction produces every head's logits
([g, lq, C] @ [g, C, H*lq], K=384 contraction, 128-wide output) and one
more produces the concatenated AV ([g, lq, H*lq] @ [g, H*lq, C]). That is
4x fewer attention FLOPs than the masked 512-row block-diag dots and full
MXU lane depth — at the cost of batched M=16 dots (poor row occupancy)
and in-kernel operand packing (8 static scatter slices over a VMEM
buffer).

Benchmarks both full-block kernels in isolation on the real chip at the
coarse-updateformer time-block shape (512 seqs x 16 x 384, 8 heads), a
50-deep scan, median of 5. Run: python tools/micro_lane_packing.py
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from comet_tpu.ops.pallas_block import (
    _fused_kernel,
    _ln,
    _gelu,
    _round_up,
    _seq_reference,
)

B, L, C, H = 512, 16, 384, 8
D = C // H
HIDDEN = 4 * C
SCALE = 1.0 / (D ** 0.5)


def _packed_kernel(
    num_heads, d, scale, lq,
    x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref,
    w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
):
    """Fused block with lane-packed block-diagonal attention."""
    x = x_ref[...]
    xn = _ln(x)
    qkv = jax.lax.dot_general(
        xn, wqkv_ref[...],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype) + bqkv_ref[...]
    c = x.shape[-1]
    q, k, v = qkv[:, :c], qkv[:, c : 2 * c], qkv[:, 2 * c :]
    rows = x.shape[0]
    g = rows // lq
    hl = num_heads * lq

    # Masked-tile packing: Mosaic forbids head-split reshapes (minor dim
    # d=48 is not lane-aligned), so the packed operands are built from
    # ALIGNED ops only — tile K/V H times along rows and multiply by a
    # constant block mask. Row block h of kp is K with every channel
    # outside head h zeroed, so ONE full-C contraction yields all heads'
    # logits side by side: logits[g, q, (h, kq)] = q_h . k_h.
    q3 = q.reshape(g, lq, c)
    k3 = k.reshape(g, lq, c)
    v3 = v.reshape(g, lq, c)
    row_head = jax.lax.broadcasted_iota(jnp.int32, (hl, c), 0) // lq
    col_head = jax.lax.broadcasted_iota(jnp.int32, (hl, c), 1) // d
    mask = (row_head == col_head).astype(x.dtype)  # [H*lq, C]
    kp = jnp.concatenate([k3] * num_heads, axis=1) * mask  # [g, H*lq, C]
    logits = jax.lax.dot_general(
        q3, kp,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) * scale  # [g, lq, H*lq]
    # per-head softmax WITHOUT the (layout-hostile) [.., H, lq] reshape:
    # exp, then per-16-block sums via a constant block-diagonal matmul.
    # No max subtraction (measured free-standing to be numerically and
    # perf neutral at these logit magnitudes, PROFILE.md).
    e = jnp.exp(logits)
    blk = jax.lax.broadcasted_iota(jnp.int32, (hl, hl), 0) // lq
    blk2 = jax.lax.broadcasted_iota(jnp.int32, (hl, hl), 1) // lq
    ssum = (blk == blk2).astype(jnp.float32)  # [H*lq, H*lq]
    denom = jax.lax.dot_general(
        e, ssum,
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    w = (e / denom).astype(x.dtype)  # [g, lq, H*lq]
    vp = jnp.concatenate([v3] * num_heads, axis=1) * mask  # [g, H*lq, C]
    a = jax.lax.dot_general(
        w, vp,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype).reshape(rows, c)

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


def _run_block(kernel_body, x, weights, lq):
    b, l, c = x.shape
    g = max(512 // lq, 1)
    bp = _round_up(b, g)
    x2 = x.reshape(bp * lq, c)
    rows_per_block = g * lq
    wqkv, bqkv, wout, bout, w1, b1, w2, b2 = weights
    hidden = w1.shape[1]
    return pl.pallas_call(
        functools.partial(kernel_body, H, D, SCALE, lq),
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
    )(x2, *weights).reshape(bp, lq, c)


def bench(kernel_body, x, weights, reps=50, outer=5):
    f = jax.jit(
        lambda x: jax.lax.scan(
            lambda carry, _: (
                _run_block(kernel_body, carry, weights, L), None
            ),
            x, None, length=reps,
        )[0]
    )
    jax.block_until_ready(f(x))
    times = []
    for _ in range(outer):
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        times.append((time.perf_counter() - t0) / reps)
    times.sort()
    return times[len(times) // 2] * 1000.0  # ms/block


def main():
    rng = np.random.default_rng(0)
    dtype = jnp.bfloat16
    x = jnp.asarray(rng.normal(size=(B, L, C)) * 0.1, dtype)
    weights = tuple(
        jnp.asarray(rng.normal(size=s) * 0.05, dtype)
        for s in [
            (C, 3 * C), (3 * C,), (C, C), (C,),
            (C, HIDDEN), (HIDDEN,), (HIDDEN, C), (C,),
        ]
    )

    # correctness vs the jnp reference first
    ref = _seq_reference(
        x.astype(jnp.float32),
        *[w.astype(jnp.float32) for w in weights], num_heads=H,
    )
    for name, body in [("base", _fused_kernel), ("packed", _packed_kernel)]:
        got = _run_block(body, x, weights, L)
        d = float(jnp.max(jnp.abs(got.astype(jnp.float32) - ref)))
        print(f"{name}: max|diff vs f32 ref| = {d:.4f} (bf16 rounding)")
        assert d < 0.35, f"{name} mismatch"
    a = float(
        jnp.max(jnp.abs(
            _run_block(_fused_kernel, x, weights, L).astype(jnp.float32)
            - _run_block(_packed_kernel, x, weights, L).astype(jnp.float32)
        ))
    )
    print(f"packed vs base (same dtype): max|diff| = {a:.5f}")

    for name, body in [("base", _fused_kernel), ("packed", _packed_kernel)]:
        ms = bench(body, x, weights)
        print(f"{name}: {ms:.3f} ms/block (median of 5, 50-deep scan)")


if __name__ == "__main__":
    main()
