"""Fused Pallas attention vs the plain-jnp reference.

Covers both kernel regimes (packed small-L, blocked long-L), the dispatch
fallbacks, and the custom_vjp backward. Runs in interpret mode on CPU so the
same kernel code is exercised as on TPU.

Parity target: torch nn.MultiheadAttention semantics as carried by
models/blocks.MultiHeadAttention (reference comet/models/modules.py:157-246).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comet_tpu.ops.pallas_attn import _reference_attention, fused_attention


def _mk(b, lq, lk, c, dtype=jnp.float32, seed=0):
    kq, kk, kv = jax.random.split(jax.random.PRNGKey(seed), 3)
    return (
        jax.random.normal(kq, (b, lq, c), dtype),
        jax.random.normal(kk, (b, lk, c), dtype),
        jax.random.normal(kv, (b, lk, c), dtype),
    )


class TestFusedAttention:
    @pytest.mark.parametrize(
        "b,lq,lk,c,h",
        [
            (32, 16, 16, 64, 4),   # packed regime, D=16
            (48, 16, 16, 96, 2),   # packed, non-pow2 batch -> pad+crop
            (40, 12, 12, 48, 3),   # packed, L not multiple of 8
            (2, 200, 200, 96, 4),  # blocked regime, Lq pad to 8, Lk pad
            (1, 300, 139, 64, 2),  # blocked, Lk needs padding+mask
        ],
    )
    def test_matches_reference(self, b, lq, lk, c, h):
        q, k, v = _mk(b, lq, lk, c)
        scale = (c // h) ** -0.5
        ref = _reference_attention(q, k, v, h, scale)
        out = fused_attention(q, k, v, h)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-5)

    def test_packed_no_cross_sequence_leak(self):
        # two identical sequences packed in one block must give identical
        # outputs; perturbing sequence 1 must not change sequence 0
        q, k, v = _mk(64, 16, 16, 64, seed=1)
        q = q.at[1].set(q[0])
        k = k.at[1].set(k[0])
        v = v.at[1].set(v[0])
        out = fused_attention(q, k, v, 4)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-6)
        k2 = k.at[1].add(10.0)
        out2 = fused_attention(q, k2, v, 4)
        np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(out[0]), atol=1e-6)
        assert not np.allclose(np.asarray(out2[1]), np.asarray(out[1]))

    def test_fallback_shapes_use_reference(self):
        # Lq == 1 (pose-token cross-attn) and short-K shapes fall back; the
        # result must still equal the reference exactly
        for b, lq, lk, c, h in [(4, 1, 100, 64, 4), (8, 512, 64, 64, 4)]:
            q, k, v = _mk(b, lq, lk, c)
            ref = _reference_attention(q, k, v, h, (c // h) ** -0.5)
            out = fused_attention(q, k, v, h)
            np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_gradients_match_reference(self):
        q, k, v = _mk(32, 16, 16, 64)
        h = 4
        scale = (64 // h) ** -0.5

        def loss_f(fn):
            return lambda q, k, v: jnp.sum(jnp.sin(fn(q, k, v)))

        g_ref = jax.grad(
            loss_f(lambda q, k, v: _reference_attention(q, k, v, h, scale)),
            argnums=(0, 1, 2),
        )(q, k, v)
        g_fus = jax.grad(
            loss_f(lambda q, k, v: fused_attention(q, k, v, h)), argnums=(0, 1, 2)
        )(q, k, v)
        for a, b_ in zip(g_fus, g_ref):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-5)

    def test_bf16_inputs(self):
        q, k, v = _mk(64, 16, 16, 64, dtype=jnp.bfloat16)
        ref = _reference_attention(q, k, v, 4, (16) ** -0.5)
        out = fused_attention(q, k, v, 4)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32), atol=3e-2
        )
