"""Fully fused transformer block (ops/pallas_block) vs the unfused AttnBlock.

The fused path must (a) match the plain-jnp block reference, (b) produce the
SAME param tree as the unfused AttnBlock (checkpoint/converter compatibility),
(c) match the unfused AttnBlock's outputs and gradients on the same params.
Runs in interpret mode on CPU so the kernel code itself is exercised.

Parity target: comet/models/modules.py:248-295 (AttnBlock), whose semantics
models/blocks.AttnBlock carries (torch-verified in test_torch_parity.py).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from comet_tpu.models.blocks import AttnBlock, CrossAttnBlock
from comet_tpu.ops.pallas_block import (
    _cross_reference,
    _seq_reference,
    fused_attn_block,
    fused_cross_block,
)


def _mk_params(key, c, hidden, dtype=jnp.float32):
    ks = jax.random.split(key, 5)
    s = 0.1
    return dict(
        wqkv=jax.random.normal(ks[0], (c, 3 * c), dtype) * s,
        bqkv=jax.random.normal(ks[1], (3 * c,), dtype) * s,
        wout=jax.random.normal(ks[2], (c, c), dtype) * s,
        bout=jnp.zeros((c,), dtype),
        w1=jax.random.normal(ks[3], (c, hidden), dtype) * s,
        b1=jnp.zeros((hidden,), dtype),
        w2=jax.random.normal(ks[4], (hidden, c), dtype) * s,
        b2=jnp.zeros((c,), dtype),
    )


class TestFusedBlockKernel:
    @pytest.mark.parametrize(
        "b,l,c,h",
        [
            (64, 16, 128, 8),   # time-block shape class (g=32 packing)
            (16, 64, 128, 8),   # virtual-space shape class (g=8)
            (37, 16, 64, 4),    # batch needs pad+crop
        ],
    )
    def test_matches_reference(self, b, l, c, h):
        p = _mk_params(jax.random.PRNGKey(0), c, 4 * c)
        x = jax.random.normal(jax.random.PRNGKey(1), (b, l, c))
        ref = _seq_reference(x, *p.values(), num_heads=h)
        out = fused_attn_block(x, *p.values(), num_heads=h)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_no_cross_sequence_leak(self):
        c, h = 64, 4
        p = _mk_params(jax.random.PRNGKey(2), c, 4 * c)
        x = jax.random.normal(jax.random.PRNGKey(3), (64, 16, c))
        x = x.at[1].set(x[0])
        out = fused_attn_block(x, *p.values(), num_heads=h)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-6)
        x2 = x.at[1].add(3.0)
        out2 = fused_attn_block(x2, *p.values(), num_heads=h)
        np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(out[0]), atol=1e-6)

    def test_gradients_match_reference(self):
        c, h = 64, 4
        p = _mk_params(jax.random.PRNGKey(4), c, 2 * c)
        x = jax.random.normal(jax.random.PRNGKey(5), (32, 16, c))
        args = list(p.values())

        def loss(fn, x, *a):
            return jnp.sum(jnp.sin(fn(x, *a, num_heads=h)))

        g_ref = jax.grad(lambda x, *a: loss(_seq_reference, x, *a), argnums=(0, 1, 5))(
            x, *args
        )
        g_fus = jax.grad(lambda x, *a: loss(fused_attn_block, x, *a), argnums=(0, 1, 5))(
            x, *args
        )
        for a, b in zip(g_fus, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5
            )


class TestAttnBlockFusedPath:
    def _init_apply(self, x, monkeypatch, fused, h=8):
        monkeypatch.setenv("COMET_FUSED_BLOCK", "1" if fused else "0")
        blk = AttnBlock(num_heads=h)
        params = blk.init(jax.random.PRNGKey(0), x)
        return blk, params

    def test_param_tree_identical(self, monkeypatch):
        x = jnp.zeros((64, 16, 128))
        _, p_fused = self._init_apply(x, monkeypatch, fused=True)
        _, p_plain = self._init_apply(x, monkeypatch, fused=False)
        tf = jax.tree_util.tree_structure(p_fused)
        tp = jax.tree_util.tree_structure(p_plain)
        assert tf == tp
        for a, b in zip(jax.tree_util.tree_leaves(p_fused),
                        jax.tree_util.tree_leaves(p_plain)):
            assert a.shape == b.shape

    def test_outputs_match_unfused(self, monkeypatch):
        x = jax.random.normal(jax.random.PRNGKey(1), (64, 16, 128)) * 0.5
        blk, params = self._init_apply(x, monkeypatch, fused=False)
        ref = blk.apply(params, x)
        monkeypatch.setenv("COMET_FUSED_BLOCK", "1")
        out = blk.apply(params, x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=3e-5)

    def test_gradients_match_unfused(self, monkeypatch):
        x = jax.random.normal(jax.random.PRNGKey(2), (32, 16, 64)) * 0.5
        monkeypatch.setenv("COMET_FUSED_BLOCK", "0")
        blk = AttnBlock(num_heads=4)
        params = blk.init(jax.random.PRNGKey(0), x)

        def loss(p, x):
            return jnp.sum(jnp.sin(blk.apply(p, x)))

        g_ref = jax.grad(loss)(params, x)
        monkeypatch.setenv("COMET_FUSED_BLOCK", "1")
        g_fus = jax.grad(loss)(params, x)
        for a, b in zip(jax.tree_util.tree_leaves(g_fus),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-5
            )

    def test_small_and_masked_shapes_keep_plain_path(self, monkeypatch):
        # rows < 256 (camera-predictor trunk) and masked calls must not take
        # the kernel path but still produce the same tree and finite outputs
        monkeypatch.setenv("COMET_FUSED_BLOCK", "1")
        x = jax.random.normal(jax.random.PRNGKey(3), (1, 16, 64))
        blk = AttnBlock(num_heads=4)
        params = blk.init(jax.random.PRNGKey(0), x)
        out = blk.apply(params, x)
        assert np.isfinite(np.asarray(out)).all()
        mask = jnp.ones((64, 1, 16, 16), dtype=bool)
        xb = jax.random.normal(jax.random.PRNGKey(4), (64, 16, 64))
        out_m = blk.apply(params, xb, mask=mask)
        assert np.isfinite(np.asarray(out_m)).all()

    def test_bf16(self, monkeypatch):
        monkeypatch.setenv("COMET_FUSED_BLOCK", "0")
        x = jax.random.normal(jax.random.PRNGKey(5), (64, 16, 128)) * 0.5
        blk = AttnBlock(num_heads=8, dtype=jnp.bfloat16)
        params = blk.init(jax.random.PRNGKey(0), x)
        ref = blk.apply(params, x)
        monkeypatch.setenv("COMET_FUSED_BLOCK", "1")
        out = blk.apply(params, x)
        assert out.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(out, np.float32), np.asarray(ref, np.float32),
            atol=5e-2, rtol=5e-2,
        )


def _mk_cross_params(key, c, hidden, dtype=jnp.float32):
    ks = jax.random.split(key, 6)
    s = 0.1
    return dict(
        gamma=1.0 + jax.random.normal(ks[0], (c,), dtype) * 0.05,
        beta=jax.random.normal(ks[1], (c,), dtype) * 0.05,
        wq=jax.random.normal(ks[2], (c, c), dtype) * s,
        bq=jnp.zeros((c,), dtype),
        wkv=jax.random.normal(ks[3], (c, 2 * c), dtype) * s,
        bkv=jnp.zeros((2 * c,), dtype),
        wout=jax.random.normal(ks[4], (c, c), dtype) * s,
        bout=jnp.zeros((c,), dtype),
        w1=jax.random.normal(ks[5], (c, hidden), dtype) * s,
        b1=jnp.zeros((hidden,), dtype),
        w2=jax.random.normal(ks[0], (hidden, c), dtype) * s,
        b2=jnp.zeros((c,), dtype),
    )


class TestFusedCrossKernel:
    @pytest.mark.parametrize(
        "b,lq,lk,c,h",
        [
            (16, 64, 512, 128, 8),  # virtual->point shape class (g=2)
            (16, 512, 64, 128, 8),  # point->virtual shape class (g=1)
            (37, 16, 48, 64, 4),    # batch pad+crop, odd lengths
        ],
    )
    def test_matches_reference(self, b, lq, lk, c, h):
        p = _mk_cross_params(jax.random.PRNGKey(0), c, 4 * c)
        kx, kc_ = jax.random.split(jax.random.PRNGKey(1))
        x = jax.random.normal(kx, (b, lq, c))
        ctx = jax.random.normal(kc_, (b, lk, c))
        ref = _cross_reference(x, ctx, *p.values(), num_heads=h)
        out = fused_cross_block(x, ctx, *p.values(), num_heads=h)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-5
        )

    def test_no_cross_sequence_leak(self):
        c, h = 64, 4
        p = _mk_cross_params(jax.random.PRNGKey(2), c, 2 * c)
        kx, kc_ = jax.random.split(jax.random.PRNGKey(3))
        x = jax.random.normal(kx, (16, 64, c))
        ctx = jax.random.normal(kc_, (16, 128, c))
        x = x.at[1].set(x[0])
        ctx = ctx.at[1].set(ctx[0])
        out = fused_cross_block(x, ctx, *p.values(), num_heads=h)
        np.testing.assert_allclose(np.asarray(out[0]), np.asarray(out[1]), atol=1e-6)
        ctx2 = ctx.at[1].add(3.0)
        out2 = fused_cross_block(x, ctx2, *p.values(), num_heads=h)
        np.testing.assert_allclose(np.asarray(out2[0]), np.asarray(out[0]), atol=1e-6)

    def test_gradients_match_reference(self):
        c, h = 64, 4
        p = _mk_cross_params(jax.random.PRNGKey(4), c, 2 * c)
        kx, kc_ = jax.random.split(jax.random.PRNGKey(5))
        x = jax.random.normal(kx, (16, 32, c))
        ctx = jax.random.normal(kc_, (16, 64, c))
        args = list(p.values())

        def loss(fn, x, ctx, *a):
            return jnp.sum(jnp.sin(fn(x, ctx, *a, num_heads=h)))

        g_ref = jax.grad(
            lambda x, ctx, *a: loss(_cross_reference, x, ctx, *a),
            argnums=(0, 1, 2, 6),
        )(x, ctx, *args)
        g_fus = jax.grad(
            lambda x, ctx, *a: loss(fused_cross_block, x, ctx, *a),
            argnums=(0, 1, 2, 6),
        )(x, ctx, *args)
        for a, b in zip(g_fus, g_ref):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-5
            )


class TestCrossAttnBlockFusedPath:
    def test_param_tree_identical(self, monkeypatch):
        x = jnp.zeros((16, 64, 128))
        ctx = jnp.zeros((16, 256, 128))
        trees = {}
        for flag in ("0", "1"):
            monkeypatch.setenv("COMET_FUSED_CROSS", flag)
            blk = CrossAttnBlock(num_heads=8)
            trees[flag] = blk.init(jax.random.PRNGKey(0), x, ctx)
        assert (
            jax.tree_util.tree_structure(trees["0"])
            == jax.tree_util.tree_structure(trees["1"])
        )
        for a, b in zip(jax.tree_util.tree_leaves(trees["0"]),
                        jax.tree_util.tree_leaves(trees["1"])):
            assert a.shape == b.shape

    def test_outputs_match_unfused(self, monkeypatch):
        kx, kc_ = jax.random.split(jax.random.PRNGKey(1))
        x = jax.random.normal(kx, (16, 64, 128)) * 0.5
        ctx = jax.random.normal(kc_, (16, 256, 128)) * 0.5
        monkeypatch.setenv("COMET_FUSED_CROSS", "0")
        blk = CrossAttnBlock(num_heads=8)
        params = blk.init(jax.random.PRNGKey(0), x, ctx)
        ref = blk.apply(params, x, ctx)
        monkeypatch.setenv("COMET_FUSED_CROSS", "1")
        out = blk.apply(params, x, ctx)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=3e-5, rtol=1e-5
        )

    def test_gradients_match_unfused(self, monkeypatch):
        kx, kc_ = jax.random.split(jax.random.PRNGKey(2))
        x = jax.random.normal(kx, (16, 32, 64)) * 0.5
        ctx = jax.random.normal(kc_, (16, 48, 64)) * 0.5
        monkeypatch.setenv("COMET_FUSED_CROSS", "0")
        blk = CrossAttnBlock(num_heads=4)
        params = blk.init(jax.random.PRNGKey(0), x, ctx)

        def loss(p, x, ctx):
            return jnp.sum(jnp.sin(blk.apply(p, x, ctx)))

        g_ref = jax.grad(loss)(params, x, ctx)
        monkeypatch.setenv("COMET_FUSED_CROSS", "1")
        g_fus = jax.grad(loss)(params, x, ctx)
        for a, b in zip(jax.tree_util.tree_leaves(g_fus),
                        jax.tree_util.tree_leaves(g_ref)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=3e-5, rtol=1e-5
            )

    def test_pose_token_shape_keeps_plain_path(self, monkeypatch):
        # Lq == 1, rows 16 (camera-predictor T_P cross blocks) must not
        # take the kernel path and must stay finite
        monkeypatch.setenv("COMET_FUSED_CROSS", "1")
        kx, kc_ = jax.random.split(jax.random.PRNGKey(3))
        x = jax.random.normal(kx, (16, 1, 64))
        ctx = jax.random.normal(kc_, (16, 512, 64))
        blk = CrossAttnBlock(num_heads=4)
        params = blk.init(jax.random.PRNGKey(0), x, ctx)
        out = blk.apply(params, x, ctx)
        assert out.shape == x.shape
        assert np.isfinite(np.asarray(out)).all()
