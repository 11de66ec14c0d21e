"""Neural building blocks (flax.linen), channel-last, TPU-friendly.

Parity targets: comet/models/modules.py (Mlp:119, AttnBlock:248,
CrossAttnBlock:298, ResidualBlock:39). Architectural quirks of the reference
are preserved deliberately (they affect ported-weight parity):

- AttnBlock/CrossAttnBlock write the *normalized* activations back into the
  residual stream (modules.py:285-294 ``x = self.norm1(x); x = x + attn``),
  unlike standard pre-norm transformers.
- torch ``nn.GELU()`` is the exact (erf) GELU; flax defaults to tanh
  approximation, so we pass approximate=False everywhere.
- torch ``nn.MultiheadAttention`` packs qkv; we keep separate q/k/v Dense
  modules and the weight converter splits the packed tensors.
"""

from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp


class FusedLayerNorm(nn.Module):
    """Drop-in nn.LayerNorm routed through ops.pallas_norm.fused_layer_norm.

    Same parameter tree ("scale"/"bias") and float32-statistics semantics
    as flax nn.LayerNorm. By default this lowers to the plain XLA reference
    (measured faster end-to-end once attention is a Pallas kernel — XLA
    fuses the LN into neighbors); COMET_FUSED_LN=1 switches every instance
    to the Pallas kernel."""

    epsilon: float = 1e-6
    use_scale: bool = True
    use_bias: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas_norm import fused_layer_norm

        c = x.shape[-1]
        scale = (
            self.param("scale", nn.initializers.ones_init(), (c,))
            if self.use_scale else None
        )
        bias = (
            self.param("bias", nn.initializers.zeros_init(), (c,))
            if self.use_bias else None
        )
        return fused_layer_norm(x, scale, bias, self.epsilon).astype(self.dtype)


def gelu(x):
    """GELU matching torch ``nn.GELU()`` (exact erf) under float32.

    Under bfloat16 the tanh approximation is used instead: its error
    (<3e-3 absolute at the worst point) is below the resolution of the
    surrounding bf16 compute, while exact erf costs ~5x the MLP matmul
    time on the TPU VPU (measured: 0.73 ms vs 0.14 ms per ViT block).
    Parity tests run in float32 and therefore exercise the exact path.
    """
    return nn.gelu(x, approximate=(x.dtype == jnp.bfloat16))


# Backwards-compatible alias (parity-testing call sites import this name).
exact_gelu = gelu


class Mlp(nn.Module):
    """Two-layer MLP with exact GELU (modules.py:119-154)."""

    hidden_features: Optional[int] = None
    out_features: Optional[int] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        hidden = self.hidden_features or in_features
        out = self.out_features or in_features
        x = nn.Dense(hidden, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.Dense(out, dtype=self.dtype, name="fc2")(x)
        return x


class SimplePoseEmbedding(nn.Module):
    """Learned pose-encoding embedding: fc -> GELU -> LN -> fc -> LN
    (comet/models/utils.py:690-704 — the reference's replacement for the
    HarmonicEmbedding-based PoseEmbedding; the harmonic variant lives at
    geometry/embeddings.harmonic_embedding). output_dim defaults to the
    reference's 768, hidden = output_dim // 2."""

    output_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # torch nn.LayerNorm default eps (1e-5), not flax's 1e-6
        x = nn.Dense(self.output_dim // 2, dtype=self.dtype, name="fc1")(x)
        x = gelu(x)
        x = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(x)
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc2")(x)
        return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm2")(x)


class PoseEmbedding(nn.Module):
    """Pose-encoding -> token embedding (utils.py:706-721): dispatches to
    the learned SimplePoseEmbedding (the reference's active code path) or
    the NeRF-style harmonic encoding it replaced (kept for capability
    parity with the commented-out HarmonicEmbedding variant)."""

    target_dim: int = 768
    n_harmonic_functions: int = 10
    append_input: bool = True
    learned: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, pose_encoding):
        if self.learned:
            return SimplePoseEmbedding(
                output_dim=self.target_dim, dtype=self.dtype, name="emb"
            )(pose_encoding)
        from ..geometry.embeddings import harmonic_embedding

        return harmonic_embedding(
            pose_encoding,
            n_harmonic_functions=self.n_harmonic_functions,
            append_input=self.append_input,
        )


class MultiHeadAttention(nn.Module):
    """Multi-head attention matching torch nn.MultiheadAttention semantics.

    The q/k/v projections are stored PACKED ([E, 3E], torch in_proj layout,
    converted 1:1 from in_proj_weight) so self-attention runs ONE matmul
    of MXU-friendly width 3E instead of three E-wide slivers — the
    updateformer's E=384 projections were ~40%-MFU bound on N=E tiles.
    Cross-attention does a q matmul plus one packed kv matmul.
    Logits accumulate in float32 regardless of compute dtype.
    """

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, q, k, v, mask=None):
        e = q.shape[-1]
        assert e % self.num_heads == 0
        head_dim = e // self.num_heads

        kernel = self.param(
            "in_proj_kernel", nn.initializers.lecun_normal(), (e, 3 * e)
        )
        bias = self.param("in_proj_bias", nn.initializers.zeros_init(), (3 * e,))
        kc = kernel.astype(self.dtype)
        bc = bias.astype(self.dtype)
        if q is k and k is v:
            qkv = q.astype(self.dtype) @ kc + bc
            wq, wk, wv = jnp.split(qkv, 3, axis=-1)
        else:
            wq = q.astype(self.dtype) @ kc[:, :e] + bc[:e]
            if k is v:
                wkv = k.astype(self.dtype) @ kc[:, e:] + bc[e:]
                wk, wv = jnp.split(wkv, 2, axis=-1)
            else:
                wk = k.astype(self.dtype) @ kc[:, e : 2 * e] + bc[e : 2 * e]
                wv = v.astype(self.dtype) @ kc[:, 2 * e :] + bc[2 * e :]

        def split(x):
            return x.reshape(*x.shape[:-1], self.num_heads, head_dim)

        if mask is None:
            # mask-free path: fused Pallas attention on the native [*, L, C]
            # projection layout (no head-split tensor is ever materialized)
            from ..ops.pallas_attn import fused_attention

            lead = wq.shape[:-2]
            lq, lk = wq.shape[-2], wk.shape[-2]
            out = fused_attention(
                wq.reshape(-1, lq, e),
                wk.reshape(-1, lk, e),
                wv.reshape(-1, lk, e),
                self.num_heads,
            ).reshape(*lead, lq, e)
            return nn.Dense(e, dtype=self.dtype, name="out_proj")(out)

        wq, wk, wv = split(wq), split(wk), split(wv)
        scale = 1.0 / jnp.sqrt(head_dim).astype(self.dtype)
        logits = jnp.einsum(
            "...qhd,...khd->...hqk", wq * scale, wk,
            preferred_element_type=jnp.float32,
        )
        logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
        weights = jax.nn.softmax(logits, axis=-1).astype(self.dtype)
        out = jnp.einsum("...hqk,...khd->...qhd", weights, wv)
        out = out.reshape(*out.shape[:-2], e)
        return nn.Dense(e, dtype=self.dtype, name="out_proj")(out)


class _DenseParams(nn.Module):
    """Declares the params of an nn.Dense (same names/initializers) without
    applying it, so a fused kernel can consume them directly."""

    features: int

    @nn.compact
    def __call__(self, in_features):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (in_features, self.features)
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (self.features,))
        return kernel, bias


class _MHAParams(nn.Module):
    """Param tree of MultiHeadAttention, declared without applying it."""

    @nn.compact
    def __call__(self, e):
        kernel = self.param(
            "in_proj_kernel", nn.initializers.lecun_normal(), (e, 3 * e)
        )
        bias = self.param("in_proj_bias", nn.initializers.zeros_init(), (3 * e,))
        wout, bout = _DenseParams(e, name="out_proj")(e)
        return kernel, bias, wout, bout


class _MlpParams(nn.Module):
    """Param tree of Mlp, declared without applying it."""

    hidden: int

    @nn.compact
    def __call__(self, e):
        w1, b1 = _DenseParams(self.hidden, name="fc1")(e)
        w2, b2 = _DenseParams(e, name="fc2")(self.hidden)
        return w1, b1, w2, b2


class _LNParams(nn.Module):
    """Param tree of an affine FusedLayerNorm, declared without applying."""

    @nn.compact
    def __call__(self, e):
        scale = self.param("scale", nn.initializers.ones_init(), (e,))
        bias = self.param("bias", nn.initializers.zeros_init(), (e,))
        return scale, bias


def _fused_block_enabled() -> bool:
    import os

    return os.environ.get("COMET_FUSED_BLOCK", "1") != "0"


def _fused_cross_enabled() -> bool:
    # Default OFF: the fused cross kernel wins its microbenchmark but
    # regresses the end-to-end forward ~5% (13.94 -> 13.05 seq/s measured —
    # see PROFILE.md negative results); COMET_FUSED_CROSS=1 re-enables.
    import os

    return os.environ.get("COMET_FUSED_CROSS", "0") == "1"


class AttnBlock(nn.Module):
    """Self-attention block (modules.py:248-295). NOTE: the residual stream
    is re-based on the normalized input, exactly like the reference.

    For small-sequence many-row shapes (the track updateformers' time and
    virtual-space blocks: L <= 64, rows >= 256) the whole block lowers to
    ONE Pallas kernel (ops/pallas_block.fused_attn_block) that keeps every
    intermediate in VMEM; the param tree is identical in both paths, so
    checkpoints and the torch converter are unaffected. COMET_FUSED_BLOCK=0
    disables the kernel path."""

    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        e = x.shape[-1]
        if (
            mask is None
            and x.ndim == 3
            and x.shape[1] <= 64
            and x.shape[0] * x.shape[1] >= 256
            and _fused_block_enabled()
        ):
            from ..ops.pallas_block import fused_attn_block

            wqkv, bqkv, wout, bout = _MHAParams(name="attn")(e)
            w1, b1, w2, b2 = _MlpParams(int(e * self.mlp_ratio), name="mlp")(e)
            dt = self.dtype
            return fused_attn_block(
                x.astype(dt),
                wqkv.astype(dt), bqkv.astype(dt),
                wout.astype(dt), bout.astype(dt),
                w1.astype(dt), b1.astype(dt),
                w2.astype(dt), b2.astype(dt),
                self.num_heads,
            )
        x = FusedLayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype,
            name="norm1",
        )(x)
        x = x + MultiHeadAttention(self.num_heads, dtype=self.dtype, name="attn")(
            x, x, x, mask=mask
        )
        y = FusedLayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype,
            name="norm2",
        )(x)
        x = x + Mlp(
            hidden_features=int(e * self.mlp_ratio), dtype=self.dtype, name="mlp"
        )(y)
        return x


class CrossAttnBlock(nn.Module):
    """Cross-attention block (modules.py:298-344).

    A fully fused Pallas kernel exists for qualifying shapes (Lq <= 512,
    Lk <= 1024, rows >= 256 — the updateformers' virtual<->point space
    blocks) with an identical param tree, but it is OFF by default: it
    wins its microbenchmark yet regresses the end-to-end forward ~5%
    (PROFILE.md negative results). COMET_FUSED_CROSS=1 enables it."""

    num_heads: int = 1
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, context, mask=None):
        e = x.shape[-1]
        if (
            mask is None
            and x.ndim == 3
            and context.ndim == 3
            and x.shape[1] <= 512
            and context.shape[1] <= 1024
            and x.shape[0] * x.shape[1] >= 256
            and _fused_cross_enabled()
        ):
            from ..ops.pallas_block import fused_cross_block

            gamma, beta = _LNParams(name="norm_context")(e)
            wqkv, bqkv, wout, bout = _MHAParams(name="cross_attn")(e)
            w1, b1, w2, b2 = _MlpParams(int(e * self.mlp_ratio), name="mlp")(e)
            dt = self.dtype
            return fused_cross_block(
                x.astype(dt), context.astype(dt),
                gamma.astype(dt), beta.astype(dt),
                wqkv[:, :e].astype(dt), bqkv[:e].astype(dt),
                wqkv[:, e:].astype(dt), bqkv[e:].astype(dt),
                wout.astype(dt), bout.astype(dt),
                w1.astype(dt), b1.astype(dt),
                w2.astype(dt), b2.astype(dt),
                self.num_heads,
            )
        x = FusedLayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype,
            name="norm1",
        )(x)
        context = FusedLayerNorm(dtype=self.dtype, name="norm_context")(context)
        x = x + MultiHeadAttention(
            self.num_heads, dtype=self.dtype, name="cross_attn"
        )(x, context, context, mask=mask)
        y = FusedLayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype,
            name="norm2",
        )(x)
        x = x + Mlp(
            hidden_features=int(e * self.mlp_ratio), dtype=self.dtype, name="mlp"
        )(y)
        return x


class InstanceNorm(nn.Module):
    """InstanceNorm2d equivalent for [..., H, W, C]: per-channel, per-sample
    normalization over spatial dims, no affine (torch default)."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        mean = x.mean(axis=(-3, -2), keepdims=True)
        var = x.var(axis=(-3, -2), keepdims=True)
        return (x - mean) * jax.lax.rsqrt(var + self.epsilon)


class GroupNorm(nn.Module):
    """GroupNorm with affine (torch default), channel-last."""

    num_groups: int
    epsilon: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        return nn.GroupNorm(
            num_groups=self.num_groups, epsilon=self.epsilon, dtype=self.dtype
        )(x)


class ResidualBlock(nn.Module):
    """Two 3x3 convs with residual connection (modules.py:39-116).

    norm_fn: "instance" | "group" | "none". Downsample path (1x1 conv +
    norm3) when stride != 1.
    """

    planes: int
    norm_fn: str = "instance"
    stride: int = 1
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    def _norm(self, name):
        if self.norm_fn == "instance":
            return InstanceNorm(name=name)
        if self.norm_fn == "group":
            return nn.GroupNorm(num_groups=self.planes // 8, name=name)
        if self.norm_fn == "none":
            return lambda x: x
        raise NotImplementedError(self.norm_fn)

    @nn.compact
    def __call__(self, x):
        pad = (
            (self.kernel_size // 2, self.kernel_size // 2),
            (self.kernel_size // 2, self.kernel_size // 2),
        )
        y = nn.Conv(
            self.planes, (self.kernel_size, self.kernel_size),
            strides=self.stride, padding=pad, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.relu(self._norm("norm1")(y))
        y = nn.Conv(
            self.planes, (self.kernel_size, self.kernel_size),
            padding=pad, dtype=self.dtype, name="conv2",
        )(y)
        y = nn.relu(self._norm("norm2")(y))
        if self.stride != 1:
            x = nn.Conv(
                self.planes, (1, 1), strides=self.stride, dtype=self.dtype,
                name="downsample",
            )(x)
            x = self._norm("norm3")(x)
        return nn.relu(x + y)
