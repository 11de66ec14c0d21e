"""DINOv2-style ViT backbone (flax.linen), used frozen as the image encoder.

Architecture parity with the torch.hub ``dinov2_vitb14_reg`` model the
reference loads (comet/models/camera_predictor10.py:607-612): patch size 14,
embed dim 768, 12 blocks, 12 heads, MLP ratio 4, 1 cls token + 4 register
tokens, LayerScale on both branches, final LayerNorm; we return the
normalized patch tokens (``x_norm_patchtokens``).

The position embedding is stored pre-interpolated for the configured input
resolution (default 336 -> 24x24 grid). The torch->flax weight converter
(tools/convert_torch_weights.py) resamples DINOv2's 37x37 grid with torch's
own bicubic interpolation before export, so no on-the-fly interpolation is
needed (and parity doesn't hinge on matching torch's bicubic kernel).
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from .blocks import FusedLayerNorm, gelu


class ViTAttention(nn.Module):
    """Standard ViT attention with fused qkv (DINOv2 layout)."""

    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, n, c = x.shape
        qkv = nn.Dense(3 * c, dtype=self.dtype, name="qkv")(x)
        # DINOv2 packs the 3C output as (3, H, D): channels [0, C) are all
        # heads of Q concatenated — exactly fused_attention's native layout,
        # so no head-split tensor is ever materialized. The kernel keeps the
        # [N, N] logits in f32 in VMEM (never written to HBM), which beats
        # the previous bf16-logit-storage einsum both in traffic and in
        # accuracy (measured 0.88 -> 0.47 ms/block at 16x581 tokens).
        from ..ops.pallas_attn import fused_attention

        q, k, v = qkv[..., :c], qkv[..., c : 2 * c], qkv[..., 2 * c :]
        out = fused_attention(q, k, v, self.num_heads)
        return nn.Dense(c, dtype=self.dtype, name="proj")(out)


class LayerScale(nn.Module):
    dim: int
    init_value: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", nn.initializers.constant(self.init_value), (self.dim,)
        )
        return x * gamma.astype(x.dtype)


class ViTBlock(nn.Module):
    num_heads: int
    mlp_ratio: float = 4.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = FusedLayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm1")(x)
        y = ViTAttention(self.num_heads, dtype=self.dtype, name="attn")(y)
        x = x + LayerScale(c, name="ls1")(y)
        y = FusedLayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm2")(x)
        y = nn.Dense(int(c * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(y)
        y = gelu(y)
        y = nn.Dense(c, dtype=self.dtype, name="mlp_fc2")(y)
        x = x + LayerScale(c, name="ls2")(y)
        return x


class DinoViT(nn.Module):
    """ViT with registers; returns normalized patch tokens [B, P, C]."""

    img_size: int = 336
    patch_size: int = 14
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_register_tokens: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, images: jax.Array, return_cls: bool = False):
        """images: [B, H, W, 3], ImageNet-normalized. H and W must be
        multiples of ``patch_size``; when they differ from ``img_size`` the
        position embedding is bicubically resampled to the actual grid (the
        parity-tested path uses H == W == img_size, where no resampling
        happens).

        ``return_cls=True`` additionally returns the normalized cls token
        [B, C] (DINOv2's ``x_norm_clstoken``, the global descriptor used by
        gluefactory's DinoV2 backbone, models/backbones/dinov2.py:21-28).
        """
        b = images.shape[0]
        grid = self.img_size // self.patch_size
        num_patches = grid * grid
        # actual (possibly rectangular) patch grid of this input; DINOv2
        # supports any multiple-of-14 size by interpolating its position
        # embedding (dinov2 interpolate_pos_encoding; used by gluefactory's
        # DinoV2 backbone at arbitrary aspect, models/backbones/dinov2.py:18)
        gh = images.shape[1] // self.patch_size
        gw = images.shape[2] // self.patch_size

        x = nn.Conv(
            self.embed_dim,
            (self.patch_size, self.patch_size),
            strides=self.patch_size,
            padding="VALID",
            dtype=self.dtype,
            name="patch_embed",
        )(images)
        x = x.reshape(b, gh * gw, self.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, self.embed_dim)
        ).astype(self.dtype)
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, num_patches + 1, self.embed_dim),
        ).astype(self.dtype)
        if (gh, gw) != (grid, grid):
            # torch-bicubic (a=-0.75, no antialias): matches DINOv2's
            # interpolate_pos_encoding and the offline converter resample
            # (ADVICE r3 #2 — jax.image.resize "cubic" is a=-0.5 + AA)
            from ..ops.bilinear import resize_bicubic_torch

            patch_pos = resize_bicubic_torch(
                pos_embed[0, 1:].reshape(grid, grid, self.embed_dim),
                gh, gw,
            ).reshape(1, gh * gw, self.embed_dim)
            pos_embed = jnp.concatenate([pos_embed[:, :1], patch_pos], axis=1)

        x = jnp.concatenate([jnp.broadcast_to(cls_token, (b, 1, self.embed_dim)), x], axis=1)
        x = x + pos_embed

        if self.num_register_tokens:
            registers = self.param(
                "register_tokens",
                nn.initializers.zeros,
                (1, self.num_register_tokens, self.embed_dim),
            ).astype(self.dtype)
            x = jnp.concatenate(
                [
                    x[:, :1],
                    jnp.broadcast_to(
                        registers, (b, self.num_register_tokens, self.embed_dim)
                    ),
                    x[:, 1:],
                ],
                axis=1,
            )

        for i in range(self.depth):
            x = ViTBlock(
                self.num_heads, self.mlp_ratio, dtype=self.dtype, name=f"blocks_{i}"
            )(x)

        x = FusedLayerNorm(epsilon=1e-6, dtype=self.dtype, name="norm")(x)
        # drop cls + registers -> patch tokens only (x_norm_patchtokens)
        patches = x[:, 1 + self.num_register_tokens :]
        if return_cls:
            return patches, x[:, 0]
        return patches
