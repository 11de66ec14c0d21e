"""EfficientUpdateFormer: factorized time/space track-update transformer.

Parity target: comet/models/track_modules/blocks.py:205-348. Time attention
runs over (B*N, T) sequences; space attention over (B*T, N) via 64 learnable
virtual tracks with cross-attention in both directions; a residual of the
input tokens is added before the flow head (blocks.py:345).
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from .blocks import AttnBlock, CrossAttnBlock


class EfficientUpdateFormer(nn.Module):
    space_depth: int = 6
    time_depth: int = 6
    hidden_size: int = 384
    num_heads: int = 8
    output_dim: int = 130
    mlp_ratio: float = 4.0
    add_space_attn: bool = True
    num_virtual_tracks: int = 64
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        """x: [B, N, T, D_in] -> flow [B, N, T, output_dim]."""
        b, n_pts, t, _ = x.shape
        tokens = nn.Dense(self.hidden_size, dtype=self.dtype, name="input_transform")(x)
        init_tokens = tokens

        if self.add_space_attn:
            virtual = self.param(
                "virtual_tracks",
                nn.initializers.normal(1.0),
                (1, self.num_virtual_tracks, 1, self.hidden_size),
            ).astype(self.dtype)
            virtual = jnp.broadcast_to(
                virtual, (b, self.num_virtual_tracks, t, self.hidden_size)
            )
            tokens = jnp.concatenate([tokens, virtual], axis=1)

        n = tokens.shape[1]
        space_every = (
            self.time_depth // self.space_depth if self.add_space_attn else 0
        )

        j = 0
        for i in range(self.time_depth):
            time_tokens = tokens.reshape(b * n, t, self.hidden_size)
            time_tokens = AttnBlock(
                self.num_heads, self.mlp_ratio, dtype=self.dtype,
                name=f"time_blocks_{i}",
            )(time_tokens)
            tokens = time_tokens.reshape(b, n, t, self.hidden_size)

            if self.add_space_attn and i % space_every == 0:
                space_tokens = tokens.transpose(0, 2, 1, 3).reshape(
                    b * t, n, self.hidden_size
                )
                point_tokens = space_tokens[:, : n - self.num_virtual_tracks]
                virtual_tokens = space_tokens[:, n - self.num_virtual_tracks :]

                virtual_tokens = CrossAttnBlock(
                    self.num_heads, self.mlp_ratio, dtype=self.dtype,
                    name=f"space_virtual2point_blocks_{j}",
                )(virtual_tokens, point_tokens)
                virtual_tokens = AttnBlock(
                    self.num_heads, self.mlp_ratio, dtype=self.dtype,
                    name=f"space_virtual_blocks_{j}",
                )(virtual_tokens)
                point_tokens = CrossAttnBlock(
                    self.num_heads, self.mlp_ratio, dtype=self.dtype,
                    name=f"space_point2virtual_blocks_{j}",
                )(point_tokens, virtual_tokens)

                space_tokens = jnp.concatenate([point_tokens, virtual_tokens], axis=1)
                tokens = space_tokens.reshape(b, t, n, self.hidden_size).transpose(
                    0, 2, 1, 3
                )
                j += 1

        if self.add_space_attn:
            tokens = tokens[:, : n - self.num_virtual_tracks]

        tokens = tokens + init_tokens
        return nn.Dense(self.output_dim, dtype=self.dtype, name="flow_head")(tokens)
