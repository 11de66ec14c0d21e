"""Sine/cosine positional embeddings and harmonic encodings, pure jnp.

Parity targets: comet/models/utils.py:724-871 (get_2d_sincos_pos_embed,
get_1d_sincos_pos_embed, get_2d_embedding) and
minipytorch3d/harmonic_embedding.py:14 (HarmonicEmbedding).

All functions return arrays suitable for closing over inside jit (static
shapes); none of them hold parameters.
"""

from __future__ import annotations

from typing import Tuple, Union

import jax
import jax.numpy as jnp


def sincos_1d_from_grid(embed_dim: int, pos: jax.Array) -> jax.Array:
    """1-D sincos embedding: pos [M] -> [M, embed_dim].

    omega_d = 1 / 10000^(d / (D/2)); out = [sin(pos*omega), cos(pos*omega)].
    Matches utils.py:807-832 (computed in float64 there; we compute in f32,
    the difference is below bf16 resolution downstream).
    """
    assert embed_dim % 2 == 0
    omega = jnp.arange(embed_dim // 2, dtype=jnp.float32)
    omega = omega / (embed_dim / 2.0)
    omega = 1.0 / (10000.0**omega)
    pos = pos.reshape(-1).astype(jnp.float32)
    out = pos[:, None] * omega[None, :]
    return jnp.concatenate([jnp.sin(out), jnp.cos(out)], axis=-1)


def sincos_time_embed(embed_dim: int, length: int) -> jax.Array:
    """[1, length, embed_dim] time embedding (utils.py:758-777)."""
    return sincos_1d_from_grid(embed_dim, jnp.arange(length))[None]


def sincos_2d_pos_embed(
    embed_dim: int, grid_size: Union[int, Tuple[int, int]]
) -> jax.Array:
    """2-D sincos positional embedding -> [H*W, embed_dim].

    Half the channels encode the y(h) index, half the x(w) index, matching
    utils.py:724-804: grid from meshgrid(w, h, indexing="xy") then
    emb = [emb(grid[0]=x-ish...), ...]. Note the reference builds
    grid = stack(meshgrid(grid_w, grid_h, indexing="xy")) so grid[0] varies
    along w and grid[1] along h; emb_h uses grid[0] and emb_w uses grid[1].
    We reproduce that exact channel layout.
    """
    if isinstance(grid_size, tuple):
        gh, gw = grid_size
    else:
        gh = gw = grid_size
    ww, hh = jnp.meshgrid(jnp.arange(gw), jnp.arange(gh), indexing="xy")
    emb_h = sincos_1d_from_grid(embed_dim // 2, ww.reshape(-1))
    emb_w = sincos_1d_from_grid(embed_dim // 2, hh.reshape(-1))
    return jnp.concatenate([emb_h, emb_w], axis=-1)  # [gh*gw, D]


def sincos_2d_pos_embed_grid(embed_dim: int, grid_size) -> jax.Array:
    """Same as :func:`sincos_2d_pos_embed` but shaped [H, W, embed_dim]."""
    if isinstance(grid_size, tuple):
        gh, gw = grid_size
    else:
        gh = gw = grid_size
    return sincos_2d_pos_embed(embed_dim, (gh, gw)).reshape(gh, gw, embed_dim)


def embed_2d_coords(xy: jax.Array, C: int, cat_coords: bool = True) -> jax.Array:
    """Per-coordinate sincos embedding of 2-D points.

    xy: [..., 2] -> [..., 2*C] (or [..., 2*C+2] with cat_coords).
    div_term_k = 2k * (1000 / C); pe_x interleaves sin/cos along channels —
    exact layout of utils.py:835-871 (pe_x[0::2]=sin, pe_x[1::2]=cos).
    """
    assert C % 2 == 0
    x = xy[..., 0:1]
    y = xy[..., 1:2]
    div_term = (jnp.arange(0, C, 2, dtype=jnp.float32) * (1000.0 / C)).reshape(
        *([1] * (xy.ndim - 1)), C // 2
    )

    def interleave(sin, cos):
        # [..., C/2] x2 -> [..., C] with even=sin, odd=cos
        stacked = jnp.stack([sin, cos], axis=-1)
        return stacked.reshape(*stacked.shape[:-2], C)

    pe_x = interleave(jnp.sin(x * div_term), jnp.cos(x * div_term))
    pe_y = interleave(jnp.sin(y * div_term), jnp.cos(y * div_term))
    pe = jnp.concatenate([pe_x, pe_y], axis=-1)
    if cat_coords:
        pe = jnp.concatenate([xy, pe], axis=-1)
    return pe


def harmonic_embedding(
    x: jax.Array,
    n_harmonic_functions: int = 6,
    omega_0: float = 1.0,
    logspace: bool = True,
    append_input: bool = False,
) -> jax.Array:
    """NeRF-style harmonic embedding (minipytorch3d/harmonic_embedding.py:14).

    x: [..., D] -> [..., D * 2 * n (+ D if append_input)], layout
    [sin(x*f1), ..., sin(x*fn), cos(x*f1), ..., cos(x*fn), (x)].
    """
    if logspace:
        freqs = 2.0 ** jnp.arange(n_harmonic_functions, dtype=jnp.float32)
    else:
        freqs = jnp.linspace(
            1.0, 2.0 ** (n_harmonic_functions - 1), n_harmonic_functions
        )
    freqs = freqs * omega_0
    embed = x[..., None] * freqs  # [..., D, n]
    embed = embed.reshape(*x.shape[:-1], -1)  # [..., D*n]
    out = jnp.concatenate([jnp.sin(embed), jnp.cos(embed)], axis=-1)
    if append_input:
        out = jnp.concatenate([out, x], axis=-1)
    return out
