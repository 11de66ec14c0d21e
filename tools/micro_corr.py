#!/usr/bin/env python
"""Micro-bench window-sampling formulations at real coarse-tracker shapes.

Coarse level 0: M = B*S*N = 8192 score maps [64, 64], radius 4 -> 9x9 window.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from comet_tpu.ops.corr import _sample_windows_scalar
from comet_tpu.utils.profiling import benchmark_fn

M, H, W, R = 8192, 64, 64, 4
K = 2 * R + 1
dt = jnp.bfloat16

key = jax.random.PRNGKey(0)
vol = jax.random.normal(key, (M, H, W), dt)
cen = jax.random.uniform(key, (M, 2)) * (H - 10) + 4


def current(vol, cen):
    return _sample_windows_scalar(vol, cen, R, "zeros")


def band_gather(vol, cen):
    """Pad the maps, gather a (K+1)-row band per track, lerp rows, two-hot
    columns."""
    volp = jnp.pad(vol, ((0, 0), (K + 1, K + 1), (0, 0)))
    x = cen[:, 0]
    y = cen[:, 1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = (y - y0).astype(dt)[:, None, None]
    fx = (x - x0).astype(dt)[:, None, None]
    r0 = y0.astype(jnp.int32) - R + (K + 1)  # start row in padded map
    # gather [M, K+1, W] bands: operand [M, Hp, W], slice (1, K+1, W)
    starts = jnp.stack([jnp.arange(M, dtype=jnp.int32), r0], axis=-1)
    band = jax.lax.gather(
        volp,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1),
        ),
        slice_sizes=(1, K + 1, W),
        mode="clip",
    )  # [M, K+1, W]
    rows = band[:, :K] * (1 - fy) + band[:, 1:] * fy  # [M, K, W]
    # columns via two-hot selection (zeros semantics on raw indices)
    ar = jnp.arange(-R, R + 1, dtype=jnp.int32)
    ci = x0.astype(jnp.int32)[:, None] + ar
    ww = jnp.arange(W, dtype=jnp.int32)
    csel = (
        (ci[:, :, None] == ww).astype(dt) * (1 - fx)
        + ((ci + 1)[:, :, None] == ww).astype(dt) * fx
    )  # [M, K, W]
    out = jnp.einsum("mqw,mpw->mqp", csel, rows, preferred_element_type=dt)
    return out.reshape(M, K * K)


def col_first(vol, cen):
    """Two-hot columns FIRST on the full map (contract lanes), then two-hot
    rows on the narrow result."""
    x = cen[:, 0]
    y = cen[:, 1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = (y - y0).astype(dt)[:, None, None]
    fx = (x - x0).astype(dt)[:, None, None]
    ar = jnp.arange(-R, R + 1, dtype=jnp.int32)
    ri = y0.astype(jnp.int32)[:, None] + ar
    ci = x0.astype(jnp.int32)[:, None] + ar
    hh = jnp.arange(H, dtype=jnp.int32)
    ww = jnp.arange(W, dtype=jnp.int32)
    csel = (
        (ci[:, :, None] == ww).astype(dt) * (1 - fx)
        + ((ci + 1)[:, :, None] == ww).astype(dt) * fx
    )  # [M, K, W]
    rsel = (
        (ri[:, :, None] == hh).astype(dt) * (1 - fy)
        + ((ri + 1)[:, :, None] == hh).astype(dt) * fy
    )  # [M, K, H]
    t = jnp.einsum("mhw,mqw->mhq", vol, csel, preferred_element_type=dt)  # [M,H,K]
    out = jnp.einsum("mph,mhq->mqp", rsel, t, preferred_element_type=dt)
    return out.reshape(M, K * K)


def corner_gather(vol, cen):
    """One gather of (K+1)x(K+1) corner blocks from a zero-padded map, then
    4-corner lerp."""
    volp = jnp.pad(vol, ((0, 0), (K + 1, K + 1), (K + 1, K + 1)))
    x = cen[:, 0]
    y = cen[:, 1]
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    fy = (y - y0).astype(dt)[:, None, None]
    fx = (x - x0).astype(dt)[:, None, None]
    r0 = y0.astype(jnp.int32) - R + (K + 1)
    c0 = x0.astype(jnp.int32) - R + (K + 1)
    starts = jnp.stack([jnp.arange(M, dtype=jnp.int32), r0, c0], axis=-1)
    blk = jax.lax.gather(
        volp,
        starts,
        jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2),
            collapsed_slice_dims=(0,),
            start_index_map=(0, 1, 2),
        ),
        slice_sizes=(1, K + 1, K + 1),
        mode="clip",
    )  # [M, K+1, K+1]
    top = blk[:, :K, :K] * (1 - fx) + blk[:, :K, 1:] * fx
    bot = blk[:, 1:, :K] * (1 - fx) + blk[:, 1:, 1:] * fx
    out = top * (1 - fy) + bot * fy
    return out.reshape(M, K * K)


ref = jax.jit(current)(vol, cen)
for name, fn in [
    ("current(two-hot rows+cols)", current),
    ("band_gather", band_gather),
    ("col_first", col_first),
    ("corner_gather", corner_gather),
]:
    out = jax.jit(fn)(vol, cen)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    st = benchmark_fn(fn, vol, cen, reps=32)
    print(f"{name:30s} {st['ms_per_call']:7.3f} ms   maxerr={err:.2e}")
