#!/usr/bin/env python
"""Micro-bench: full 5-level coarse correlation sampling — per-level two-hot
(current) vs levels packed into one map (one pair of batched matmuls)."""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

from comet_tpu.ops.corr import _sample_windows_scalar, avg_pool_2x2
from comet_tpu.utils.profiling import benchmark_fn

M, H, W, R, L = 8192, 64, 64, 4, 5
K = 2 * R + 1
dt = jnp.bfloat16

key = jax.random.PRNGKey(0)
vol0 = jax.random.normal(key, (M, H, W), dt)
cen0 = jax.random.uniform(key, (M, 2)) * (H - 10) + 4


def pool_chain(vol0):
    vols = [vol0]
    for _ in range(L - 1):
        vols.append(avg_pool_2x2(vols[-1][..., None])[..., 0])
    return vols


def per_level(vol0, cen0):
    vols = pool_chain(vol0)
    outs = []
    for lvl, v in enumerate(vols):
        outs.append(_sample_windows_scalar(v, cen0 / (2.0**lvl), R, "zeros"))
    return jnp.concatenate(outs, axis=-1)


def packed(vol0, cen0):
    vols = pool_chain(vol0)
    ws = [v.shape[-1] for v in vols]
    packed_map = jnp.concatenate(
        [jnp.pad(v, ((0, 0), (0, H - v.shape[1]), (0, 0))) for v in vols], axis=-1
    )  # [M, H, sum(ws)]
    ar = jnp.arange(-R, R + 1, dtype=jnp.int32)
    rsels, csels = [], []
    hh = jnp.arange(H, dtype=jnp.int32)
    wsum = packed_map.shape[-1]
    wall = jnp.arange(wsum, dtype=jnp.int32)
    off = 0
    for lvl, v in enumerate(vols):
        hl, wl = v.shape[1], v.shape[2]
        cen = cen0 / (2.0**lvl)
        x0 = jnp.floor(cen[:, 0])
        y0 = jnp.floor(cen[:, 1])
        fx = (cen[:, 0] - x0).astype(dt)[:, None, None]
        fy = (cen[:, 1] - y0).astype(dt)[:, None, None]
        ri = y0.astype(jnp.int32)[:, None] + ar
        ci = x0.astype(jnp.int32)[:, None] + ar
        # zeros semantics: raw-index comparison; rows beyond hl are zero-padded
        # in the packed map so only the negative side needs exclusion
        r0 = jnp.where(ri < 0, -1, ri)
        r1 = jnp.where(ri + 1 < 0, -1, jnp.where(ri + 1 >= hl, -1, ri + 1))
        r0 = jnp.where(r0 >= hl, -1, r0)
        rsel = (
            (r0[:, :, None] == hh).astype(dt) * (1 - fy)
            + (r1[:, :, None] == hh).astype(dt) * fy
        )
        c_abs0 = jnp.where((ci < 0) | (ci >= wl), -1, ci + off)
        c_abs1 = jnp.where((ci + 1 < 0) | (ci + 1 >= wl), -1, ci + 1 + off)
        csel = (
            (c_abs0[:, :, None] == wall).astype(dt) * (1 - fx)
            + (c_abs1[:, :, None] == wall).astype(dt) * fx
        )
        rsels.append(rsel)
        csels.append(csel)
        off += wl
    rsel = jnp.concatenate(rsels, axis=1)  # [M, L*K, H]
    csel = jnp.concatenate(csels, axis=1)  # [M, L*K, wsum]
    t = jnp.einsum("mph,mhw->mpw", rsel, packed_map, preferred_element_type=dt)
    out = jnp.einsum("mqw,mpw->mqp", csel, t, preferred_element_type=dt)
    # out [M, L*K (x), L*K (y)]: take the diagonal 9x9 blocks, level by level
    blocks = [
        out[:, lvl * K : (lvl + 1) * K, lvl * K : (lvl + 1) * K].reshape(M, K * K)
        for lvl in range(L)
    ]
    return jnp.concatenate(blocks, axis=-1)


ref = jax.jit(per_level)(vol0, cen0)
for name, fn in [("per_level(current)", per_level), ("packed", packed)]:
    out = jax.jit(fn)(vol0, cen0)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32))))
    st = benchmark_fn(fn, vol0, cen0, reps=16)
    print(f"{name:25s} {st['ms_per_call']:7.3f} ms   maxerr={err:.2e}")
