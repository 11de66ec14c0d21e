#!/usr/bin/env python
"""Micro-bench: correlation-window sampling formulations at the coarse
tracker's shape (M=8192 score maps of 64x64, radius 4 -> 9x9 windows).

The shipped path (ops/corr._sample_windows_scalar) runs TWO batched
two-hot sliver dots per level per iteration; PROFILE.md attributes
~8.7 ms/fwd to these (per-batch-element latency-bound at M=8192).
Candidates re-using the blocked-gather lesson from extract_patches_ex:

  twohot   - shipped: rsel @ vol @ csel^T (two batched sliver dots)
  rowgather- blocked gather of K+1 whole rows + fy row-blend, then the
             column two-hot as ONE batched sliver dot (halves the dots)
  gather2d - one [K+1, K+1] 2-D gather slice per map + 4-tap blend
             (zero-pad by K so clip-mode never misaligns in-range taps;
             validity masks give exact zeros-padding semantics)
  rowrow   - row gather + blend on vol AND vol^T (column stage becomes a
             second row gather after a transpose)

All candidates are checked against _sample_windows_scalar before timing.
"""

import os
import sys
import functools

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from comet_tpu.ops.corr import _sample_windows_scalar
from comet_tpu.utils.profiling import benchmark_fn

M = 8192
H = W = 64
R = 4
K = 2 * R + 1  # 9 window taps
P = K + 1  # 10 gathered rows/cols


def path_twohot(vol, coords):
    return _sample_windows_scalar(vol, coords, R)


def _tap_masks(c0, n):
    """[M, K] validity of floor taps c0+arange(K) and c0+1+arange(K)."""
    ar = jnp.arange(K, dtype=jnp.int32)
    t0 = c0[:, None] + ar
    return (
        ((t0 >= 0) & (t0 < n)),
        ((t0 + 1 >= 0) & (t0 + 1 < n)),
    )


def path_rowgather(vol, coords):
    """Blocked row gather + row blend; column stage stays a sliver dot."""
    m = vol.shape[0]
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fy = (y - y0).astype(vol.dtype)
    y0i = y0.astype(jnp.int32) - R
    x0i = x0.astype(jnp.int32) - R

    # pad rows by K each side: clip-mode start stays exact whenever any
    # tap is in range
    volp = jnp.pad(vol, ((0, 0), (K, K), (0, 0)))
    starts = jnp.stack(
        [jnp.arange(m, dtype=jnp.int32), y0i + K], axis=-1
    )
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1),
    )
    rows = jax.lax.gather(
        volp, starts, dn, slice_sizes=(1, P, W), mode="clip"
    )  # [M, P, W]
    mr0, mr1 = _tap_masks(y0i, H)
    blend = (
        rows[:, :K] * ((1.0 - fy)[:, None, None] * mr0[..., None].astype(vol.dtype))
        + rows[:, 1:] * (fy[:, None, None] * mr1[..., None].astype(vol.dtype))
    )  # [M, K(y), W]

    # column two-hot (one sliver dot instead of two)
    fx = (x - x0).astype(vol.dtype)
    ar = jnp.arange(K, dtype=jnp.int32)
    ci = x0i[:, None] + ar
    ww = jnp.arange(W, dtype=jnp.int32)
    csel = (
        (ci[..., None] == ww).astype(vol.dtype) * (1.0 - fx)[:, None, None]
        + ((ci + 1)[..., None] == ww).astype(vol.dtype) * fx[:, None, None]
    )  # [M, K(x), W]
    out = jnp.einsum(
        "mqw,mpw->mqp", csel, blend, preferred_element_type=vol.dtype
    )
    return out.reshape(m, K * K)


def path_gather2d(vol, coords):
    """One [P, P] 2-D slice per map + 4-tap masked blend."""
    m = vol.shape[0]
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(vol.dtype)
    fy = (y - y0).astype(vol.dtype)
    y0i = y0.astype(jnp.int32) - R
    x0i = x0.astype(jnp.int32) - R

    volp = jnp.pad(vol, ((0, 0), (K, K), (K, K)))
    starts = jnp.stack(
        [jnp.arange(m, dtype=jnp.int32), y0i + K, x0i + K], axis=-1
    )
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1, 2),
    )
    win = jax.lax.gather(
        volp, starts, dn, slice_sizes=(1, P, P), mode="clip"
    )  # [M, P, P]
    mr0, mr1 = _tap_masks(y0i, H)
    mc0, mc1 = _tap_masks(x0i, W)
    wy0 = (1.0 - fy)[:, None] * mr0.astype(vol.dtype)  # [M, K]
    wy1 = fy[:, None] * mr1.astype(vol.dtype)
    wx0 = (1.0 - fx)[:, None] * mc0.astype(vol.dtype)
    wx1 = fx[:, None] * mc1.astype(vol.dtype)
    out = (
        win[:, :K, :K] * (wy0[:, :, None] * wx0[:, None, :])
        + win[:, 1:, :K] * (wy1[:, :, None] * wx0[:, None, :])
        + win[:, :K, 1:] * (wy0[:, :, None] * wx1[:, None, :])
        + win[:, 1:, 1:] * (wy1[:, :, None] * wx1[:, None, :])
    )  # [M, K(y), K(x)]
    # reference channel order is [q(x), p(y)]
    return out.transpose(0, 2, 1).reshape(m, K * K)


def _row_stage(volp, c0i, f, n_true):
    """Shared row gather + blend on [M, Hp, W] padded maps."""
    m = volp.shape[0]
    starts = jnp.stack(
        [jnp.arange(m, dtype=jnp.int32), c0i + K], axis=-1
    )
    dn = jax.lax.GatherDimensionNumbers(
        offset_dims=(1, 2),
        collapsed_slice_dims=(0,),
        start_index_map=(0, 1),
    )
    rows = jax.lax.gather(
        volp, starts, dn, slice_sizes=(1, P, volp.shape[2]), mode="clip"
    )
    m0, m1 = _tap_masks(c0i, n_true)
    return (
        rows[:, :K] * ((1.0 - f)[:, None, None] * m0[..., None].astype(volp.dtype))
        + rows[:, 1:] * (f[:, None, None] * m1[..., None].astype(volp.dtype))
    )


def path_rowrow(vol, coords):
    """Row gather+blend, transpose, second row gather+blend."""
    m = vol.shape[0]
    x = coords[..., 0]
    y = coords[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(vol.dtype)
    fy = (y - y0).astype(vol.dtype)
    y0i = y0.astype(jnp.int32) - R
    x0i = x0.astype(jnp.int32) - R

    volp = jnp.pad(vol, ((0, 0), (K, K), (0, 0)))
    by = _row_stage(volp, y0i, fy, H)  # [M, K(y), W]
    byt = jnp.pad(by.transpose(0, 2, 1), ((0, 0), (K, K), (0, 0)))
    out = _row_stage(byt, x0i, fx, W)  # [M, K(x), K(y)]
    return out.reshape(m, K * K)


key = jax.random.PRNGKey(0)
kv, kc = jax.random.split(key)
vol = jax.random.normal(kv, (M, H, W), jnp.bfloat16)
# mix of interior, near-edge and out-of-image coords
coords = jax.random.uniform(kc, (M, 2), jnp.float32, -8.0, H + 8.0)

ref = jax.jit(path_twohot)(vol, coords).astype(jnp.float32)
for name, fn in [
    ("twohot", path_twohot),
    ("rowgather", path_rowgather),
    ("gather2d", path_gather2d),
    ("rowrow", path_rowrow),
]:
    jfn = jax.jit(fn)
    out = jfn(vol, coords).astype(jnp.float32)
    err = float(jnp.max(jnp.abs(out - ref)))
    stats = benchmark_fn(jfn, vol, coords, reps=32)
    print(f"{name:10s} {stats['ms_per_call']:7.3f} ms  maxerr={err:.2e}")
