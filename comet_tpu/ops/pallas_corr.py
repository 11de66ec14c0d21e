"""Pallas TPU kernels for the tracker's hot ops.

XLA lowers the tracker's scattered window gathers (ops/corr.py) to generic
gather HLOs that run ~50x off peak on TPU and explode compile time at large
batch. These kernels reformulate the work as per-track DMA + dense math:

**Fused correlation sampling** — for one track at position c, ALL (2r+1)²
window samples share the same bilinear fractional weights (the window
offsets are integers), so the whole window is a blend of 4 shifted views of
one (2r+2)² patch:

    patch  = fmap[floor(cy)-r : +2r+2, floor(cx)-r : +2r+2, :]   (DMA)
    m      = patch · track_feat                                   (C-reduction)
    window = w00·m[:-1,:-1] + w01·m[:-1,1:] + w10·m[1:,:-1] + w11·m[1:,1:]

Border handling is exact: feature maps are edge-replicated by PAD = 2r+2 and
float coords clamped to [-r-1, size+r]; beyond that range every bilinear
neighbour clamps to the border pixel and the weights sum to 1, so the result
equals grid_sample's border padding bit-for-bit.

Mosaic vector loads need 8-aligned dynamic starts on tiled dims, so patches
are fetched with the DMA engines (arbitrary offsets) from HBM into a
double-buffered VMEM scratch: tracks are processed in chunks of 8, chunk
k+1's 8 DMAs are in flight while chunk k computes. One pallas_call per
pyramid level (grid = batch*frames).

**Patch extraction** — refine_track's 31x31 RGB patches: pure per-track
DMAs from the HBM frame straight into the VMEM output block.
"""

from __future__ import annotations

import functools
from typing import List, Sequence

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_CHUNK = 8  # tracks per pipeline stage (sublane-aligned)


def _round8(x: int) -> int:
    return ((x + 7) // 8) * 8


def _use_interpret() -> bool:
    return jax.default_backend() == "cpu"


# ---------------------------------------------------------------------------
# fused correlation window sampling
# ---------------------------------------------------------------------------

def _corr_level_kernel(
    radius, iy_ref, ix_ref, w_ref, tf_ref, fmap_ref, out_ref, patch_buf, sems
):
    bs_idx = pl.program_id(0)
    n_tracks = out_ref.shape[1]
    num_chunks = n_tracks // _CHUNK
    p = 2 * radius + 2
    pw = _round8(p)  # sublane-dim slice size must be a multiple of 8

    def chunk_dma(chunk, slot, j):
        base = chunk * _CHUNK
        iy = iy_ref[0, 0, base + j]
        ix = ix_ref[0, 0, base + j]
        return pltpu.make_async_copy(
            fmap_ref.at[bs_idx, pl.ds(iy, p), pl.ds(ix, pw), :],
            patch_buf.at[slot, j],
            sems.at[slot, j],
        )

    def start_chunk(chunk, slot):
        for j in range(_CHUNK):
            chunk_dma(chunk, slot, j).start()

    def wait_chunk(chunk, slot):
        for j in range(_CHUNK):
            chunk_dma(chunk, slot, j).wait()

    start_chunk(0, 0)

    def body(chunk, _):
        slot = jax.lax.rem(chunk, 2)
        next_slot = jax.lax.rem(chunk + 1, 2)

        @pl.when(chunk + 1 < num_chunks)
        def _():
            start_chunk(chunk + 1, next_slot)

        wait_chunk(chunk, slot)

        base = pl.multiple_of(chunk * _CHUNK, _CHUNK)
        tf8 = tf_ref[0, pl.ds(base, _CHUNK), :]  # [8, C]
        patches = patch_buf[slot]  # [8, P, P, C]
        m = jnp.sum(
            patches.astype(jnp.float32) * tf8[:, None, None, :].astype(jnp.float32),
            axis=-1,
        )  # [8, P, P]

        w = w_ref[0, pl.ds(base, _CHUNK), :]  # [8, 4]
        kk = p - 1
        win = (
            w[:, 0][:, None, None] * m[:, : kk, : kk]
            + w[:, 1][:, None, None] * m[:, : kk, 1 : kk + 1]
            + w[:, 2][:, None, None] * m[:, 1 : kk + 1, : kk]
            + w[:, 3][:, None, None] * m[:, 1 : kk + 1, 1 : kk + 1]
        )  # [8, kk, kk], rows = y-offset
        out_ref[0, pl.ds(base, _CHUNK)] = win
        return 0

    jax.lax.fori_loop(0, num_chunks, body, 0)


def _corr_one_level(fmap_padded, iy, ix, wts, tf, radius, interpret):
    bs, hp, wp, c = fmap_padded.shape
    n = iy.shape[-1]
    kk = 2 * radius + 1
    p = 2 * radius + 2
    return pl.pallas_call(
        functools.partial(_corr_level_kernel, radius),
        out_shape=jax.ShapeDtypeStruct((bs, n, kk, kk), jnp.float32),
        grid=(bs,),
        in_specs=[
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, n), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, n, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, c), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),  # fmap stays in HBM
        ],
        out_specs=pl.BlockSpec(
            (1, n, kk, kk), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[
            pltpu.VMEM((2, _CHUNK, p, _round8(p), c), fmap_padded.dtype),
            pltpu.SemaphoreType.DMA((2, _CHUNK)),
        ],
        interpret=interpret,
    )(iy, ix, wts, tf, fmap_padded)


def corr_pyramid_sample_pallas(
    padded_pyramid: Sequence[jax.Array],  # level l: [BS, Hp_l, Wp_l, C]
    coords: jax.Array,  # [B, S, N, 2] level-0 float coords
    track_feats: jax.Array,  # [B, S, N, C]
    radius: int,
    interpret: bool = None,
) -> jax.Array:
    """Fused correlation sampling -> [B, S, N, L*(2r+1)²].

    ``padded_pyramid`` must come from :func:`pad_pyramid` (edge replication
    by PAD = 2r+2 per side). Semantics identical to ops.corr_pyramid_sample.
    N must be a multiple of 8.
    """
    interpret = _use_interpret() if interpret is None else interpret
    b, s, n, _ = coords.shape
    n_pad = (-n) % _CHUNK
    if n_pad:
        coords = jnp.pad(coords, ((0, 0), (0, 0), (0, n_pad), (0, 0)), mode="edge")
        track_feats = jnp.pad(
            track_feats, ((0, 0), (0, 0), (0, n_pad), (0, 0)), mode="edge"
        )
        out = corr_pyramid_sample_pallas(
            padded_pyramid, coords, track_feats, radius, interpret
        )
        return out[:, :, :n]
    c = track_feats.shape[-1]
    r = radius
    pad = 2 * r + 2
    p = 2 * r + 2
    k = (2 * r + 1) ** 2
    tf = track_feats.reshape(b * s, n, c)

    extra = _round8(p) - p
    outs = []
    for lvl, fpad in enumerate(padded_pyramid):
        h_l = fpad.shape[1] - 2 * pad - extra
        w_l = fpad.shape[2] - 2 * pad - extra
        cl = coords / (2.0**lvl)
        cx = jnp.clip(cl[..., 0], -r - 1.0, w_l + float(r))
        cy = jnp.clip(cl[..., 1], -r - 1.0, h_l + float(r))
        fx = cx - jnp.floor(cx)
        fy = cy - jnp.floor(cy)
        ix0 = jnp.clip(jnp.floor(cx).astype(jnp.int32) - r + pad, 0, w_l + 2 * pad - p)
        iy0 = jnp.clip(jnp.floor(cy).astype(jnp.int32) - r + pad, 0, h_l + 2 * pad - p)
        w4 = jnp.stack(
            [(1 - fy) * (1 - fx), (1 - fy) * fx, fy * (1 - fx), fy * fx], axis=-1
        ).astype(jnp.float32)
        out_l = _corr_one_level(
            fpad,
            iy0.reshape(b * s, 1, n),
            ix0.reshape(b * s, 1, n),
            w4.reshape(b * s, n, 4),
            tf,
            radius,
            interpret,
        )  # [BS, N, kk, kk] rows = y
        # reference scan order is x-outer (blocks.py:387-395) -> transpose
        out_l = out_l.transpose(0, 1, 3, 2).reshape(b, s, n, k)
        outs.append(out_l)

    inv_sqrt_c = 1.0 / jnp.sqrt(jnp.asarray(c, jnp.float32))
    out = jnp.concatenate(outs, axis=-1) * inv_sqrt_c
    return out.astype(track_feats.dtype)


def pad_pyramid(pyramid: Sequence[jax.Array], radius: int) -> List[jax.Array]:
    """Edge-replicate each level [B, S, H, W, C] by PAD = 2r+2 per side
    (plus extra right/bottom padding so the widened DMA slices stay in
    range) and flatten the (B, S) dims -> [B*S, Hp, Wp, C]."""
    pad = 2 * radius + 2
    extra = _round8(2 * radius + 2) - (2 * radius + 2)
    out = []
    for f in pyramid:
        b, s, h, w, c = f.shape
        flat = f.reshape(b * s, h, w, c)
        flat = jnp.pad(
            flat, ((0, 0), (pad, pad + extra), (pad, pad + extra), (0, 0)),
            mode="edge",
        )
        out.append(flat)
    return out


# ---------------------------------------------------------------------------
# patch extraction
# ---------------------------------------------------------------------------

def _patch_kernel(psize, n_inflight, tl_ref, img_ref, out_ref, sems):
    bs_idx = pl.program_id(0)
    n_tracks = out_ref.shape[1]
    pw = _round8(psize)  # sublane-dim DMA size must be 8-aligned

    def dma(n, slot):
        y0 = tl_ref[0, n, 1]
        x0 = tl_ref[0, n, 0]
        return pltpu.make_async_copy(
            img_ref.at[bs_idx, pl.ds(y0, psize), pl.ds(x0, pw), :],
            out_ref.at[0, n],
            sems.at[slot],
        )

    # prime the pipeline
    for j in range(n_inflight):
        dma(j, j).start()

    def body(n, _):
        slot = jax.lax.rem(n, n_inflight)
        dma(n, slot).wait()

        @pl.when(n + n_inflight < n_tracks)
        def _():
            dma(n + n_inflight, slot).start()

        return 0

    jax.lax.fori_loop(0, n_tracks, body, 0)


def extract_patches_pallas(
    images: jax.Array,  # [B, H, W, C]
    topleft: jax.Array,  # [B, N, 2] int32 (x, y), pre-clamped to [0, H-psize]
    psize: int,
    interpret: bool = None,
    n_inflight: int = 8,
) -> jax.Array:
    """Per-track patch extraction as pipelined DMAs
    -> [B, N, psize, psize, C]."""
    interpret = _use_interpret() if interpret is None else interpret
    b, h, w, c = images.shape
    n = topleft.shape[1]

    return pl.pallas_call(
        functools.partial(_patch_kernel, psize, n_inflight),
        out_shape=jax.ShapeDtypeStruct((b, n, psize, psize, c), images.dtype),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, n, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, n, psize, psize, c), lambda i: (i, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_inflight,))],
        interpret=interpret,
    )(topleft, images)
