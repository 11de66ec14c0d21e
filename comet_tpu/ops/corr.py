"""Correlation-pyramid sampling — the tracker's hot op, fused for TPU.

The reference's ``CorrBlock`` (comet/models/track_modules/blocks.py:351-430)
materializes full correlation volumes corr[B,S,N,H,W] = <track_feat, fmap>/√C
then bilinearly samples a (2r+1)² window around each track.

TPU design: contract FIRST, gather SECOND. The correlation volume is one
batched matmul (MXU-friendly, ~10 GFLOP at full size), after which the
window sampling gathers *scalars* from [Hl, Wl] score maps instead of
C-dim feature vectors — ~C× less gather traffic than the
``EfficientCorrBlock`` (blocks.py:432-484) gather-then-contract order.
Because all (2r+1)² window points of one track share a single fractional
offset, bilinear interpolation is done by gathering one integer-aligned
(2r+2)² patch per track (per-index edge clamp == grid_sample
padding_mode="border") and blending the four shifted sub-patches with the
shared (fx, fy) weights — 4 multiply-adds per output instead of 4 gathers.

Layout is channel-last throughout.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp


def avg_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2 average pool, stride 2, on [..., H, W, C] (floor semantics)."""
    h, w = x.shape[-3], x.shape[-2]
    h2, w2 = h // 2, w // 2
    x = x[..., : h2 * 2, : w2 * 2, :]
    shape = (*x.shape[:-3], h2, 2, w2, 2, x.shape[-1])
    return x.reshape(shape).mean(axis=(-4, -2))


def build_fmap_pyramid(fmaps: jax.Array, num_levels: int) -> List[jax.Array]:
    """fmaps [B, S, H, W, C] -> list of num_levels pyramids (avg-pooled 2x)."""
    pyramid = [fmaps]
    for _ in range(num_levels - 1):
        pyramid.append(avg_pool_2x2(pyramid[-1]))
    return pyramid


def _window_offsets(radius: int, dtype=jnp.float32) -> jax.Array:
    """[(2r+1)², 2] (x, y) offsets, x varying in the OUTER loop.

    The reference builds delta = stack(meshgrid(dy, dx, indexing="ij"), -1)
    and adds it to (x, y) coords (blocks.py:387-395), so the x offset comes
    from the first meshgrid output (outer axis). The window content is the
    same either way, but the flattened channel order feeds the transformer
    and must match for ported-weight parity.
    """
    r = radius
    lin = jnp.arange(-r, r + 1, dtype=dtype)
    outer, inner = jnp.meshgrid(lin, lin, indexing="ij")
    return jnp.stack([outer.reshape(-1), inner.reshape(-1)], axis=-1)


def _sample_windows_scalar(
    vol: jax.Array, centroid: jax.Array, radius: int
) -> jax.Array:
    """Bilinear (2r+1)² window sample from scalar maps.

    vol: [M, H, W] per-track score maps; centroid: [M, 2] (x, y) pixels.
    Returns [M, (2r+1)²] with the reference's channel order (x offset in
    the outer loop). Exactly equals border-clamped bilinear sampling at
    centroid + integer offsets: all window points share one fractional
    offset, so one integer (2r+2)² patch (indices edge-clamped per row/col)
    blended by the shared (fx, fy) reproduces each point's clamped
    4-neighbour interpolation.
    """
    m, h, w = vol.shape
    r = radius
    x = centroid[..., 0]
    y = centroid[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(vol.dtype)[:, None, None]
    fy = (y - y0).astype(vol.dtype)[:, None, None]

    ar = jnp.arange(-r, r + 2, dtype=jnp.int32)  # 2r+2 taps
    rows = jnp.clip(y0.astype(jnp.int32)[:, None] + ar, 0, h - 1)  # [M, 2r+2]
    cols = jnp.clip(x0.astype(jnp.int32)[:, None] + ar, 0, w - 1)

    def per_map(v, ri, ci):
        return v[ri][:, ci]  # [2r+2, 2r+2]

    patch = jax.vmap(per_map)(vol, rows, cols)  # [M, 2r+2, 2r+2]
    top = patch[:, :-1, :-1] * (1 - fx) + patch[:, :-1, 1:] * fx
    bot = patch[:, 1:, :-1] * (1 - fx) + patch[:, 1:, 1:] * fx
    out = top * (1 - fy) + bot * fy  # [M, 2r+1 (y), 2r+1 (x)]
    # reference order: k = ix*(2r+1) + iy (x in the outer loop)
    return out.transpose(0, 2, 1).reshape(m, (2 * r + 1) ** 2)


def corr_pyramid_sample(
    pyramid: Sequence[jax.Array],
    coords: jax.Array,
    track_feats: jax.Array,
    radius: int,
) -> jax.Array:
    """Fused correlation sampling.

    pyramid: list of [B, S, Hl, Wl, C] feature maps (level l downsampled 2^l)
    coords: [B, S, N, 2] track positions at pyramid level 0 (x, y pixels)
    track_feats: [B, S, N, C] current track features
    radius: window radius r; each level contributes (2r+1)² values.

    Returns [B, S, N, L*(2r+1)²] correlation features = <track_feat,
    fmap(sampled window)> / √C, levels concatenated in pyramid order —
    byte-identical semantics to CorrBlock.corr + CorrBlock.sample
    (blocks.py:376-429). Contraction runs before the gather so the gather
    moves scalars, not C-vectors (see module docstring).
    """
    b, s, n, _ = coords.shape
    c = track_feats.shape[-1]
    inv_sqrt_c = 1.0 / jnp.sqrt(jnp.asarray(c, track_feats.dtype))

    outs = []
    for lvl, fmaps in enumerate(pyramid):
        hl, wl = fmaps.shape[2], fmaps.shape[3]
        centroid = coords / (2.0**lvl)  # [B, S, N, 2]
        vol = (
            jnp.einsum(
                "bsnc,bshwc->bsnhw", track_feats, fmaps,
                preferred_element_type=track_feats.dtype,
            )
            * inv_sqrt_c
        )
        win = _sample_windows_scalar(
            vol.reshape(b * s * n, hl, wl),
            centroid.reshape(b * s * n, 2),
            radius,
        )
        outs.append(win.reshape(b, s, n, -1))
    return jnp.concatenate(outs, axis=-1)


def extract_patches(
    images: jax.Array, topleft: jax.Array, psize: int
) -> jax.Array:
    """Integer-aligned patch extraction (refine_track's unfold+index).

    images:  [B, H, W, C]
    topleft: [B, N, 2] integer (x, y) top-left corners, already clamped to
             [0, H-psize] (the reference clamps assuming H == W,
             refine_track.py:90-93).
    Returns [B, N, psize, psize, C].
    """
    c = images.shape[-1]

    def per_patch(img, tl):
        # dynamic_slice clamps starts into range, matching the pre-clamped
        # topleft contract; vmapping it lowers to ONE gather whose slices
        # are whole (psize, psize, C) blocks — large contiguous reads
        # instead of per-row/per-element advanced indexing.
        return jax.lax.dynamic_slice(
            img, (tl[1], tl[0], 0), (psize, psize, c)
        )

    return jax.vmap(jax.vmap(per_patch, in_axes=(None, 0)))(images, topleft)
