"""Correlation-pyramid sampling — the tracker's hot op, fused for TPU.

The reference's ``CorrBlock`` (comet/models/track_modules/blocks.py:351-430)
materializes full correlation volumes corr[B,S,N,H,W] = <track_feat, fmap>/√C
then bilinearly samples a (2r+1)² window around each track. Since bilinear
interpolation commutes with the inner product, we instead gather the fmap
window first and contract against the track features — the
``EfficientCorrBlock`` (blocks.py:432-484) formulation — which is
mathematically identical to corr-then-sample, avoids a B·S·N·H·W HBM tensor,
and turns the op into (gather → batched matmul) that XLA fuses well.

Layout is channel-last throughout.
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp

from .bilinear import bilinear_sample


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
    byte-identical semantics to CorrBlock.corr + CorrBlock.sample.
    """
    b, s, n, _ = coords.shape
    c = track_feats.shape[-1]
    offsets = _window_offsets(radius, coords.dtype)  # [K, 2]
    k = offsets.shape[0]
    inv_sqrt_c = 1.0 / jnp.sqrt(jnp.asarray(c, track_feats.dtype))

    outs = []
    for lvl, fmaps in enumerate(pyramid):
        centroid = coords / (2.0**lvl)  # [B, S, N, 2]
        pts = centroid[..., None, :] + offsets  # [B, S, N, K, 2]
        flat_maps = fmaps.reshape(b * s, *fmaps.shape[2:])
        flat_pts = pts.reshape(b * s, n * k, 2)
        win = jax.vmap(bilinear_sample)(flat_maps, flat_pts)  # [B*S, N*K, C]
        win = win.reshape(b, s, n, k, c)
        corr = jnp.einsum(
            "bsnkc,bsnc->bsnk", win, track_feats,
            preferred_element_type=track_feats.dtype,
        ) * inv_sqrt_c
        outs.append(corr)
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
    b, h, w, c = images.shape
    n = topleft.shape[1]
    lin = jnp.arange(psize, dtype=jnp.int32)
    rows = topleft[..., 1][..., None] + lin  # [B, N, P]
    cols = topleft[..., 0][..., None] + lin  # [B, N, P]

    def per_image(img, r, cgrid):
        # img [H, W, C]; r, cgrid [N, P]
        sub = img[r]  # [N, P, W, C]
        return jnp.take_along_axis(
            sub, cgrid[:, None, :, None], axis=2
        )  # [N, P, P, C]

    return jax.vmap(per_image)(images, rows, cols)
