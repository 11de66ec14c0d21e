"""Correlation-pyramid sampling — the tracker's hot op, fused for TPU.

The reference's ``CorrBlock`` (comet/models/track_modules/blocks.py:351-430)
materializes full correlation volumes corr[B,S,N,H,W] = <track_feat, fmap>/√C
then bilinearly samples a (2r+1)² window around each track.

TPU design: contract FIRST, sample SECOND. The correlation volume is one
batched matmul (MXU-friendly, ~10 GFLOP at full size), after which the
window sampling works on scalar [Hl, Wl] score maps instead of C-dim
feature vectors — ~C× less sampling traffic than the
``EfficientCorrBlock`` (blocks.py:432-484) gather-then-contract order.
Because all (2r+1)² window points of one track share a single fractional
offset, the bilinear weights fold into TWO-HOT row/column selection
matrices, and the whole window sample becomes two batched matmuls against
the score map — no gathers at all (each per-level gather fusion cost ~1 ms
before this). Out-of-range taps carry zero weight by construction
(grid_sample padding_mode="zeros", the reference CorrBlock's default,
blocks.py:358); border mode clamps the tap indices instead.

Layout is channel-last throughout.

Pallas note: round 1 carried DMA-per-track Pallas kernels for these ops
(double-buffered HBM->VMEM patch copies). They were removed after profiling
the compiled XLA formulations on the v5e: with the contract-first design the
gathers move scalars (µs-scale), while the DMA kernels hit two Mosaic
constraints that erase their advantage — dynamic slice starts/sizes on the
sublane dim must be 8-aligned, and a [H, W, 3] input buffer in a kernel is
lane-padded 3->128 (42x DMA amplification). The remaining Pallas win in this
model is fused normalization/attention, not data movement (see ops/).
"""

from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def avg_pool_2x2(x: jax.Array) -> jax.Array:
    """2x2 average pool, stride 2, on [..., H, W, C] (floor semantics).

    Written as four strided slices + adds (not reshape/mean): jnp.mean
    upcasts bf16 to f32 and the odd-size slice breaks the (8,128) tiling,
    which cost ~15 ms/fwd on the fine pyramid (measured via jax.profiler).
    """
    h, w = x.shape[-3], x.shape[-2]
    if h < 2 or w < 2:
        # smaller than the pooling window: keep as-is so deep pyramids on
        # tiny inputs (tests/demos) bottom out at 1x1 instead of 0x0
        return x
    h2, w2 = h // 2, w // 2
    a = x[..., 0 : h2 * 2 : 2, 0 : w2 * 2 : 2, :]
    b = x[..., 0 : h2 * 2 : 2, 1 : w2 * 2 : 2, :]
    c = x[..., 1 : h2 * 2 : 2, 0 : w2 * 2 : 2, :]
    d = x[..., 1 : h2 * 2 : 2, 1 : w2 * 2 : 2, :]
    return (a + b + c + d) * jnp.asarray(0.25, x.dtype)


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


def _two_hot_selectors(
    centroid: jax.Array, h: int, w: int, radius: int, padding_mode: str,
    dtype,
):
    """TWO-HOT row/column selection matrices for (2r+1)^2 window sampling.

    GATHER-FREE sampling: all window points of one track share a single
    fractional offset, so each point's bilinear interpolation is the
    product of per-row and per-column two-hot weight vectors. Contracted
    against the score map these replace per-track gathers entirely.
    Returns rsel [..., K, H], csel [..., K, W]. padding_mode "zeros"
    compares RAW indices (out-of-range taps match no grid position ->
    zero weight, grid_sample's default); "border" clamps the taps.
    """
    r = radius
    x = centroid[..., 0]
    y = centroid[..., 1]
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = (x - x0).astype(dtype)[..., None, None]
    fy = (y - y0).astype(dtype)[..., None, None]

    ar = jnp.arange(-r, r + 1, dtype=jnp.int32)  # K taps
    ri = y0.astype(jnp.int32)[..., None] + ar  # [..., K] window floor rows
    ci = x0.astype(jnp.int32)[..., None] + ar
    hh = jnp.arange(h, dtype=jnp.int32)
    ww = jnp.arange(w, dtype=jnp.int32)

    if padding_mode == "zeros":
        r0, r1, c0, c1 = ri, ri + 1, ci, ci + 1
    elif padding_mode == "border":
        r0 = jnp.clip(ri, 0, h - 1)
        r1 = jnp.clip(ri + 1, 0, h - 1)
        c0 = jnp.clip(ci, 0, w - 1)
        c1 = jnp.clip(ci + 1, 0, w - 1)
    else:
        raise ValueError(f"unknown padding_mode {padding_mode}")

    rsel = (
        (r0[..., None] == hh).astype(dtype) * (1 - fy)
        + (r1[..., None] == hh).astype(dtype) * fy
    )  # [..., K, H]
    csel = (
        (c0[..., None] == ww).astype(dtype) * (1 - fx)
        + (c1[..., None] == ww).astype(dtype) * fx
    )  # [..., K, W]
    return rsel, csel


def _sample_windows_scalar(
    vol: jax.Array, centroid: jax.Array, radius: int,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Bilinear (2r+1)² window sample from scalar maps.

    vol: [..., H, W] per-track score maps; centroid: [..., 2] (x, y) pixels
    (any number of leading batch dims — keeping the caller's natural
    [B, S, N, H, W] volume layout avoids a tile-relayout copy that a
    flatten-to-[M, H, W] reshape forced, ~3 ms/fwd measured).
    Returns [..., (2r+1)²] with the reference's channel order (x offset in
    the outer loop). Exactly equals grid_sample-style bilinear sampling at
    centroid + integer offsets: all window points share one fractional
    offset, so each point's 4-neighbour interpolation is expressible as a
    product of per-row and per-column two-hot weight vectors. padding_mode
    "zeros" zeroes out-of-range taps (grid_sample default — the reference
    CorrBlock uses this, blocks.py:358); "border" edge-clamps.
    """
    *lead, h, w = vol.shape
    k = 2 * radius + 1
    rsel, csel = _two_hot_selectors(centroid, h, w, radius, padding_mode, vol.dtype)

    t = jnp.einsum(
        "...ph,...hw->...pw", rsel, vol, preferred_element_type=vol.dtype
    )
    out = jnp.einsum(
        "...qw,...pw->...qp", csel, t, preferred_element_type=vol.dtype
    )  # [..., K (x), K (y)]
    # reference order: k = ix*(2r+1) + iy (x in the outer loop)
    return out.reshape(*lead, k * k)


def corr_pyramid_sample(
    pyramid: Sequence[jax.Array],
    coords: jax.Array,
    track_feats: jax.Array,
    radius: int,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Fused correlation sampling.

    pyramid: list of [B, S, Hl, Wl, C] feature maps (level l downsampled 2^l)
    coords: [B, S, N, 2] track positions at pyramid level 0 (x, y pixels)
    track_feats: [B, S, N, C] current track features
    radius: window radius r; each level contributes (2r+1)² values.

    Returns [B, S, N, L*(2r+1)²] correlation features = <track_feat,
    fmap(sampled window)> / √C, levels concatenated in pyramid order —
    byte-identical semantics to CorrBlock.corr + CorrBlock.sample
    (blocks.py:376-429), including the default zero-padded window sampling
    (CorrBlock padding_mode="zeros", blocks.py:358). The contraction runs
    before the window sampling (see module docstring).

    NOTE: the model's trackers use corr_volume_pyramid_sample (identical by
    linearity, with pooling folded into static selection matrices); this
    feature-pyramid variant is kept as the directly torch-verified
    semantic reference (tests/test_ops.py) and API-parity surface.
    """
    b, s, n, _ = coords.shape
    c = track_feats.shape[-1]
    # fold the 1/sqrt(C) into the (tiny) track features instead of scaling the
    # full correlation volume: the standalone multiply on [B,S,N,H,W] cost
    # ~5 ms/fwd across both trackers (jax.profiler, round 2)
    tf = track_feats * (1.0 / jnp.sqrt(jnp.asarray(c, track_feats.dtype)))

    # ONE volume einsum for the whole pyramid: the per-level dots ran at
    # ~5% MFU (the tail levels are [N, C] @ [C, 64..1024] slivers with
    # batched-dot overhead, ~0.6 ms/iteration measured); concatenating the
    # levels' flattened maps makes it a single [N, C] @ [C, sum(HW)] dot.
    # The concat is loop-invariant across refinement iterations, so XLA
    # CSE hoists it out of the unrolled loop.
    shapes = [(f.shape[2], f.shape[3]) for f in pyramid]
    flat = jnp.concatenate(
        [f.reshape(b, s, -1, c) for f in pyramid], axis=2
    )  # [B, S, sum(Hl*Wl), C]
    vol_all = jnp.einsum(
        "bsnc,bspc->bsnp", tf, flat, preferred_element_type=track_feats.dtype
    )

    outs = []
    off = 0
    for lvl, (hl, wl) in enumerate(shapes):
        vol = vol_all[..., off : off + hl * wl].reshape(b, s, n, hl, wl)
        off += hl * wl
        win = _sample_windows_scalar(
            vol, coords / (2.0**lvl), radius, padding_mode=padding_mode
        )
        outs.append(win)
    return jnp.concatenate(outs, axis=-1)


def corr_volume_pyramid_sample(
    fmaps: jax.Array,
    coords: jax.Array,
    track_feats: jax.Array,
    radius: int,
    num_levels: int,
    out_size: "tuple[int, int] | None" = None,
    padding_mode: str = "zeros",
) -> jax.Array:
    """Correlation sampling with the pyramid built on VOLUMES, not features.

    Correlation, bilinear resize and average pooling are all linear in the
    feature values, so <tf, pool^l(resize(f))> == pool^l(resize(<tf, f>)).
    Computing the level-0 correlation volume on the NATIVE feature maps and
    then resizing/pooling the scalar volumes is mathematically identical to
    the reference's pool-features-then-correlate (CorrBlock, blocks.py:
    351-430) but moves ~C x less data: the fine stage's [8192,31,31,32]
    feature pyramid materialization forced multi-ms relayout copies
    (jax.profiler, round 2), while the scalar volumes are [8192,31,31].

    fmaps: [B, S, h0, w0, C] native-resolution maps (e.g. the fine fnet's
        16x16 pre-upsample output); out_size (hh, ww) optionally resizes the
        level-0 volume (align-corners bilinear — the ShallowEncoder's final
        upsample moved here). coords live in out_size (or native) space.
    Returns [B, S, N, num_levels*(2r+1)^2], same semantics as
    corr_pyramid_sample on a resized-feature pyramid.
    """
    b, s, n, _ = coords.shape
    c = track_feats.shape[-1]
    tf = track_feats * (1.0 / jnp.sqrt(jnp.asarray(c, track_feats.dtype)))

    if n == 1:
        # the fine stage tracks ONE point per patch: the dot degenerates to
        # a batched matvec ([1, C] @ [C, HW] x 8192 batch elements, ~1.6 ms
        # of batched-dot overhead); a fused multiply-reduce over the C=32
        # lanes is traffic-bound instead
        vol = (
            (fmaps * tf[:, :, 0, None, None, :])
            .sum(-1, dtype=jnp.float32)[:, :, None]
            .astype(track_feats.dtype)
        )
    else:
        vol = jnp.einsum(
            "bsnc,bshwc->bsnhw", tf, fmaps,
            preferred_element_type=track_feats.dtype,
        )
    h0, w0 = vol.shape[-2:]
    # FOLDED resize+pool: never materialize the resized/pooled volume
    # pyramid. Each level-l map equals (Ph_l vol Pw_l^T) for STATIC
    # separable matrices Ph_l = pool^l @ interp (resize and pooling are
    # linear and separable), so sampling a window from level l is
    #   out = (rsel_l @ Ph_l) vol (csel_l @ Pw_l)^T
    # where rsel/csel are the per-track two-hots in LEVEL-l space. The
    # (rsel @ Ph) fold is one flat [M*K, h_l] @ [h_l, h0] MXU matmul;
    # the per-iteration resize einsums + pooling chain (~2.5 ms/fwd in
    # the fine stage, jax.profiler) disappear, and the batched window
    # slivers work on h0-wide operands. Level 0 (identity matrices) takes
    # the plain two-hot path.
    hh, ww = out_size if out_size is not None else (h0, w0)

    def interp_mat(n_in: int, n_out: int) -> np.ndarray:
        # numpy twin of bilinear.interp_matrix_align_corners (the
        # matrices must be CONSTANTS, not tracers, inside jit)
        if n_in == n_out:
            return np.eye(n_in, dtype=np.float32)
        src = (
            np.zeros((1,), np.float32)
            if n_out == 1
            else np.arange(n_out, dtype=np.float32)
            * ((n_in - 1) / (n_out - 1))
        )
        i0 = np.clip(np.floor(src).astype(np.int32), 0, n_in - 1)
        i1 = np.clip(i0 + 1, 0, n_in - 1)
        frac = src - i0
        m = np.zeros((n_out, n_in), np.float32)
        np.add.at(m, (np.arange(n_out), i0), 1.0 - frac)
        np.add.at(m, (np.arange(n_out), i1), frac)
        return m

    def pool_mat(n_in: int) -> np.ndarray:
        n_out = n_in // 2
        p = np.zeros((n_out, n_in), np.float32)
        idx = np.arange(n_out)
        p[idx, 2 * idx] = 0.5
        p[idx, 2 * idx + 1] = 0.5
        return p

    k = 2 * radius + 1
    outs = []
    ph, pw = interp_mat(h0, hh), interp_mat(w0, ww)
    for lvl in range(num_levels):
        if lvl > 0 and ph.shape[0] >= 2 and pw.shape[0] >= 2:
            # (when either dim is already 1, keep the level as-is — the
            # avg_pool_2x2 smaller-than-window semantics)
            ph = pool_mat(ph.shape[0]) @ ph  # [h_l, h0]
            pw = pool_mat(pw.shape[0]) @ pw
        identity = (
            ph.shape[0] == h0
            and pw.shape[0] == w0
            and np.allclose(ph, np.eye(h0))
            and np.allclose(pw, np.eye(w0))
        )
        rsel, csel = _two_hot_selectors(
            coords / (2.0**lvl), ph.shape[0], pw.shape[0], radius,
            padding_mode, vol.dtype,
        )  # [..., K, h_l] / [..., K, w_l]
        if identity:
            rs, cs = rsel, csel
        else:
            rs = jnp.einsum(
                "...ph,hm->...pm", rsel, jnp.asarray(ph, vol.dtype),
                preferred_element_type=vol.dtype,
            )  # [..., K, h0]
            cs = jnp.einsum(
                "...qw,wm->...qm", csel, jnp.asarray(pw, vol.dtype),
                preferred_element_type=vol.dtype,
            )  # [..., K, w0]
        t = jnp.einsum(
            "...pm,...mw->...pw", rs, vol, preferred_element_type=vol.dtype
        )
        win = jnp.einsum(
            "...qm,...pm->...qp", cs, t, preferred_element_type=vol.dtype
        )
        outs.append(win.reshape(*win.shape[:-2], k * k))
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
    return extract_patches_ex(images, topleft, psize, track_major=False)


def extract_patches_ex(
    images: jax.Array,
    topleft: jax.Array,
    psize: int,
    track_major: bool = False,
) -> jax.Array:
    """Patch extraction with selectable output order.

    track_major=False -> [B, N, psize, psize, C] (extract_patches order);
    track_major=True  -> [N, B, psize, psize, C], which lets refine_track
    feed the fine tracker without transposing a [B·N, S, P, P, C] tensor
    (the (s, n) transpose cost ~10 ms/fwd in layout copies).

    Out-of-range ``topleft`` is clamped to [0, (W-psize, H-psize)] up
    front, so both the blocked-gather and row-gather paths share one
    semantic: the window START shifts into range (never per-row edge
    replication).

    TPU formulation (chosen from jax.profiler traces of the full model):
    1. transpose images to channel-first once, so the row gather's slices
       and the later contraction axis (w) are both minor;
    2. row gather with whole W rows as slices — one batched gather kernel;
    3. column selection as a one-hot einsum on the MXU. One-hot selection
       is exact in any dtype (each output is 1.0 * one value).
    Avoided alternatives (all measured slower in-context): per-element
    advanced-indexing column gathers (~16 ms), vmap(lax.dynamic_slice)
    (unrolls into one kernel launch per patch), NHWC row gather followed
    by the einsum (XLA inserts a ~22 ms relayout to make w minor).
    """
    b, h, w, c = images.shape
    n = topleft.shape[1]
    topleft = jnp.clip(
        topleft,
        0,
        jnp.asarray([w - psize, h - psize], topleft.dtype),
    )
    lin = jnp.arange(psize, dtype=jnp.int32)
    rows = topleft[..., 1][..., None] + lin  # [B, N, P]
    cols = topleft[..., 0][..., None] + lin  # [B, N, P]

    csel = (cols[..., None] == jnp.arange(w, dtype=jnp.int32)).astype(
        images.dtype
    )  # [B, N, P(x), W] one-hot

    if h <= 64:
        # small maps (score windows from 31x31 feature patches): the row
        # gather is also cheaper as a one-hot einsum — the equivalent
        # gather cost ~15 ms/fwd at [8192*5] indices (jax.profiler)
        rsel = (rows[..., None] == jnp.arange(h, dtype=jnp.int32)).astype(
            images.dtype
        )  # [B, N, P(y), H]
        t = jnp.einsum(
            "bnph,bhwc->bnpwc", rsel, images,
            preferred_element_type=images.dtype,
        )
        spec = "bnqw,bnpwc->nbpqc" if track_major else "bnqw,bnpwc->bnpqc"
        return jnp.einsum(spec, csel, t, preferred_element_type=images.dtype)

    imgs_t = images.transpose(0, 3, 1, 2)  # [B, C, H, W], w minor

    if w % 32 == 0 and psize <= 32 and w >= 64:
        # Blocked gather: a psize<=32 window spans at most two consecutive
        # 32-wide column blocks, so each patch is ONE multi-dim gather slice
        # [C, psize, 2, 32] — 8x less traffic than full-W rows AND ~60x
        # fewer slices than a row-at-a-time gather (TPU gather cost is
        # per-slice-overhead bound: 507k 32-lane slices ran at 15 GB/s,
        # 253k full-row slices at 173 GB/s; this does B*N slices total).
        nb = w // 32
        blk = jnp.clip(topleft[..., 0] // 32, 0, nb - 2)  # [B, N]
        imgs_b = imgs_t.reshape(b, c, h, nb, 32)
        y0 = jnp.clip(topleft[..., 1], 0, h - psize)
        zeros = jnp.zeros_like(blk)
        starts = jnp.stack([zeros, y0, blk, zeros], axis=-1)  # [B, N, 4]
        dn = jax.lax.GatherDimensionNumbers(
            offset_dims=(1, 2, 3, 4),
            collapsed_slice_dims=(),
            start_index_map=(0, 1, 2, 3),
        )
        sub = jax.vmap(
            lambda img, st: jax.lax.gather(
                img, st, dn, slice_sizes=(c, psize, 2, 32), mode="clip"
            )
        )(imgs_b, starts).reshape(b, n, c, psize, 64)
        rel = cols - 32 * blk[..., None]  # [B, N, P] columns within the pair
        csel = (rel[..., None] == jnp.arange(64, dtype=jnp.int32)).astype(
            images.dtype
        )
        spec = "bnqw,bncpw->nbpqc" if track_major else "bnqw,bncpw->bnpqc"
        return jnp.einsum(spec, csel, sub, preferred_element_type=images.dtype)

    sub = jax.vmap(lambda img, r: img[:, r])(
        imgs_t, rows.reshape(b, n * psize)
    ).reshape(b, c, n, psize, w)

    spec = "bnqw,bcnpw->nbpqc" if track_major else "bnqw,bcnpw->bnpqc"
    return jnp.einsum(spec, csel, sub, preferred_element_type=images.dtype)
