"""Fine track refinement on 31x31 patches + matching-score computation.

Parity target: comet/models/refine_track.py:26-278 (refine_track,
compute_score_fn). The reference's unfold-then-fancy-index becomes a batched
static-shape gather + one-hot selection einsum (ops.extract_patches_ex); the
kornia dsnt spatial expectation becomes a plain softmax-moment computation.

TPU layout note: patches are extracted TRACK-major ([N, B·S, P, P, C]) so
the per-track fine tracker consumes them without transposing a
[B·N, S, 31, 31, C] tensor (the (s, n) relayout cost ~10 ms/fwd); the score
computation is order-agnostic and runs track-major too.

Reference quirks preserved on purpose:
- patch top-left is clamped for extraction but the UNCLAMPED top-left is
  added back when mapping to image coords (refine_track.py:87-93, 148);
- clamping assumes H == W;
- frame-0 track is reset to the query points at the end (:153);
- frame-0 score is 1 (:276).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..ops import extract_patches_ex


def refine_track(
    images: jax.Array,  # [B, S, H, W, 3]
    fine_fnet,  # callable: [M, P, P, 3] -> [M, P, P, C]
    fine_tracker,  # callable: (query [B', N', 2], fmaps [B', S, P, P, C], iters) -> TrackerOutput
    coarse_pred: jax.Array,  # [B, S, N, 2]
    pradius: int = 15,
    sradius: int = 2,
    compute_score: bool = True,
    iters: int = 6,
) -> Tuple[jax.Array, jax.Array]:
    b, s, n, _ = coarse_pred.shape
    h, w = images.shape[2], images.shape[3]
    psize = 2 * pradius + 1

    query_points = coarse_pred[:, 0]  # [B, N, 2]

    track_int = jnp.floor(coarse_pred).astype(jnp.int32)
    track_frac = coarse_pred - track_int
    topleft_unclamped = track_int - pradius  # [B, S, N, 2]
    topleft = jnp.clip(topleft_unclamped, 0, h - psize)

    patches = extract_patches_ex(
        images.reshape(b * s, h, w, images.shape[-1]),
        topleft.reshape(b * s, n, 2),
        psize,
        track_major=True,
    )  # [N, B*S, P, P, 3]
    # fine_fnet returns features at its NATIVE resolution (16x16 for 31px
    # patches, resize_output=False); the final upsample to psize is folded
    # into the tracker's correlation volumes (corr_size) and into the two
    # small resizes below — never materializing [B*N, S, 31, 31, C]
    patch_feat = fine_fnet(patches.reshape(n * b * s, psize, psize, -1))
    hp, wp, c_out = patch_feat.shape[-3:]

    # (N*B*S, P', P', C) -> (B*N, S, P', P', C); for B == 1 the leading
    # transpose is a pure bitcast (no data movement).
    patch_feat_nb = patch_feat.reshape(n, b, s, hp, wp, c_out)
    patch_feat_bn = patch_feat_nb.transpose(1, 0, 2, 3, 4, 5).reshape(
        b * n, s, hp, wp, c_out
    )

    # queries relative to the patch top-left (frac offset + pradius)
    patch_query = (track_frac[:, 0] + pradius).reshape(b * n, 1, 2)

    out = fine_tracker(patch_query, patch_feat_bn, iters=iters)
    # [iters, B*N, S, 1, 2] -> final iteration, relative to patch top-left
    fine_rel = out.coord_preds[-1][..., 0, :]  # [B*N, S, 2]
    fine_rel_bsn = fine_rel.reshape(b, n, s, 2).transpose(0, 2, 1, 3)

    refined = fine_rel_bsn + topleft_unclamped.astype(fine_rel_bsn.dtype)
    refined = refined.at[:, 0].set(query_points)

    score = None
    if compute_score:
        score = compute_score_fn(
            out.query_feats.reshape(b, n, c_out),
            patch_feat_bn.reshape(b, n, s, hp, wp, c_out),
            fine_rel.reshape(b, n, s, 2),
            sradius,
            psize,
        )
    return refined, score


def compute_score_fn(
    query_feat: jax.Array,  # [B, N, C]
    patch_feat: jax.Array,  # [B, N, S, P', P', C] (track-major, native res)
    fine_pred: jax.Array,  # [B, N, S, 2] relative to patch top-left
    sradius: int,
    psize: int,
) -> jax.Array:
    """Std of the ssize x ssize similarity heatmap around each fine
    prediction (refine_track.py:174-278). Returns [B, S, N]; frame 0 gets
    score 1.

    BUG-EXACT replication of the reference gather (refine_track.py:224-241),
    kept because best.bin was trained and evaluated with it and the score
    feeds the camera predictor as track confidence:
    - ``batch_indices_score`` is arange(B) expanded — NOT arange(B*S*N) —
      so output element i (in (b, s, n) order) reads the unfolded windows
      of the patch at FLAT index b (for B=1: always track 0, frame 0),
      not of its own (b, s, n) patch;
    - the topleft list is flattened in (b, n, s) order but consumed at
      (b, s, n) positions, i.e. read transposed.
    Verified equal to the torch reference by tests/test_torch_parity_full.
    """
    b, n, s, hp, wp, c = patch_feat.shape
    ssize = 2 * sradius + 1

    floor = jnp.floor(fine_pred).astype(jnp.int32)
    topleft = jnp.clip(floor - sradius, 0, psize - ssize)  # [B, N, S, 2]
    tl_flat = topleft.reshape(b * n * s, 2)  # reference flatten: (b, n, s)

    # reference batch_indices_score values are just the batch id b, so there
    # are only B DISTINCT source patches — extract all (s, n) windows from
    # each batch's single source instead of broadcasting it B*S*N times
    # (the broadcast materialized a 500 MB copy at full size). The flat
    # patch index b in the reference's (b, s, n) ordering maps to our
    # (b, n, s)-ordered storage as below.
    src = jnp.arange(b)
    b1 = src // (s * n)
    rem = src % (s * n)
    s1 = rem // n
    n1 = rem % n
    src_my = b1 * (n * s) + n1 * s + s1

    patches_flat = patch_feat.reshape(b * n * s, hp, wp, c)
    src_patches = patches_flat[src_my]  # [B, P', P', C]
    if (hp, wp) != (psize, psize):
        # patch features arrive at the fnet's native resolution; upsample
        # only the B selected source patches (instead of all B*N*S)
        from ..ops import resize_bilinear_align_corners

        src_patches = resize_bilinear_align_corners(src_patches, psize, psize)
    # topleft list consumed at (b, s, n) linear positions = the same linear
    # block per batch (the reference's transposed read)
    windows = extract_patches_ex(
        src_patches, tl_flat.reshape(b, s * n, 2), ssize
    ).reshape(b, s, n, ssize * ssize, c)

    sim = jnp.einsum(
        "bsnkc,bnc->bsnk", windows, query_feat,
        preferred_element_type=jnp.float32,
    )
    heat = jax.nn.softmax(sim / jnp.sqrt(jnp.asarray(c, sim.dtype)), axis=-1)

    # normalized grid in [-1, 1] (kornia create_meshgrid convention)
    lin = jnp.linspace(-1.0, 1.0, ssize)
    gy, gx = jnp.meshgrid(lin, lin, indexing="ij")
    grid = jnp.stack([gx.reshape(-1), gy.reshape(-1)], axis=-1)  # [K, 2]

    mean = jnp.einsum("bsnk,kd->bsnd", heat, grid)
    second = jnp.einsum("bsnk,kd->bsnd", heat, grid**2)
    var = second - mean**2
    std = jnp.sqrt(jnp.clip(var, 1e-10, None)).sum(axis=-1)  # [B, S, N]

    return jnp.concatenate([jnp.ones_like(std[:, :1]), std[:, 1:]], axis=1)
