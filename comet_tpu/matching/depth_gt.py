"""Depth-based ground-truth match generation for matcher training.

Capability parity: gluefactory/geometry/depth.py (sample_depth, project,
dense_warp_consistency) + gluefactory/geometry/gt_generation.py:14-106
(gt_matches_from_pose_depth) + gluefactory/geometry/epipolar.py (T_to_E,
sym_epipolar_distance_all) and the two GT-matcher registry models
(gluefactory/models/matchers/{depth_matcher,homography_matcher}.py).

Design: pinhole cameras as plain (K, R, t) arrays rather than torch
TensorWrapper classes; every function is static-shape and jit/vmap
friendly. Invalid pixels carry a boolean mask instead of NaN-poisoned
arithmetic (TPU-friendly: no NaN-dependent control flow).
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..twoview.estimators import to_homogeneous
from .gt_generation import IGNORE, UNMATCHED, gt_matches_from_homography

__all__ = [
    "sample_depth",
    "project_points_with_depth",
    "gt_matches_from_pose_depth",
    "dense_warp_consistency",
    "pose_to_essential",
    "essential_to_fundamental",
    "sym_epipolar_distance_all",
    "gt_line_matches_from_homography",
    "gt_line_matches_from_pose_depth",
]


# ---------------------------------------------------------------------------
# depth sampling (gluefactory/geometry/depth.py:8-25)
# ---------------------------------------------------------------------------


def sample_depth(pts: jax.Array, depth: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Sample a [H, W] depth map at [N, 2] pixel coords (x, y).

    Reference semantics (depth.py:8-25, grid_sample align_corners=False):
    bilinear interpolation over valid (depth > 0) neighbors; if any of the
    four neighbors is invalid the sample falls back to the nearest
    neighbor; the sample is valid iff the resulting value is > 0 and the
    point lands inside the map.
    Returns (depth_at_pts [N], valid [N]).
    """
    h, w = depth.shape
    # align_corners=False pixel-center convention: coordinate p samples the
    # continuous position p - 0.5 in texel space.
    x = pts[:, 0] - 0.5
    y = pts[:, 1] - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)

    def gather(yy, xx):
        yc = jnp.clip(yy, 0, h - 1)
        xc = jnp.clip(xx, 0, w - 1)
        inb = (yy >= 0) & (yy < h) & (xx >= 0) & (xx < w)
        d = depth[yc, xc]
        return d, inb & (d > 0)

    d00, v00 = gather(y0i, x0i)
    d01, v01 = gather(y0i, x0i + 1)
    d10, v10 = gather(y0i + 1, x0i)
    d11, v11 = gather(y0i + 1, x0i + 1)

    lin = (
        d00 * (1 - fy) * (1 - fx)
        + d01 * (1 - fy) * fx
        + d10 * fy * (1 - fx)
        + d11 * fy * fx
    )
    lin_ok = v00 & v01 & v10 & v11

    # nearest-neighbor fallback (grid_sample mode="nearest")
    xn = jnp.clip(jnp.round(x).astype(jnp.int32), 0, w - 1)
    yn = jnp.clip(jnp.round(y).astype(jnp.int32), 0, h - 1)
    nn = depth[yn, xn]

    out = jnp.where(lin_ok, lin, nn)
    inside = (pts[:, 0] >= 0) & (pts[:, 0] < w) & (pts[:, 1] >= 0) & (pts[:, 1] < h)
    valid = inside & (out > 0)
    return out, valid


# ---------------------------------------------------------------------------
# projection with optional circle consistency (depth.py:37-68)
# ---------------------------------------------------------------------------


def _image2cam(kp: jax.Array, k: jax.Array) -> jax.Array:
    """[N, 2] pixels -> [N, 3] unit-depth camera rays."""
    return to_homogeneous(kp) @ jnp.linalg.inv(k).T


def _cam2image(
    p3d: jax.Array, k: jax.Array, size: Optional[Tuple[int, int]] = None
) -> Tuple[jax.Array, jax.Array]:
    """[N, 3] camera points -> ([N, 2] pixels, validity).

    Validity = in front of the camera (z > 1e-4, wrappers.py:239 eps) and,
    when ``size`` = (width, height) is given, inside [0, size-1]
    (wrappers.py:327-334 in_image)."""
    z = p3d[:, 2]
    valid = z > 1e-4
    zs = jnp.maximum(z, 1e-4)
    uvw = p3d @ k.T
    p2d = uvw[:, :2] / zs[:, None]
    if size is not None:
        w, h = size
        valid = valid & (
            (p2d[:, 0] >= 0) & (p2d[:, 0] <= w - 1)
            & (p2d[:, 1] >= 0) & (p2d[:, 1] <= h - 1)
        )
    return p2d, valid


def project_points_with_depth(
    kp_i: jax.Array,  # [N, 2]
    d_i: jax.Array,  # [N]
    k_i: jax.Array,
    k_j: jax.Array,
    r_itoj: jax.Array,  # [3, 3]
    t_itoj: jax.Array,  # [3]
    valid_i: jax.Array,  # [N] bool
    depth_j: Optional[jax.Array] = None,  # [H, W]
    cc_th: Optional[float] = None,
    size_i: Optional[Tuple[int, int]] = None,  # (width, height)
    size_j: Optional[Tuple[int, int]] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Lift keypoints of view i by their depth, move into view j, project.

    With ``depth_j``/``cc_th`` given, additionally requires circle
    consistency: the projected point, lifted by view j's depth and warped
    back, must land within sqrt(cc_th) px of the original (depth.py:58-68).
    Returns (kp_in_j [N, 2], visible [N]).
    """
    p_i = _image2cam(kp_i, k_i) * d_i[:, None]
    p_j = p_i @ r_itoj.T + t_itoj
    kp_j, front_j = _cam2image(p_j, k_j, size_j)
    visible = valid_i & front_j
    if depth_j is None or cc_th is None:
        return kp_j, visible
    d_j, dvalid_j = sample_depth(kp_j, depth_j)
    p_back = _image2cam(kp_j, k_j) * d_j[:, None]
    # inverse transform: x_i = R^T (x_j - t)
    p_i_back = (p_back - t_itoj) @ r_itoj
    kp_i_back, valid_back = _cam2image(p_i_back, k_i, size_i)
    consistent = jnp.sum((kp_i - kp_i_back) ** 2, -1) < cc_th
    return kp_j, visible & consistent & dvalid_j & valid_back


# ---------------------------------------------------------------------------
# epipolar helpers (gluefactory/geometry/epipolar.py:7-73)
# ---------------------------------------------------------------------------


def pose_to_essential(r: jax.Array, t: jax.Array) -> jax.Array:
    """E = [t]x R for the 0->1 relative pose (epipolar.py:7-10)."""
    tx = jnp.array(
        [
            [0.0, -t[2], t[1]],
            [t[2], 0.0, -t[0]],
            [-t[1], t[0], 0.0],
        ]
    )
    return tx @ r


def essential_to_fundamental(e: jax.Array, k0: jax.Array, k1: jax.Array) -> jax.Array:
    """F = K1^-T E K0^-1 (epipolar.py:16-21)."""
    return jnp.linalg.inv(k1).T @ e @ jnp.linalg.inv(k0)


def sym_epipolar_distance_all(
    p0: jax.Array, p1: jax.Array, f: jax.Array, eps: float = 1e-15
) -> jax.Array:
    """All-pairs symmetric epipolar distance (epipolar.py:59-72).

    p0 [N0, 2], p1 [N1, 2] pixel coords; F the fundamental matrix.
    Returns [N0, N1]."""
    l1 = to_homogeneous(p0) @ f.T  # epipolar lines of p0 in image 1: [N0, 3]
    l0 = to_homogeneous(p1) @ f  # epipolar lines of p1 in image 0: [N1, 3]
    num = jnp.abs(jnp.einsum("ic,jc->ij", l1, to_homogeneous(p1)))  # [N0, N1]
    inv1 = 1.0 / (jnp.sqrt(l1[:, 0] ** 2 + l1[:, 1] ** 2) + eps)  # [N0]
    inv0 = 1.0 / (jnp.sqrt(l0[:, 0] ** 2 + l0[:, 1] ** 2) + eps)  # [N1]
    return num * (inv1[:, None] + inv0[None, :])


# ---------------------------------------------------------------------------
# depth-based GT matches (gt_generation.py:14-106)
# ---------------------------------------------------------------------------


def gt_matches_from_pose_depth(
    kp0: jax.Array,  # [N0, 2]
    kp1: jax.Array,  # [N1, 2]
    depth0: jax.Array,  # [H, W]
    depth1: jax.Array,  # [H, W]
    k0: jax.Array,
    k1: jax.Array,
    r_0to1: jax.Array,
    t_0to1: jax.Array,
    pos_threshold: float = 3.0,
    neg_threshold: float = 5.0,
    cc_threshold: Optional[float] = None,
    epi_threshold: Optional[float] = None,
) -> Dict[str, jax.Array]:
    """Full depth-warp GT labeling (gt_generation.py gt_matches_from_pose_depth).

    Lifts each keypoint by its sampled depth, warps it into the other view,
    and labels mutual nearest pairs within ``pos_threshold`` px as positive
    matches; keypoints whose warp lands farther than ``neg_threshold`` from
    every counterpart are UNMATCHED (-1); everything else IGNORE (-2).
    With ``epi_threshold``, depth-invalid keypoints that are epipolar-far
    from all ignores are promoted to UNMATCHED (the reference's extra
    negative mining, gt_generation.py:85-91). NOTE: like the reference's
    ``epi_th``, the parameter only ENABLES the mining — the epipolar
    comparison itself uses ``neg_threshold`` (gt_generation.py:88-89),
    so its numeric value is irrelevant beyond being non-None.
    """
    n0, n1 = kp0.shape[0], kp1.shape[0]
    d0, valid0 = sample_depth(kp0, depth0)
    d1, valid1 = sample_depth(kp1, depth1)

    r_1to0 = r_0to1.T
    t_1to0 = -r_0to1.T @ t_0to1
    size0 = (depth0.shape[1], depth0.shape[0])
    size1 = (depth1.shape[1], depth1.shape[0])
    kp0_1, vis0 = project_points_with_depth(
        kp0, d0, k0, k1, r_0to1, t_0to1, valid0, depth1, cc_threshold,
        size_i=size0, size_j=size1,
    )
    kp1_0, vis1 = project_points_with_depth(
        kp1, d1, k1, k0, r_1to0, t_1to0, valid1, depth0, cc_threshold,
        size_i=size1, size_j=size0,
    )
    mask_visible = vis0[:, None] & vis1[None, :]

    dist0 = jnp.sum((kp0_1[:, None] - kp1[None]) ** 2, -1)  # [N0, N1]
    dist1 = jnp.sum((kp0[:, None] - kp1_0[None]) ** 2, -1)
    dist = jnp.maximum(dist0, dist1)
    inf = jnp.asarray(jnp.inf, dist.dtype)
    dist = jnp.where(mask_visible, dist, inf)

    min0 = jnp.argmin(dist, axis=1)  # [N0]
    min1 = jnp.argmin(dist, axis=0)  # [N1]
    ismin0 = jnp.zeros(dist.shape, bool).at[jnp.arange(n0), min0].set(True)
    ismin1 = jnp.zeros(dist.shape, bool).at[min1, jnp.arange(n1)].set(True)
    positive = ismin0 & ismin1 & (dist < pos_threshold**2)

    negative0 = (jnp.min(dist0, axis=1) > neg_threshold**2) & valid0
    negative1 = (jnp.min(dist1, axis=0) > neg_threshold**2) & valid1

    m0 = jnp.where(jnp.any(positive, axis=1), min0, IGNORE)
    m1 = jnp.where(jnp.any(positive, axis=0), min1, IGNORE)
    m0 = jnp.where(negative0, UNMATCHED, m0)
    m1 = jnp.where(negative1, UNMATCHED, m1)

    f = essential_to_fundamental(pose_to_essential(r_0to1, t_0to1), k0, k1)
    epi_dist = sym_epipolar_distance_all(kp0, kp1, f)

    if epi_threshold is not None:
        # extra negatives: depth-invalid keypoints that are epipolar-far
        # from every still-ambiguous counterpart (gt_generation.py:85-91)
        mask_ignore = (m0[:, None] == IGNORE) & (m1[None, :] == IGNORE)
        epi_masked = jnp.where(mask_ignore, epi_dist, inf)
        exclude0 = jnp.min(epi_masked, axis=1) > neg_threshold
        exclude1 = jnp.min(epi_masked, axis=0) > neg_threshold
        m0 = jnp.where((~valid0) & exclude0, UNMATCHED, m0)
        m1 = jnp.where((~valid1) & exclude1, UNMATCHED, m1)

    return {
        "assignment": positive,
        "reward": (dist < pos_threshold**2).astype(jnp.float32)
        - (epi_dist > neg_threshold).astype(jnp.float32),
        "matches0": m0,
        "matches1": m1,
        "matching_scores0": (m0 > -1).astype(jnp.float32),
        "matching_scores1": (m1 > -1).astype(jnp.float32),
        "depth_keypoints0": d0,
        "depth_keypoints1": d1,
        "proj_0to1": kp0_1,
        "proj_1to0": kp1_0,
        "visible0": vis0,
        "visible1": vis1,
    }


def dense_warp_consistency(
    depth0: jax.Array,  # [H, W]
    depth1: jax.Array,
    k0: jax.Array,
    k1: jax.Array,
    r_0to1: jax.Array,
    t_0to1: jax.Array,
    cc_th: Optional[float] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Warp every pixel of view 0 into view 1 through its depth
    (depth.py:71-88). Returns (warped [H, W, 2], valid [H, W])."""
    h, w = depth0.shape
    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    kp = jnp.stack([xs + 0.5, ys + 0.5], -1).reshape(-1, 2).astype(depth0.dtype)
    d = depth0.reshape(-1)
    warped, valid = project_points_with_depth(
        kp, d, k0, k1, r_0to1, t_0to1, d > 0,
        depth1 if cc_th else None, cc_th,
        size_i=(w, h), size_j=(depth1.shape[1], depth1.shape[0]),
    )
    return warped.reshape(h, w, 2), valid.reshape(h, w)


# ---------------------------------------------------------------------------
# line GT (gt_generation.py:208-558, jit-friendly redesign)
# ---------------------------------------------------------------------------


def _sample_segments(lines: jax.Array, n_samples: int) -> jax.Array:
    """[M, 2, 2] segments -> [M, S, 2] equally spaced sample points."""
    ts = jnp.linspace(0.0, 1.0, n_samples)[:, None]
    return lines[:, None, 0] * (1 - ts)[None] + lines[:, None, 1] * ts[None]


def _segment_distances(samples, segs, sample_valid=None):
    """Warped samples [M, S, 2] vs candidate segments [K, 2, 2].

    Returns (mean perpendicular distance of inlier samples [M, K],
    overlap fraction [M, K]). A sample counts toward a candidate when its
    projection parameter falls inside the segment AND the sample itself is
    valid (``sample_valid`` [M, S], e.g. depth-warp visibility)."""
    a = segs[:, 0]  # [K, 2]
    d = segs[:, 1] - segs[:, 0]  # [K, 2]
    len2 = jnp.maximum(jnp.sum(d**2, -1), 1e-9)  # [K]
    rel = samples[:, :, None] - a[None, None]  # [M, S, K, 2]
    t = jnp.einsum("mskc,kc->msk", rel, d) / len2
    inside = (t >= 0.0) & (t <= 1.0)
    if sample_valid is not None:
        inside = inside & sample_valid[:, :, None]
    cross = rel[..., 0] * d[None, None, :, 1] - rel[..., 1] * d[None, None, :, 0]
    perp = jnp.abs(cross) / jnp.sqrt(len2)[None, None]
    overlap = jnp.mean(inside.astype(jnp.float32), axis=1)  # [M, K]
    wsum = jnp.sum(jnp.where(inside, perp, 0.0), axis=1)
    cnt = jnp.maximum(jnp.sum(inside, axis=1), 1)
    return wsum / cnt, overlap


def _mutual_line_assignment(d01, ov01, d10, ov10, dist_threshold,
                            overlap_threshold, n0, n1):
    """Symmetric cost + mutual-NN decision shared by both line-GT paths."""
    dist = jnp.maximum(d01, d10.T)
    overlap = jnp.minimum(ov01, ov10.T)
    cost = jnp.where(
        overlap > overlap_threshold, dist, jnp.asarray(jnp.inf, dist.dtype)
    )
    nn0 = jnp.argmin(cost, axis=1)
    nn1 = jnp.argmin(cost, axis=0)
    best0 = jnp.min(cost, axis=1)
    best1 = jnp.min(cost, axis=0)
    mutual0 = jnp.arange(n0) == nn1[nn0]
    mutual1 = jnp.arange(n1) == nn0[nn1]
    m0 = jnp.where(mutual0 & (best0 < dist_threshold), nn0, UNMATCHED)
    m1 = jnp.where(mutual1 & (best1 < dist_threshold), nn1, UNMATCHED)
    return {
        "line_matches0": m0,
        "line_matches1": m1,
        "distances": dist,
        "overlaps": overlap,
    }


def gt_line_matches_from_pose_depth(
    lines0: jax.Array,  # [M0, 2, 2]
    lines1: jax.Array,  # [M1, 2, 2]
    depth0: jax.Array,
    depth1: jax.Array,
    k0: jax.Array,
    k1: jax.Array,
    r_0to1: jax.Array,
    t_0to1: jax.Array,
    n_samples: int = 8,
    dist_threshold: float = 3.0,
    overlap_threshold: float = 0.4,
) -> Dict[str, jax.Array]:
    """Line-segment GT under a relative pose with depth maps
    (gt_generation.py:208-409 redesigned static-shape).

    Samples points along each segment, lifts them by the sampled depth,
    warps them into the other view, and scores segment pairs by the mean
    perpendicular distance / overlap of the VISIBLE warped samples —
    depth-invalid or occluded samples simply don't vote, so a partially
    occluded line can still match through its visible span.
    """
    m0n, m1n = lines0.shape[0], lines1.shape[0]
    size0 = (depth0.shape[1], depth0.shape[0])
    size1 = (depth1.shape[1], depth1.shape[0])
    r_1to0 = r_0to1.T
    t_1to0 = -r_0to1.T @ t_0to1

    def warp(lines, depth_i, depth_j, k_i, k_j, r, t, size_i, size_j):
        pts = _sample_segments(lines, n_samples).reshape(-1, 2)
        d, valid = sample_depth(pts, depth_i)
        warped, vis = project_points_with_depth(
            pts, d, k_i, k_j, r, t, valid, size_i=size_i, size_j=size_j
        )
        m = lines.shape[0]
        return warped.reshape(m, n_samples, 2), vis.reshape(m, n_samples)

    w0, v0 = warp(lines0, depth0, depth1, k0, k1, r_0to1, t_0to1, size0, size1)
    w1, v1 = warp(lines1, depth1, depth0, k1, k0, r_1to0, t_1to0, size1, size0)
    d01, ov01 = _segment_distances(w0, lines1, v0)
    d10, ov10 = _segment_distances(w1, lines0, v1)
    return _mutual_line_assignment(
        d01, ov01, d10, ov10, dist_threshold, overlap_threshold, m0n, m1n
    )


def gt_line_matches_from_homography(
    lines0: jax.Array,  # [M0, 2, 2] segments as (endpoint, xy)
    lines1: jax.Array,  # [M1, 2, 2]
    h: jax.Array,  # [3, 3] image0 -> image1
    n_samples: int = 8,
    dist_threshold: float = 3.0,
    overlap_threshold: float = 0.5,
) -> Dict[str, jax.Array]:
    """Line-segment GT assignment under a homography.

    Redesign of gt_generation.py:410-558 with static shapes: sample
    ``n_samples`` points along each segment of image 0, warp them by H, and
    measure (a) the perpendicular distance of each warped sample to each
    candidate segment's infinite line and (b) the fraction of samples whose
    projection parameter falls inside the segment (overlap). A pair matches
    when the mean perpendicular distance of overlapping samples is below
    ``dist_threshold`` and the overlap fraction exceeds
    ``overlap_threshold``, mutually.
    """
    from .gt_generation import warp_homography

    m0n, m1n = lines0.shape[0], lines1.shape[0]
    pts0 = _sample_segments(lines0, n_samples).reshape(-1, 2)
    pts0w = warp_homography(pts0, h).reshape(m0n, n_samples, 2)
    pts1 = _sample_segments(lines1, n_samples).reshape(-1, 2)
    pts1w = warp_homography(pts1, jnp.linalg.inv(h)).reshape(m1n, n_samples, 2)

    d01, ov01 = _segment_distances(pts0w, lines1)  # image-1 frame
    d10, ov10 = _segment_distances(pts1w, lines0)  # image-0 frame; [M1, M0]
    return _mutual_line_assignment(
        d01, ov01, d10, ov10, dist_threshold, overlap_threshold, m0n, m1n
    )


# ---------------------------------------------------------------------------
# GT-matcher registry models
# (gluefactory/models/matchers/{homography_matcher,depth_matcher}.py)
# ---------------------------------------------------------------------------


def _register():
    from .registry import register_model

    @register_model(
        "matcher_homography",
        {"pos_threshold": 3.0, "neg_threshold": 6.0},
    )
    def make_homography_matcher(pos_threshold=3.0, neg_threshold=6.0):
        """GT matcher: labels from the pair's homography
        (homography_matcher.py:8-39). Called with (feats0, feats1, data)
        where data carries H_0to1."""

        def matcher(feats0, feats1, data):
            return gt_matches_from_homography(
                feats0["keypoints"],
                feats1["keypoints"],
                data["H_0to1"],
                pos_threshold=pos_threshold,
                neg_threshold=neg_threshold,
            )

        return matcher

    @register_model(
        "matcher_depth",
        {
            "pos_threshold": 3.0,
            "neg_threshold": 5.0,
            "cc_threshold": None,
            "epi_threshold": None,
        },
    )
    def make_depth_matcher(
        pos_threshold=3.0, neg_threshold=5.0, cc_threshold=None, epi_threshold=None
    ):
        """GT matcher: labels from pose + depth warps (depth_matcher.py:10-51).
        Called with (feats0, feats1, data) where data carries depth0/1,
        K0/K1 and the 0->1 relative pose."""

        def matcher(feats0, feats1, data):
            return gt_matches_from_pose_depth(
                feats0["keypoints"],
                feats1["keypoints"],
                data["depth0"],
                data["depth1"],
                data["K0"],
                data["K1"],
                data["R_0to1"],
                data["t_0to1"],
                pos_threshold=pos_threshold,
                neg_threshold=neg_threshold,
                cc_threshold=cc_threshold,
                epi_threshold=epi_threshold,
            )

        return matcher


_register()
