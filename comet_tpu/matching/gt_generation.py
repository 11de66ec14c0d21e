"""Ground-truth match generation from homographies / relative poses.

Capability parity: gluefactory/geometry/gt_generation.py (558 LoC) —
the supervision source for training matchers. Given two keypoint sets and
the true two-view geometry, produce the GT assignment: mutual nearest
reprojections within a pixel threshold match; points without a
counterpart are labeled unmatched (-1); ambiguous ones ignored (-2).
Static shapes, jit-friendly.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..twoview.estimators import to_homogeneous

IGNORE = -2
UNMATCHED = -1


def warp_homography(kpts: jax.Array, h: jax.Array) -> jax.Array:
    """[N, 2] points through a 3x3 homography."""
    x = to_homogeneous(kpts) @ h.T
    return x[:, :2] / jnp.where(jnp.abs(x[:, 2:]) > 1e-8, x[:, 2:], 1e-8)


def gt_matches_from_homography(
    kpts0: jax.Array,  # [N0, 2]
    kpts1: jax.Array,  # [N1, 2]
    h: jax.Array,  # [3, 3] mapping image0 -> image1
    pos_threshold: float = 3.0,
    neg_threshold: float = 6.0,
) -> Dict[str, jax.Array]:
    """GT assignments (gt_generation.py gt_matches_from_homographies).

    Returns matches0 [N0], matches1 [N1] with indices, UNMATCHED or
    IGNORE, plus the reprojection distance matrix."""
    proj0 = warp_homography(kpts0, h)  # kpts0 in image 1
    proj1 = warp_homography(kpts1, jnp.linalg.inv(h))  # kpts1 in image 0

    d0 = jnp.linalg.norm(proj0[:, None] - kpts1[None], axis=-1)  # [N0, N1]
    d1 = jnp.linalg.norm(kpts0[:, None] - proj1[None], axis=-1)  # [N0, N1]
    dist = jnp.maximum(d0, d1)  # symmetric reprojection distance

    nn0 = jnp.argmin(dist, axis=1)
    nn1 = jnp.argmin(dist, axis=0)
    best0 = jnp.min(dist, axis=1)
    best1 = jnp.min(dist, axis=0)
    mutual0 = jnp.arange(kpts0.shape[0]) == nn1[nn0]
    mutual1 = jnp.arange(kpts1.shape[0]) == nn0[nn1]

    pos0 = mutual0 & (best0 < pos_threshold)
    neg0 = best0 > neg_threshold
    matches0 = jnp.where(pos0, nn0, jnp.where(neg0, UNMATCHED, IGNORE))
    pos1 = mutual1 & (best1 < pos_threshold)
    neg1 = best1 > neg_threshold
    matches1 = jnp.where(pos1, nn1, jnp.where(neg1, UNMATCHED, IGNORE))
    return {"matches0": matches0, "matches1": matches1, "distances": dist}


def gt_matches_from_pose(
    kpts0: jax.Array,
    kpts1: jax.Array,
    e: jax.Array,  # [3, 3] essential matrix (normalized coords)
    k0: jax.Array,
    k1: jax.Array,
    pos_threshold: float = 5e-4,
    neg_threshold: float = 5e-3,
) -> Dict[str, jax.Array]:
    """Epipolar GT labeling (gt_generation.py gt_matches_from_pose_depth's
    depth-free variant): pairs below the symmetric-epipolar threshold can
    match; pairs above the negative threshold are definite non-matches."""
    n0 = to_homogeneous(kpts0) @ jnp.linalg.inv(k0).T
    n1 = to_homogeneous(kpts1) @ jnp.linalg.inv(k1).T
    # epipolar lines: l1_i = E n0_i in image 1; l0_j = Eᵀ n1_j in image 0
    l1 = n0 @ e.T  # [N0, 3]
    l0 = n1 @ e  # [N1, 3]
    # algebraic residual per pair: n1_jᵀ E n0_i = l1_i · n1_j
    num = jnp.abs(jnp.einsum("ic,jc->ij", l1, n1))  # [N0, N1]
    # symmetric point-line distance: residual scaled by both line norms
    norm1 = jnp.sqrt(l1[:, 0] ** 2 + l1[:, 1] ** 2)  # [N0]
    norm0 = jnp.sqrt(l0[:, 0] ** 2 + l0[:, 1] ** 2)  # [N1]
    dist = 0.5 * num * (
        1.0 / jnp.maximum(norm1[:, None], 1e-9)
        + 1.0 / jnp.maximum(norm0[None, :], 1e-9)
    )

    nn0 = jnp.argmin(dist, axis=1)
    nn1 = jnp.argmin(dist, axis=0)
    best0 = jnp.min(dist, axis=1)
    best1 = jnp.min(dist, axis=0)
    mutual0 = jnp.arange(kpts0.shape[0]) == nn1[nn0]
    mutual1 = jnp.arange(kpts1.shape[0]) == nn0[nn1]
    matches0 = jnp.where(
        mutual0 & (best0 < pos_threshold), nn0,
        jnp.where(best0 > neg_threshold, UNMATCHED, IGNORE),
    )
    matches1 = jnp.where(
        mutual1 & (best1 < pos_threshold), nn1,
        jnp.where(best1 > neg_threshold, UNMATCHED, IGNORE),
    )
    return {"matches0": matches0, "matches1": matches1, "distances": dist}
