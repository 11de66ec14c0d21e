"""Preliminary camera estimation from point tracks.

Parity target: estimate_preliminary_cameras
(comet/two_view_geo/estimate_preliminary.py:98-230): pair frame 0 with every
other frame, RANSAC a fundamental matrix per pair from the track
correspondences (masked by visibility / score), lift to essential with the
default intrinsics (focal = max(W, H), principal point at the center),
decompose with cheirality, identity-pad frame 0, and return frame-0-relative
poses. The (S-1) pairs are one vmapped batch — the reference loops batched
torch RANSAC; here XLA fuses pairs, hypotheses, and points into one program.
"""

from __future__ import annotations

from typing import Dict, Tuple

import jax
import jax.numpy as jnp

from ..geometry.quaternions import matrix_to_quat
from .estimators import (
    motion_from_essential,
    run_8point,
    sampson_distance,
    to_homogeneous,
)


def default_kmat(width: int, height: int, dtype=jnp.float32) -> jax.Array:
    """Default intrinsics: focal = max(W, H), pp = center
    (estimate_preliminary.py:244-270 / get_default_intri)."""
    fl = float(max(width, height))
    return jnp.asarray(
        [[fl, 0.0, width / 2.0], [0.0, fl, height / 2.0], [0.0, 0.0, 1.0]],
        dtype,
    )


def _masked_fundamental_ransac(
    pts1: jax.Array,  # [N, 2]
    pts2: jax.Array,
    valid: jax.Array,  # [N] bool/float
    key: jax.Array,
    max_error: float,
    num_hypotheses: int,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """8-point RANSAC where invalid correspondences can neither be sampled
    nor counted as inliers. Returns (F, inlier_mask, residuals)."""
    n = pts1.shape[0]
    valid = valid.astype(pts1.dtype)
    p = valid / jnp.maximum(valid.sum(), 1.0)
    keys = jax.random.split(key, num_hypotheses)

    def hypothesis(k):
        idx = jax.random.choice(k, n, (8,), replace=False, p=p)
        return run_8point(pts1[idx], pts2[idx])

    models = jax.vmap(hypothesis)(keys)
    errs = jax.vmap(lambda m: sampson_distance(m, pts1, pts2))(models)
    inliers = (errs < max_error) & (valid > 0.5)
    scores = inliers.sum(axis=-1)
    best = jnp.argmax(scores)

    # local optimization: weighted refit on the best inlier set
    w = inliers[best].astype(pts1.dtype)
    f_refit = run_8point(pts1, pts2, weights=w)
    errs_r = sampson_distance(f_refit, pts1, pts2)
    inl_r = (errs_r < max_error) & (valid > 0.5)
    better = inl_r.sum() >= scores[best]
    f = jnp.where(better, f_refit, models[best])
    inl = jnp.where(better, inl_r, inliers[best])
    res = jnp.where(better, errs_r, errs[best])
    return f, inl, res


def estimate_preliminary_cameras(
    tracks: jax.Array,  # [B, S, N, 2] pixel tracks
    tracks_vis: jax.Array,  # [B, S, N] visibility in [0, 1]
    width: int,
    height: int,
    tracks_score: jax.Array = None,  # [B, S, N] optional confidence
    max_error: float = 0.5,
    num_hypotheses: int = 128,
    key: jax.Array = None,
) -> Tuple[Dict[str, jax.Array], Dict[str, jax.Array]]:
    """Tracks -> frame-0-relative preliminary poses.

    Returns (cameras, preliminary_dict):
      cameras = {"q": [B, S, 4] wxyz quats, "t": [B, S, 3]} (frame 0 id)
      preliminary_dict = {"fmat": [B, S-1, 3, 3],
                          "fmat_inlier_mask": [B, S-1, N]}
    matching the reference's outputs (estimate_preliminary.py:215-230).
    """
    key = key if key is not None else jax.random.PRNGKey(0)
    b, s, n, _ = tracks.shape
    q_pts = jnp.broadcast_to(tracks[:, 0:1], (b, s - 1, n, 2)).reshape(
        b * (s - 1), n, 2
    )
    r_pts = tracks[:, 1:].reshape(b * (s - 1), n, 2)

    valid = (tracks_vis >= 0.05)[:, 1:].reshape(b * (s - 1), n)
    if tracks_score is not None:
        valid = valid & (tracks_score >= 0.5)[:, 1:].reshape(b * (s - 1), n)

    kmat = default_kmat(width, height, tracks.dtype)
    kinv = jnp.linalg.inv(kmat)
    keys = jax.random.split(key, b * (s - 1))

    def per_pair(p1, p2, v, k_):
        f, inl, _ = _masked_fundamental_ransac(
            p1, p2, v, k_, max_error, num_hypotheses
        )
        # E = K2ᵀ F K1, then motion with cheirality on normalized coords
        e = kmat.T @ f @ kmat
        u, sv, vt = jnp.linalg.svd(e)
        e = (u * jnp.asarray([1.0, 1.0, 0.0], e.dtype)[None, :]) @ vt
        n1 = (to_homogeneous(p1) @ kinv.T)[:, :2]
        n2 = (to_homogeneous(p2) @ kinv.T)[:, :2]
        r, t = motion_from_essential(e, n1, n2)
        return f, inl, r, t

    f, inl, r, t = jax.vmap(per_pair)(q_pts, r_pts, valid, keys)

    r = r.reshape(b, s - 1, 3, 3)
    t = t.reshape(b, s - 1, 3)
    q_rel = jax.vmap(jax.vmap(matrix_to_quat))(r)

    # identity-pad frame 0 (estimate_preliminary.py:174-190)
    q_id = jnp.broadcast_to(
        jnp.asarray([1.0, 0, 0, 0], tracks.dtype), (b, 1, 4)
    )
    t_id = jnp.zeros((b, 1, 3), tracks.dtype)
    cameras = {
        "q": jnp.concatenate([q_id, q_rel], axis=1),
        "t": jnp.concatenate([t_id, t], axis=1),
    }
    preliminary = {
        "fmat": f.reshape(b, s - 1, 3, 3),
        "fmat_inlier_mask": inl.reshape(b, s - 1, n),
    }
    return cameras, preliminary
