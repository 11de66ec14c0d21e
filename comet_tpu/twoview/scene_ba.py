"""Staged scene reconstruction driver: init-pair BA -> incremental pose
refinement -> global BA -> iterative filter + re-BA.

Parity target: the reference's pycolmap-driven orchestration
(comet/utils/triangulation.py: triangulate_by_pair:45, init_BA:138,
refine_pose:260, global_BA:1020, iterative_global_BA:1076) and the
COLMAP-style point filter (triangulation_helpers.py:133-300), composed
from the repo's own dense-LM solvers (twoview/triangulation.py) and PnP
(twoview/pnp.py) instead of host C++ — every stage is batched jnp with
static shapes, so the whole pipeline jits.

Conventions: row-vector cameras (x_cam = x_world @ R + T), wxyz quats,
tracks [S, N, 2] pixels, one shared K (the COMET datasets have a single
intrinsics matrix per sequence).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.quaternions import matrix_to_quat, quat_to_matrix
from .pnp import solve_pnp
from .triangulation import (
    BAState,
    bundle_adjust,
    project_points,
    projection_matrices,
    triangulate_tracks,
    triangulate_tracks_ransac,
)


def camera_centers(q: jax.Array, t: jax.Array) -> jax.Array:
    """[S, 3] world-space centers: solve C @ R + T = 0 -> C = -T @ R^{-1},
    and R^{-1} = R^T for a rotation, so C_i = -T_j R_{ij}."""
    r = quat_to_matrix(q)  # [S, 3, 3]
    return -jnp.einsum("sj,sij->si", t, r)


def triangulation_angles_deg(
    points: jax.Array,  # [N, 3]
    centers: jax.Array,  # [S, 3]
) -> jax.Array:
    """Exhaustive pairwise triangulation angle per point, [S, S, N] degrees
    (colmap triangulation.cc:130 via the baseline/ray-length law of
    cosines, as in triangulation.py:85-130)."""
    rays = points[None, :, :] - centers[:, None, :]  # [S, N, 3]
    ray2 = jnp.sum(rays**2, -1)  # [S, N]
    base2 = jnp.sum(
        (centers[:, None, :] - centers[None, :, :]) ** 2, -1
    )  # [S, S]
    denom = 2.0 * jnp.sqrt(
        jnp.maximum(ray2[:, None, :] * ray2[None, :, :], 1e-12)
    )
    cosang = (ray2[:, None, :] + ray2[None, :, :] - base2[..., None]) / denom
    ang = jnp.degrees(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
    # the triangulation angle is min(theta, 180 - theta)
    return jnp.minimum(ang, 180.0 - ang)


def triangulate_by_pair(
    q: jax.Array, t: jax.Array, k: jax.Array,
    tracks: jax.Array, vis: jax.Array,
    max_reproj_error: float = 4.0,
    min_tri_angle: float = 1.5,
) -> Tuple[jax.Array, jax.Array]:
    """Triangulate every (frame 0, frame i) pair (triangulation.py:45-137).

    Returns (points_3d_pair [S-1, N, 3], inlier [S-1, N],
    angles [S-1, N] degrees) where inlier combines cheirality in both
    views, pair reprojection error, and the pair triangulation angle.
    """
    proj = projection_matrices(q, t, k)  # [S, 3, 4]
    s, n = tracks.shape[0], tracks.shape[1]
    r = quat_to_matrix(q)
    centers = -jnp.einsum("sj,sij->si", t, r)  # solve C @ R + T = 0

    def one_pair(i):
        m = vis[0] * vis[i]
        pair_proj = jnp.stack([proj[0], proj[i]])
        pair_obs = jnp.stack([tracks[0], tracks[i]])  # [2, N, 2]
        pts = triangulate_tracks(pair_proj, pair_obs, jnp.stack([m, m]))
        # cheirality: z > 0 in both cameras
        cam0 = pts @ r[0] + t[0]
        cami = pts @ r[i] + t[i]
        cheir = (cam0[:, 2] > 0) & (cami[:, 2] > 0)
        # pair reprojection error
        pred = project_points(pts, q[jnp.asarray([0])], t[jnp.asarray([0])], k)
        err0 = jnp.linalg.norm(pred[0] - tracks[0], axis=-1)
        predi = project_points(pts, q[i][None], t[i][None], k)
        erri = jnp.linalg.norm(predi[0] - tracks[i], axis=-1)
        reproj_ok = (err0 < max_reproj_error) & (erri < max_reproj_error)
        # triangulation angle between the two rays
        ray0 = jnp.sum((pts - centers[0]) ** 2, -1)
        rayi = jnp.sum((pts - centers[i]) ** 2, -1)
        base = jnp.sum((centers[i] - centers[0]) ** 2)
        cosang = (ray0 + rayi - base) / (
            2.0 * jnp.sqrt(jnp.maximum(ray0 * rayi, 1e-12))
        )
        ang = jnp.degrees(jnp.arccos(jnp.clip(cosang, -1.0, 1.0)))
        ang = jnp.minimum(ang, 180.0 - ang)
        inl = cheir & reproj_ok & (ang >= min_tri_angle) & (m > 0.5)
        return pts, inl, ang

    idx = jnp.arange(1, s)
    pts_pair, inlier, angles = jax.vmap(one_pair)(idx)
    return pts_pair, inlier, angles


class InitBAResult(NamedTuple):
    state: BAState  # all-camera state (only the init pair refined)
    points: jax.Array  # [N, 3] init cloud (pair-triangulated, BA-refined)
    point_valid: jax.Array  # [N] inlier mask of the init pair
    init_idx: jax.Array  # scalar — the partner frame chosen


def init_ba(
    q: jax.Array, t: jax.Array, k: jax.Array,
    tracks: jax.Array, vis: jax.Array,
    ba_iters: int = 15,
    init_max_reproj_error: float = 4.0,
) -> InitBAResult:
    """init_BA (triangulation.py:138-257): pick the best partner frame for
    frame 0, bundle-adjust ONLY that pair + its inlier points, write the
    refined pose back into the full state.

    Pair ranking: the reference argmaxes the raw inlier count
    (cheirality + angle >= 1.5 deg); when every candidate passes the angle
    gate that rule degenerates to "first frame wins" and can seed the
    scene from a near-minimal baseline whose cloud has huge depth error.
    Here the score is angle-weighted — sum over inliers of
    min(angle, 10 deg) — so wide-baseline pairs win while gross outliers
    and degenerate pairs still score zero.
    """
    pts_pair, inlier, angles = triangulate_by_pair(
        q, t, k, tracks, vis, max_reproj_error=init_max_reproj_error
    )
    score = jnp.sum(
        jnp.where(inlier, jnp.minimum(angles, 10.0), 0.0), axis=-1
    )
    init_rel = jnp.argmax(score)  # 0..S-2
    init_idx = init_rel + 1
    points = pts_pair[init_rel]
    point_valid = inlier[init_rel]

    pair_q = jnp.stack([q[0], q[init_idx]])
    pair_t = jnp.stack([t[0], t[init_idx]])
    pair_obs = jnp.stack([tracks[0], tracks[init_idx]])
    pair_mask = jnp.stack([point_valid, point_valid]).astype(tracks.dtype)
    state, _ = bundle_adjust(
        pair_q, pair_t, points, pair_obs, pair_mask, k,
        iters=ba_iters, huber_delta=init_max_reproj_error,
    )
    q_out = q.at[init_idx].set(state.q[1])
    t_out = t.at[init_idx].set(state.t[1])
    return InitBAResult(
        state=BAState(q=q_out, t=t_out, points=state.points),
        points=state.points, point_valid=point_valid, init_idx=init_idx,
    )


def refine_poses(
    q: jax.Array, t: jax.Array, k: jax.Array,
    points: jax.Array,  # [N, 3]
    point_valid: jax.Array,  # [N]
    tracks: jax.Array, vis: jax.Array,
    max_reproj_error: float = 12.0,
) -> Tuple[jax.Array, jax.Array]:
    """refine_pose (triangulation.py:260-380): re-estimate every camera's
    absolute pose against the current cloud (PnP + LM), keeping the new
    pose only where it does not lose reprojection inliers."""

    def inlier_count(qq, tt, obs, m):
        pred = project_points(points, qq[None], tt[None], k)[0]
        err = jnp.linalg.norm(pred - obs, axis=-1)
        cam = points @ quat_to_matrix(qq) + tt
        ok = (err < max_reproj_error) & (cam[:, 2] > 0) & (m > 0.5)
        return ok.sum()

    def one_camera(qq, tt, obs, m):
        w_base = (m > 0.5) & point_valid
        # soft inlier selection vs the current pose; when the current pose
        # is so far off that the gate starves (< 6 points), fall back to
        # the triangulation inliers — the reference's pycolmap absolute
        # pose RANSAC re-estimates from those (triangulation.py:314-330)
        pred = project_points(points, qq[None], tt[None], k)[0]
        err = jnp.linalg.norm(pred - obs, axis=-1)
        w_err = w_base & (err < max_reproj_error)
        w = jnp.where(w_err.sum() >= 6, w_err, w_base)
        res = solve_pnp(points, obs, k, weights=w.astype(obs.dtype))
        # solve_pnp projects cam = R @ x + t (column convention,
        # pnp.py:58-60); the scene state uses cam = x @ R + T, so the
        # scene rotation is the transpose
        q_new = matrix_to_quat(res.r.T)
        better = inlier_count(q_new, res.t, obs, m) >= inlier_count(
            qq, tt, obs, m
        )
        return (
            jnp.where(better, q_new, qq),
            jnp.where(better, res.t, tt),
        )

    return jax.vmap(one_camera)(q, t, tracks, vis)


def filter_points3d(
    points: jax.Array,  # [N, 3]
    tracks: jax.Array,  # [S, N, 2]
    q: jax.Array, t: jax.Array, k: jax.Array,
    max_reproj_error: float = 4.0,
    min_tri_angle: float = 1.5,
    check_triangle: bool = True,
    hard_max: float = 300.0,
) -> Tuple[jax.Array, jax.Array]:
    """filter_all_points3D (triangulation_helpers.py:133-300): per-view
    inlier = squared reprojection error under threshold AND in front of
    the camera; a point is valid when >= 2 inlier views, coordinates are
    bounded, and (optionally) some inlier pair subtends >= min_tri_angle.

    Returns (valid [N], inlier_detail [S, N])."""
    r = quat_to_matrix(q)
    cam = jnp.einsum("nj,sji->sni", points, r) + t[:, None, :]
    pred = project_points(points, q, t, k)
    err2 = jnp.sum((pred - tracks) ** 2, -1)
    err2 = jnp.where(cam[..., 2] > 0, err2, 1e6)
    inlier = err2 <= max_reproj_error**2  # [S, N]
    valid = inlier.sum(0) >= 2
    if hard_max > 0:
        valid = valid & (jnp.abs(points) <= hard_max).all(-1)
    if check_triangle:
        centers = -jnp.einsum("sj,sij->si", t, r)
        ang = triangulation_angles_deg(points, centers)  # [S, S, N]
        pair_inl = inlier[:, None, :] & inlier[None, :, :]
        ok = ((ang >= min_tri_angle) & pair_inl).any((0, 1))
        valid = valid & ok
    return valid, inlier


class SceneReconstruction(NamedTuple):
    state: BAState
    valid_tracks: jax.Array  # [N]
    inlier_mask: jax.Array  # [S, N]
    rms: jax.Array


def reconstruct_scene(
    q0: jax.Array, t0: jax.Array,
    tracks: jax.Array,  # [S, N, 2]
    vis: jax.Array,  # [S, N]
    k: jax.Array,
    ba_iters: int = 15,
    ba_rounds: int = 2,
    init_max_reproj_error: float = 4.0,
    refine_max_reproj_error: float = 12.0,
    max_reproj_error: float = 4.0,
    min_tri_angle: float = 1.5,
    min_valid_track_length: int = 3,
) -> SceneReconstruction:
    """The staged pipeline (Triangulator.forward orchestration,
    comet/models/triangulator.py:30 + triangulation.py:138,260,1020,1076):

    1. init_BA      — best (frame 0, frame i) pair triangulation + pair BA
    2. refine_pose  — per-camera PnP against the init cloud
    3. global BA    — all cameras, all-view RANSAC re-triangulation
    4. x ba_rounds  — filter points (reproj + angle + track length),
                      re-BA on survivors, re-triangulate

    The reference runs these as four pycolmap sessions with host<->device
    round-trips between each; here the stages chain on-device.
    """
    # stage 1: init pair
    init = init_ba(
        q0, t0, k, tracks, vis,
        ba_iters=ba_iters, init_max_reproj_error=init_max_reproj_error,
    )
    q, t = init.state.q, init.state.t

    # stage 2: incremental per-camera refinement vs the init cloud
    q, t = refine_poses(
        q, t, k, init.points, init.point_valid, tracks, vis,
        max_reproj_error=refine_max_reproj_error,
    )

    # stage 3: full re-triangulation (LO-RANSAC over all view pairs) + BA.
    # BA consumes the RANSAC inlier mask, NOT raw visibility — gross
    # outlier tracks (mismatches) triangulate inconsistently and would
    # otherwise drag the cameras even under a Huber kernel
    # (iterative_global_BA:1102-1127 feeds best_inlier_mask the same way).
    proj = projection_matrices(q, t, k)
    points, tri_inl = triangulate_tracks_ransac(
        proj, tracks, vis, threshold=refine_max_reproj_error
    )
    obs_mask = tri_inl & (vis > 0.5)
    # gate tracks on RANSAC inlier support BEFORE the first global BA
    # (triangulator.py:390: valid_tracks = best_inlier_num >=
    # min_valid_track_length, default 3 at triangulator.py:48): any two
    # views are trivially consistent with their own pair triangulation,
    # so 2-view support carries no signal against gross mismatches
    support_ok = obs_mask.sum(0) >= min_valid_track_length
    obs_mask = obs_mask & support_ok[None, :]
    # anneal the filter/robust threshold from the loose incremental-stage
    # tolerance down to the final max_reproj_error
    deltas = np.geomspace(
        refine_max_reproj_error, max_reproj_error, ba_rounds + 1
    )
    state, rms = bundle_adjust(
        q, t, points, tracks, obs_mask, k, iters=ba_iters,
        huber_delta=float(deltas[0]),
    )
    q, t, points = state.q, state.t, state.points

    # stage 4: iterative filter + re-BA (iterative_global_BA:1076)
    valid = jnp.ones(points.shape[0], bool)
    inlier = obs_mask
    for rnd in range(ba_rounds):
        valid, inlier = filter_points3d(
            points, tracks, q, t, k,
            max_reproj_error=float(deltas[rnd + 1]),
            min_tri_angle=min_tri_angle,
        )
        valid = valid & (
            (inlier & (vis > 0.5)).sum(0) >= min_valid_track_length
        )
        obs_mask = inlier & (vis > 0.5) & valid[None, :]
        state, rms = bundle_adjust(
            q, t, points, tracks, obs_mask, k, iters=ba_iters,
            huber_delta=float(deltas[rnd + 1]),
        )
        q, t, points = state.q, state.t, state.points
        if rnd + 1 < ba_rounds:
            proj = projection_matrices(q, t, k)
            new_pts, _ = triangulate_tracks_ransac(
                proj, tracks, vis, threshold=float(deltas[rnd + 1])
            )
            # keep BA-optimized coordinates for surviving tracks
            # (iterative_global_BA:1110: best_triangulated_points[valid] = opt)
            points = jnp.where(valid[:, None], points, new_pts)

    return SceneReconstruction(
        state=BAState(q=q, t=t, points=points),
        valid_tracks=valid, inlier_mask=obs_mask, rms=rms,
    )
