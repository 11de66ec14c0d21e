"""Multi-view triangulation + dense Levenberg-Marquardt bundle adjustment.

TPU-native replacement for the reference's pycolmap (C++) BA stack
(comet/utils/triangulation.py:45,138,260,1020,1076 and
comet/models/triangulator.py:30): DLT triangulation over all views as one
batched SVD, LO-RANSAC over static hypothesis sets, and a dense LM bundle
adjuster in pure jnp — at COMET scale (S<=16 cameras, N<=512 points) the
dense normal equations fit comfortably on-chip and XLA batches the factor
solves on the MXU, so no host C++ solver is needed.

Rotations are parameterized as wxyz quaternions, renormalized each step;
cameras follow the row-vector convention x_cam = x_world @ R + T.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..geometry.quaternions import quat_normalize, quat_to_matrix


def triangulate_multiview(
    proj: jax.Array,  # [S, 3, 4] projection matrices (K [R|t] row-conv applied)
    pts2d: jax.Array,  # [S, 2] observations of one point
    mask: jax.Array,  # [S] observation validity
) -> jax.Array:
    """All-view DLT triangulation of one point (triangulation.py:677)."""
    rows_x = pts2d[:, 0:1] * proj[:, 2] - proj[:, 0]  # [S, 4]
    rows_y = pts2d[:, 1:2] * proj[:, 2] - proj[:, 1]
    a = jnp.concatenate([rows_x, rows_y], axis=0)  # [2S, 4]
    w = jnp.concatenate([mask, mask], axis=0).astype(a.dtype)
    a = a * w[:, None]
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    x = vt[-1]
    return x[:3] / jnp.where(jnp.abs(x[3]) > 1e-10, x[3], 1e-10)


triangulate_tracks = jax.vmap(triangulate_multiview, in_axes=(None, 1, 1))
# pts2d [S, N, 2], mask [S, N] -> points [N, 3]


def projection_matrices(
    q: jax.Array, t: jax.Array, k: jax.Array
) -> jax.Array:
    """Build [S, 3, 4] projection matrices from quats/translations/intrinsics.

    Row convention x_cam = x_world @ R + T means the column-vector projection
    matrix is K [R^T | T]."""
    r = quat_to_matrix(q)  # [S, 3, 3]
    rt = jnp.swapaxes(r, -1, -2)
    ext = jnp.concatenate([rt, t[..., None]], axis=-1)  # [S, 3, 4]
    return jnp.einsum("ij,sjk->sik", k, ext)


def project_points(
    points: jax.Array, q: jax.Array, t: jax.Array, k: jax.Array
) -> jax.Array:
    """points [N, 3], cameras [S] -> pixel coords [S, N, 2]."""
    r = quat_to_matrix(q)
    cam = jnp.einsum("nj,sji->sni", points, r) + t[:, None, :]
    pix = jnp.einsum("ij,snj->sni", k, cam)
    return pix[..., :2] / jnp.maximum(jnp.abs(pix[..., 2:]), 1e-8) * jnp.sign(
        pix[..., 2:]
    )


class BAState(NamedTuple):
    q: jax.Array  # [S, 4]
    t: jax.Array  # [S, 3]
    points: jax.Array  # [N, 3]


def reprojection_residuals(
    state: BAState, obs: jax.Array, mask: jax.Array, k: jax.Array
) -> jax.Array:
    """Masked residual vector [S*N*2]."""
    pred = project_points(state.points, state.q, state.t, k)
    res = (pred - obs) * mask[..., None]
    return res.reshape(-1)


def bundle_adjust(
    q0: jax.Array,
    t0: jax.Array,
    points0: jax.Array,
    obs: jax.Array,  # [S, N, 2]
    mask: jax.Array,  # [S, N]
    k: jax.Array,  # [3, 3]
    iters: int = 20,
    damping_init: float = 1e-3,
    fix_first_camera: bool = True,
    huber_delta: float = None,
) -> Tuple[BAState, jax.Array]:
    """Dense Levenberg-Marquardt over all camera + point parameters.

    Equivalent capability to the reference's pycolmap global_BA
    (triangulation.py:1020): jointly refines S poses and N points under
    reprojection error. Dense J^T J with adaptive damping, all jnp — jits
    and runs on the MXU. With huber_delta set, each LM step reweights
    residuals IRLS-style with the Huber influence (pycolmap BA uses a
    robust kernel; hard pre-masking instead can disconnect a badly
    initialized camera entirely). Returns (refined state, final rms).
    """
    mask = mask.astype(obs.dtype)
    s = q0.shape[0]

    def pack(state: BAState) -> jax.Array:
        return jnp.concatenate(
            [state.q.reshape(-1), state.t.reshape(-1), state.points.reshape(-1)]
        )

    n_pts = points0.shape[0]

    def unpack(vec: jax.Array) -> BAState:
        nq = s * 4
        nt = s * 3
        q = vec[:nq].reshape(s, 4)
        t = vec[nq : nq + nt].reshape(s, 3)
        pts = vec[nq + nt :].reshape(n_pts, 3)
        return BAState(q=quat_normalize(q), t=t, points=pts)

    def residual_fn(vec):
        return reprojection_residuals(unpack(vec), obs, mask, k)

    x = pack(BAState(q=q0, t=t0, points=points0))
    n_params = x.shape[0]

    # gauge fixing: freeze camera 0 (quat + translation)
    free = jnp.ones((n_params,), obs.dtype)
    if fix_first_camera:
        free = free.at[:4].set(0.0)  # q[0]
        free = free.at[s * 4 : s * 4 + 3].set(0.0)  # t[0]

    def robust_w(r):
        if huber_delta is None:
            return jnp.ones_like(r)
        # sqrt of the Huber IRLS weight: w = min(1, delta/|r|)
        return jnp.sqrt(jnp.minimum(1.0, huber_delta / jnp.maximum(jnp.abs(r), 1e-8)))

    def robust_cost(r):
        w = robust_w(r)
        return jnp.sum((w * r) ** 2)

    def lm_step(carry, _):
        x, lam = carry
        r = residual_fn(x)
        w = robust_w(jax.lax.stop_gradient(r))
        jac = jax.jacfwd(residual_fn)(x)  # [M, P] dense
        jac = jac * free[None, :] * w[:, None]
        rw = r * w
        jtj = jac.T @ jac
        jtr = jac.T @ rw
        # damped normal equations
        a = jtj + lam * jnp.diag(jnp.maximum(jnp.diag(jtj), 1e-8))
        delta = jnp.linalg.solve(a, -jtr)
        x_new = x + delta * free
        cost_old = jnp.sum(rw**2)
        cost_new = robust_cost(residual_fn(x_new))
        improved = cost_new < cost_old
        x = jnp.where(improved, x_new, x)
        lam = jnp.where(improved, lam * 0.5, lam * 4.0)
        return (x, lam), cost_new

    (x, _), costs = jax.lax.scan(
        lm_step, (x, jnp.asarray(damping_init, obs.dtype)), None, length=iters
    )
    final = unpack(x)
    n_obs = jnp.maximum(mask.sum() * 2, 1.0)
    rms = jnp.sqrt(jnp.sum(residual_fn(x) ** 2) / n_obs)
    return final, rms


def triangulate_and_refine(
    q: jax.Array,
    t: jax.Array,
    tracks: jax.Array,  # [S, N, 2] pixel tracks
    vis: jax.Array,  # [S, N]
    k: jax.Array,
    ba_iters: int = 15,
) -> Tuple[BAState, jax.Array]:
    """init_BA-style pipeline (triangulation.py:138): DLT triangulate all
    tracks from the given poses, then LM-refine points + poses jointly."""
    proj = projection_matrices(q, t, k)
    points = triangulate_tracks(proj, tracks, vis)
    return bundle_adjust(q, t, points, tracks, vis, k, iters=ba_iters)


def _triangulate_from_pair(
    proj: jax.Array, pts2d: jax.Array, i: jax.Array, j: jax.Array
) -> jax.Array:
    """DLT triangulation of one point from views (i, j)."""
    pi, pj = proj[i], proj[j]
    xi, xj = pts2d[i], pts2d[j]
    a = jnp.stack(
        [
            xi[0] * pi[2] - pi[0],
            xi[1] * pi[2] - pi[1],
            xj[0] * pj[2] - pj[0],
            xj[1] * pj[2] - pj[1],
        ]
    )
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    x = vt[-1]
    return x[:3] / jnp.where(jnp.abs(x[3]) > 1e-10, x[3], 1e-10)


def triangulate_tracks_ransac(
    proj: jax.Array,  # [S, 3, 4]
    tracks: jax.Array,  # [S, N, 2]
    vis: jax.Array,  # [S, N] validity
    threshold: float = 2.0,
) -> Tuple[jax.Array, jax.Array]:
    """LO-RANSAC triangulation (comet/utils/triangulation.py:677,776).

    For every track, hypothesize 3D points from ALL view pairs (S<=16 ->
    at most 120 pairs, evaluated as one batch), score each by the count of
    views whose reprojection error is under `threshold`, then refit the
    best hypothesis with an all-inlier-view DLT. Returns
    (points [N, 3], inlier_mask [S, N])."""
    s = proj.shape[0]
    ii, jj = jnp.triu_indices(s, k=1)

    def per_track(pts2d, m):
        xs = jax.vmap(lambda a, b: _triangulate_from_pair(proj, pts2d, a, b))(
            ii, jj
        )  # [P, 3]
        pair_valid = m[ii] * m[jj]  # hypotheses need both views visible

        def reproj_err(x):
            ph = jnp.concatenate([x, jnp.ones((1,), x.dtype)])
            pix = jnp.einsum("sij,j->si", proj, ph)
            z = pix[:, 2:]
            uv = pix[:, :2] / jnp.where(jnp.abs(z) > 1e-8, z, 1e-8)
            err = jnp.linalg.norm(uv - pts2d, axis=-1)
            # points behind a camera never count as inliers there
            return jnp.where(z[:, 0] > 0, err, jnp.inf)

        errs = jax.vmap(reproj_err)(xs)  # [P, S]
        inl = (errs < threshold) & (m > 0.5)
        scores = inl.sum(-1) * pair_valid.astype(jnp.int32)
        best = jnp.argmax(scores)
        best_mask = inl[best].astype(pts2d.dtype)
        x_refit = triangulate_multiview(proj, pts2d, best_mask)
        # keep the refit only if it does not lose inliers
        refit_inl = (reproj_err(x_refit) < threshold) & (m > 0.5)
        better = refit_inl.sum() >= scores[best]
        x_out = jnp.where(better, x_refit, xs[best])
        mask_out = jnp.where(better, refit_inl, inl[best])
        return x_out, mask_out

    pts, inl = jax.vmap(per_track, in_axes=(1, 1), out_axes=(0, 1))(
        tracks, vis.astype(tracks.dtype)
    )
    return pts, inl


def global_bundle_adjust(
    q0: jax.Array,
    t0: jax.Array,
    tracks: jax.Array,  # [S, N, 2]
    vis: jax.Array,  # [S, N]
    k: jax.Array,
    rounds: int = 2,
    ba_iters: int = 15,
    init_threshold: float = 8.0,
    filter_threshold: float = 2.0,
) -> Tuple[BAState, jax.Array, jax.Array]:
    """Scene-level iterative BA driver (the JAX replacement for the
    reference's pycolmap global_BA / iterative_global_BA,
    comet/utils/triangulation.py:1020,1076):

      RANSAC-triangulate -> LM bundle adjust -> filter observations by
      reprojection error -> re-triangulate -> repeat.

    The inlier threshold anneals geometrically from init_threshold (wide,
    tolerating initial pose error — filtering at the final threshold before
    any BA would discard most good observations) down to filter_threshold.

    Returns (state, observation inlier mask [S, N], final rms)."""
    thresholds = np.geomspace(init_threshold, filter_threshold, rounds + 1)
    proj = projection_matrices(q0, t0, k)
    points, _ = triangulate_tracks_ransac(
        proj, tracks, vis, float(thresholds[0])
    )
    q, t = q0, t0
    rms = jnp.asarray(jnp.inf, tracks.dtype)
    # the FIRST BA sees every visible observation — the Huber kernel
    # downweights outliers softly; hard pre-masking can disconnect a badly
    # initialized camera from the problem entirely
    obs_mask = vis > 0.5
    for r in range(rounds):
        state, rms = bundle_adjust(
            q, t, points, tracks, obs_mask, k, iters=ba_iters,
            huber_delta=float(thresholds[r]),
        )
        q, t, points = state.q, state.t, state.points
        pred = project_points(points, q, t, k)
        err = jnp.linalg.norm(pred - tracks, axis=-1)
        obs_mask = (err < float(thresholds[r + 1])) & (vis > 0.5)
        proj = projection_matrices(q, t, k)
        points = triangulate_tracks(proj, tracks, obs_mask.astype(tracks.dtype))
    state = BAState(q=q, t=t, points=points)
    return state, obs_mask, rms
