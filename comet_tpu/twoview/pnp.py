"""Perspective-n-Point solvers in vmapped jnp.

Parity targets: comet/two_view_geo/perspective_n_points.py:321 (efficient_pnp
— EPnP) and comet/two_view_geo/pnp.py:38,216 (conduct_pnp with focal sweep).
We use a DLT initialization + Levenberg-Marquardt polish, which at COMET's
problem sizes matches EPnP accuracy while being a single batched SVD + a
small fixed-iteration refinement loop (XLA-friendly: no per-problem control
flow, jits and vmaps over batches of PnP problems).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry.quaternions import matrix_to_quat, quat_normalize, quat_to_matrix


class PnPResult(NamedTuple):
    r: jax.Array  # [3, 3] column-vector rotation (x_cam = R x_world + t)
    t: jax.Array  # [3]
    reproj_rms: jax.Array  # []


def _dlt_pose(points3d: jax.Array, points2d_norm: jax.Array, weights=None):
    """DLT for the 3x4 pose matrix P with x ~ P X (normalized 2d coords)."""
    n = points3d.shape[0]
    xh = jnp.concatenate([points3d, jnp.ones((n, 1), points3d.dtype)], axis=-1)
    u = points2d_norm[:, 0]
    v = points2d_norm[:, 1]
    z = jnp.zeros((n, 4), points3d.dtype)
    rows_u = jnp.concatenate([xh, z, -u[:, None] * xh], axis=-1)
    rows_v = jnp.concatenate([z, xh, -v[:, None] * xh], axis=-1)
    a = jnp.concatenate([rows_u, rows_v], axis=0)  # [2N, 12]
    if weights is not None:
        w2 = jnp.concatenate([weights, weights], axis=0)
        a = a * w2[:, None]
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    p = vt[-1].reshape(3, 4)

    # extract R, t: orthogonalize the left 3x3 via SVD, fix scale/sign
    m = p[:, :3]
    scale = jnp.linalg.norm(m[2])
    p = p / jnp.where(scale > 1e-10, scale, 1.0)
    # cheirality: majority of points must have positive depth
    depths = (p[2, :3] @ points3d.T) + p[2, 3]
    sign = jnp.sign(jnp.sum(jnp.sign(depths)) + 0.5)
    p = p * sign
    u_m, _, vt_m = jnp.linalg.svd(p[:, :3])
    r = u_m @ vt_m
    r = r * jnp.sign(jnp.linalg.det(r))
    t = p[:, 3]
    return r, t


def _project_norm(points3d, r, t):
    cam = jnp.einsum("ij,nj->ni", r, points3d) + t
    return cam[:, :2] / jnp.maximum(jnp.abs(cam[:, 2:]), 1e-8) * jnp.sign(cam[:, 2:])


def solve_pnp(
    points3d: jax.Array,  # [N, 3]
    points2d: jax.Array,  # [N, 2] pixels
    k: jax.Array,  # [3, 3]
    weights: jax.Array = None,  # [N] optional
    lm_iters: int = 10,
) -> PnPResult:
    """DLT + quaternion-parameterized LM polish."""
    n = points3d.shape[0]
    kinv = jnp.linalg.inv(k)
    pn = (
        jnp.concatenate([points2d, jnp.ones((n, 1), points2d.dtype)], -1) @ kinv.T
    )[:, :2]
    w = weights if weights is not None else jnp.ones((n,), points3d.dtype)

    r0, t0 = _dlt_pose(points3d, pn, w)
    q0 = matrix_to_quat(r0)
    x0 = jnp.concatenate([q0, t0])

    def residual(x):
        q = quat_normalize(x[:4])
        t = x[4:]
        pred = _project_norm(points3d, quat_to_matrix(q), t)
        return ((pred - pn) * w[:, None]).reshape(-1)

    def lm_step(carry, _):
        x, lam = carry
        r = residual(x)
        jac = jax.jacfwd(residual)(x)
        jtj = jac.T @ jac
        a = jtj + lam * jnp.diag(jnp.maximum(jnp.diag(jtj), 1e-10))
        delta = jnp.linalg.solve(a, -(jac.T @ r))
        x_new = x + delta
        better = jnp.sum(residual(x_new) ** 2) < jnp.sum(r**2)
        return (jnp.where(better, x_new, x), jnp.where(better, lam * 0.5, lam * 4.0)), None

    (x, _), _ = jax.lax.scan(lm_step, (x0, jnp.asarray(1e-3, x0.dtype)), None, length=lm_iters)
    q = quat_normalize(x[:4])
    t = x[4:]
    r = quat_to_matrix(q)
    rms = jnp.sqrt(jnp.mean(jnp.sum((_project_norm(points3d, r, t) - pn) ** 2, -1)))
    return PnPResult(r=r, t=t, reproj_rms=rms)


solve_pnp_batched = jax.vmap(solve_pnp, in_axes=(0, 0, None))


def solve_pnp_focal_sweep(
    points3d: jax.Array,
    points2d: jax.Array,
    pp: jax.Array,  # [2] principal point
    focal_candidates: jax.Array,  # [F]
) -> Tuple[PnPResult, jax.Array]:
    """Unknown-focal PnP: sweep candidate focal lengths, pick the lowest
    reprojection RMS (two_view_geo/pnp.py:216 capability)."""

    def for_focal(f):
        k = jnp.asarray(
            [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 0.0]]
        ) * f + jnp.asarray(
            [[0.0, 0.0, pp[0]], [0.0, 0.0, pp[1]], [0.0, 0.0, 1.0]]
        )
        return solve_pnp(points3d, points2d, k)

    results = jax.vmap(for_focal)(focal_candidates)
    best = jnp.argmin(results.reproj_rms)
    picked = jax.tree_util.tree_map(lambda a: a[best], results)
    return picked, focal_candidates[best]
