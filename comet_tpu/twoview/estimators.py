"""Batched two-view geometry estimators as vmapped XLA linear algebra.

TPU-native equivalents of the reference's GPU-RANSAC side stack
(comet/two_view_geo/: fundamental.py:43,254,341, essential.py:111,203,
homography.py:53,112, utils.py:90-415). Everything is fixed-shape: RANSAC
draws a static number of hypotheses, solves them batched via jnp.linalg
(SVD/eig batched on device), scores all hypotheses against all points in one
einsum, and picks the argmax — no data-dependent control flow, so the whole
estimator jits.

Conventions: points are [N, 2] pixel/normalized coords; epipolar maps act as
x2^T F x1 = 0 (x1 in image 1, x2 in image 2).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


def to_homogeneous(pts: jax.Array) -> jax.Array:
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def normalize_points(pts: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Hartley normalization: zero-mean, sqrt(2) RMS distance.

    Returns (normalized points, 3x3 transform T with x_norm = T @ x_h).
    """
    mean = pts.mean(axis=-2, keepdims=True)
    d = jnp.linalg.norm(pts - mean, axis=-1).mean(axis=-1)
    scale = jnp.sqrt(2.0) / jnp.maximum(d, 1e-8)
    t = jnp.zeros((*pts.shape[:-2], 3, 3))
    t = t.at[..., 0, 0].set(scale)
    t = t.at[..., 1, 1].set(scale)
    t = t.at[..., 0, 2].set(-scale * mean[..., 0, 0])
    t = t.at[..., 1, 2].set(-scale * mean[..., 0, 1])
    t = t.at[..., 2, 2].set(1.0)
    normed = (pts - mean) * scale[..., None, None]
    return normed, t


def sampson_distance(f: jax.Array, pts1: jax.Array, pts2: jax.Array) -> jax.Array:
    """First-order epipolar distance (two_view_geo/utils.py:90)."""
    x1 = to_homogeneous(pts1)  # [N, 3]
    x2 = to_homogeneous(pts2)
    fx1 = jnp.einsum("ij,nj->ni", f, x1)
    ftx2 = jnp.einsum("ji,nj->ni", f, x2)
    num = jnp.einsum("ni,ni->n", x2, fx1) ** 2
    den = fx1[:, 0] ** 2 + fx1[:, 1] ** 2 + ftx2[:, 0] ** 2 + ftx2[:, 1] ** 2
    return num / jnp.maximum(den, 1e-10)


def run_8point(pts1: jax.Array, pts2: jax.Array, weights=None) -> jax.Array:
    """Normalized 8-point fundamental solve (fundamental.py:341).

    pts1/pts2: [N>=8, 2] -> F [3, 3] with rank-2 constraint enforced.
    """
    n1, t1 = normalize_points(pts1)
    n2, t2 = normalize_points(pts2)
    x1, y1 = n1[:, 0], n1[:, 1]
    x2, y2 = n2[:, 0], n2[:, 1]
    ones = jnp.ones_like(x1)
    a = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )  # [N, 9]
    if weights is not None:
        a = a * weights[:, None]
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    f = vt[-1].reshape(3, 3)
    # enforce rank 2
    u, s, vt2 = jnp.linalg.svd(f)
    f = (u * s.at[2].set(0.0)[None, :]) @ vt2
    f = t2.T @ f @ t1
    return f / jnp.where(jnp.abs(f[2, 2]) > 1e-8, f[2, 2], 1.0)


def run_7point(pts1: jax.Array, pts2: jax.Array) -> jax.Array:
    """7-point fundamental solve (fundamental.py:254) -> up to 3 solutions.

    pts1/pts2: [7, 2]; returns [3, 3, 3] (invalid roots filled with the
    first real solution).
    """
    x1h = to_homogeneous(pts1)
    x2h = to_homogeneous(pts2)
    a = jnp.einsum("ni,nj->nij", x2h, x1h).reshape(7, 9)
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    f1 = vt[-1].reshape(3, 3)
    f2 = vt[-2].reshape(3, 3)

    # det(a*F1 + (1-a)*F2) = 0 -> cubic in a
    def det3(m):
        return jnp.linalg.det(m)

    # evaluate cubic coefficients by interpolation at 4 points
    ts = jnp.asarray([0.0, 1.0, 2.0, 3.0])
    vals = jnp.stack([det3(t * f1 + (1 - t) * f2) for t in ts])
    # Vandermonde solve for coefficients of c3 t^3 + c2 t^2 + c1 t + c0
    vander = jnp.stack([ts**3, ts**2, ts, jnp.ones_like(ts)], axis=-1)
    coeffs = jnp.linalg.solve(vander, vals)
    roots = jnp.roots(coeffs, strip_zeros=False)  # complex, len 3
    real = jnp.where(jnp.abs(roots.imag) < 1e-6, roots.real, roots.real[0])
    fs = jnp.stack([t * f1 + (1 - t) * f2 for t in real])
    return fs


def essential_from_fundamental(f: jax.Array, k1: jax.Array, k2: jax.Array) -> jax.Array:
    """E = K2^T F K1 with the (1,1,0) singular-value constraint
    (essential.py:36-108 equivalent)."""
    e = k2.T @ f @ k1
    u, s, vt = jnp.linalg.svd(e)
    s_fixed = jnp.asarray([1.0, 1.0, 0.0]) * (s[0] + s[1]) / 2.0
    return (u * s_fixed[None, :]) @ vt


def decompose_essential(e: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """E -> 4 candidate (R, t) pairs (essential.py decomposition)."""
    u, _, vt = jnp.linalg.svd(e)
    # ensure proper rotations
    u = u * jnp.sign(jnp.linalg.det(u))
    vt = vt * jnp.sign(jnp.linalg.det(vt))
    w = jnp.asarray([[0.0, -1, 0], [1, 0, 0], [0, 0, 1]])
    r1 = u @ w @ vt
    r2 = u @ w.T @ vt
    t = u[:, 2]
    rs = jnp.stack([r1, r1, r2, r2])
    ts = jnp.stack([t, -t, t, -t])
    return rs, ts


def triangulate_point(
    p1: jax.Array, p2: jax.Array, x1: jax.Array, x2: jax.Array
) -> jax.Array:
    """DLT triangulation of one point from two 3x4 projections."""
    a = jnp.stack(
        [
            x1[0] * p1[2] - p1[0],
            x1[1] * p1[2] - p1[1],
            x2[0] * p2[2] - p2[0],
            x2[1] * p2[2] - p2[1],
        ]
    )
    _, _, vt = jnp.linalg.svd(a)
    x = vt[-1]
    return x[:3] / jnp.where(jnp.abs(x[3]) > 1e-10, x[3], 1e-10)


triangulate_points = jax.vmap(triangulate_point, in_axes=(None, None, 0, 0))


def cheirality_count(
    r: jax.Array, t: jax.Array, pts1: jax.Array, pts2: jax.Array
) -> jax.Array:
    """Number of points in front of both cameras for a candidate (R, t)
    (two_view_geo/utils.py cheirality check)."""
    p1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], axis=1)
    p2 = jnp.concatenate([r, t[:, None]], axis=1)
    x = triangulate_points(p1, p2, pts1, pts2)  # [N, 3]
    z1 = x[:, 2]
    z2 = (jnp.einsum("ij,nj->ni", r, x) + t)[:, 2]
    return jnp.sum((z1 > 0) & (z2 > 0))


def motion_from_essential(
    e: jax.Array, pts1: jax.Array, pts2: jax.Array
) -> Tuple[jax.Array, jax.Array]:
    """Pick the (R, t) candidate with best cheirality."""
    rs, ts = decompose_essential(e)
    counts = jax.vmap(lambda r, t: cheirality_count(r, t, pts1, pts2))(rs, ts)
    best = jnp.argmax(counts)
    return rs[best], ts[best]


def run_homography_dlt(pts1: jax.Array, pts2: jax.Array, weights=None) -> jax.Array:
    """Normalized DLT homography (homography.py:112)."""
    n1, t1 = normalize_points(pts1)
    n2, t2 = normalize_points(pts2)
    x1, y1 = n1[:, 0], n1[:, 1]
    x2, y2 = n2[:, 0], n2[:, 1]
    o = jnp.ones_like(x1)
    z = jnp.zeros_like(x1)
    ax = jnp.stack([-x1, -y1, -o, z, z, z, x2 * x1, x2 * y1, x2], axis=-1)
    ay = jnp.stack([z, z, z, -x1, -y1, -o, y2 * x1, y2 * y1, y2], axis=-1)
    a = jnp.concatenate([ax, ay], axis=0)
    if weights is not None:
        w2 = jnp.concatenate([weights, weights], axis=0)
        a = a * w2[:, None]
    _, _, vt = jnp.linalg.svd(a, full_matrices=True)
    h = vt[-1].reshape(3, 3)
    h = jnp.linalg.inv(t2) @ h @ t1
    return h / jnp.where(jnp.abs(h[2, 2]) > 1e-8, h[2, 2], 1.0)


def homography_transfer_error(h: jax.Array, pts1: jax.Array, pts2: jax.Array) -> jax.Array:
    x1 = to_homogeneous(pts1)
    proj = jnp.einsum("ij,nj->ni", h, x1)
    proj = proj[:, :2] / jnp.maximum(jnp.abs(proj[:, 2:]), 1e-8) * jnp.sign(proj[:, 2:])
    return jnp.sum((proj - pts2) ** 2, axis=-1)


class RansacResult(NamedTuple):
    model: jax.Array  # best model matrix
    inliers: jax.Array  # [N] bool
    score: jax.Array  # inlier count


def _ransac(
    solver,
    scorer,
    sample_size: int,
    pts1: jax.Array,
    pts2: jax.Array,
    key: jax.Array,
    threshold: float,
    num_hypotheses: int = 128,
) -> RansacResult:
    n = pts1.shape[0]
    keys = jax.random.split(key, num_hypotheses)

    def hypothesis(k):
        idx = jax.random.choice(k, n, (sample_size,), replace=False)
        return solver(pts1[idx], pts2[idx])

    models = jax.vmap(hypothesis)(keys)  # [H, 3, 3] (or [H, 3, 3, 3] for 7pt)
    if models.ndim == 4:  # multi-solution solvers: flatten candidates
        models = models.reshape(-1, 3, 3)
    errs = jax.vmap(lambda m: scorer(m, pts1, pts2))(models)  # [H, N]
    inliers = errs < threshold
    scores = inliers.sum(axis=-1)
    best = jnp.argmax(scores)
    return RansacResult(model=models[best], inliers=inliers[best], score=scores[best])


def estimate_fundamental_ransac(
    pts1, pts2, key=None, threshold=1.0, num_hypotheses=128, sample_size=8
) -> RansacResult:
    """Batched-hypothesis RANSAC 8-point fundamental (fundamental.py:43).

    Includes a final weighted least-squares refit on the inliers (the
    reference's local-optimization step, utils.py:325)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    res = _ransac(
        run_8point, sampson_distance, sample_size, pts1, pts2, key,
        threshold, num_hypotheses,
    )
    f_refit = run_8point(pts1, pts2, weights=res.inliers.astype(pts1.dtype))
    errs = sampson_distance(f_refit, pts1, pts2)
    inl = errs < threshold
    better = inl.sum() >= res.score
    return RansacResult(
        model=jnp.where(better, f_refit, res.model),
        inliers=jnp.where(better, inl, res.inliers),
        score=jnp.maximum(inl.sum(), res.score),
    )


def estimate_homography_ransac(
    pts1, pts2, key=None, threshold=3.0, num_hypotheses=128
) -> RansacResult:
    key = key if key is not None else jax.random.PRNGKey(0)
    res = _ransac(
        run_homography_dlt, homography_transfer_error, 4, pts1, pts2, key,
        threshold, num_hypotheses,
    )
    h_refit = run_homography_dlt(pts1, pts2, weights=res.inliers.astype(pts1.dtype))
    errs = homography_transfer_error(h_refit, pts1, pts2)
    inl = errs < threshold
    better = inl.sum() >= res.score
    return RansacResult(
        model=jnp.where(better, h_refit, res.model),
        inliers=jnp.where(better, inl, res.inliers),
        score=jnp.maximum(inl.sum(), res.score),
    )


def estimate_essential_ransac(
    pts1, pts2, k1, k2, key=None, threshold=1e-3, num_hypotheses=128
) -> Tuple[RansacResult, jax.Array, jax.Array]:
    """Essential matrix via normalized-coordinate 8-point RANSAC + cheirality
    motion extraction (essential.py:111,203 capability; the Nistér 5-point
    polynomial solver is traded for the SVD-friendly 8-point in normalized
    coords, which XLA batches far better)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    k1i = jnp.linalg.inv(k1)
    k2i = jnp.linalg.inv(k2)
    n1 = (to_homogeneous(pts1) @ k1i.T)[:, :2]
    n2 = (to_homogeneous(pts2) @ k2i.T)[:, :2]
    res = _ransac(run_8point, sampson_distance, 8, n1, n2, key, threshold, num_hypotheses)
    # LO step (utils.py:325 capability, same as the fundamental path): an
    # 8-point minimal-sample model is noise-limited — refit on the full
    # inlier set before the essential projection (without this, 0.4 px of
    # pixel noise cost tens of degrees of translation direction)
    e_refit = run_8point(n1, n2, weights=res.inliers.astype(n1.dtype))
    errs = sampson_distance(e_refit, n1, n2)
    inl = errs < threshold
    better = inl.sum() >= res.score
    res = RansacResult(
        model=jnp.where(better, e_refit, res.model),
        inliers=jnp.where(better, inl, res.inliers),
        score=jnp.maximum(inl.sum(), res.score),
    )
    u, s, vt = jnp.linalg.svd(res.model)
    e = (u * jnp.asarray([1.0, 1.0, 0.0])[None, :]) @ vt
    r, t = motion_from_essential(e, n1, n2)
    return RansacResult(model=e, inliers=res.inliers, score=res.score), r, t
