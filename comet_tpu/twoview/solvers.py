"""Minimal-solver zoo: 5-point essential, EPnP, homography decomposition.

Capability parity targets (different algorithms, chosen for XLA):
- run_5point / estimate_essential_5point_ransac — the Nistér 5-point solver
  (comet/two_view_geo/essential.py:111,203). The 10x20 polynomial
  constraint system is built NUMERICALLY by evaluation-interpolation (the
  20 cubic-monomial coefficients of each constraint are recovered by
  evaluating det(E)=0 and 2EEᵀE−tr(EEᵀ)E=0 at 20 fixed generic points and
  solving against a precomputed Vandermonde inverse), avoiding the usual
  page of hand-expanded symbolic coefficients. Solutions come from the
  Stewénius action matrix: eigenvalues via a fixed-iteration shifted-QR,
  eigenvectors via smallest-singular-vector — bogus candidates from
  complex eigenpairs are filtered by the downstream Sampson scoring.
- efficient_pnp — EPnP with the N=1/2/3 beta cases + Procrustes
  (comet/two_view_geo/perspective_n_points.py:321).
- decompose_homography — H -> 4 (R, t, n) candidates + cheirality pick
  (comet/two_view_geo/homography.py:246; we use the SVD-based
  Faugeras–Lustman construction instead of the reference's Malis
  analytic minors).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .estimators import (
    RansacResult,
    cheirality_count,
    sampson_distance,
    to_homogeneous,
)

# ---------------------------------------------------------------------------
# 5-point essential (Nistér / Stewénius)
# ---------------------------------------------------------------------------

# cubic monomial basis in (x, y, z): 10 degree-3 monomials first, then the
# 10 lower-degree ones that form the quotient-ring basis
_DEG3 = [
    (3, 0, 0), (2, 1, 0), (2, 0, 1), (1, 2, 0), (1, 1, 1),
    (1, 0, 2), (0, 3, 0), (0, 2, 1), (0, 1, 2), (0, 0, 3),
]
_BASIS = [
    (2, 0, 0), (1, 1, 0), (0, 2, 0), (1, 0, 1), (0, 1, 1),
    (0, 0, 2), (1, 0, 0), (0, 1, 0), (0, 0, 1), (0, 0, 0),
]
_MONOS = _DEG3 + _BASIS


def _vandermonde_inv() -> np.ndarray:
    """Precompute inv(V)ᵀ for the 20 evaluation points (host, float64)."""
    rng = np.random.default_rng(12345)
    pts = rng.normal(size=(20, 3))
    v = np.stack(
        [
            np.prod(pts ** np.asarray(m, np.float64), axis=1)
            for m in _MONOS
        ],
        axis=1,
    )  # [20 pts, 20 monos]
    return np.linalg.inv(v).T.astype(np.float64), pts.astype(np.float64)


_VINV_T, _EVAL_PTS = _vandermonde_inv()


def _constraints_at(basis: jax.Array, p: jax.Array) -> jax.Array:
    """Evaluate the 10 cubic constraints at (x, y, z) = p.

    basis: [4, 3, 3] nullspace matrices (X, Y, Z, W)."""
    x, y, z = p[0], p[1], p[2]
    e = x * basis[0] + y * basis[1] + z * basis[2] + basis[3]
    det = jnp.linalg.det(e)
    eet = e @ e.T
    trace = jnp.trace(eet)
    g = 2.0 * (eet @ e) - trace * e
    return jnp.concatenate([det[None], g.reshape(9)])


def _action_matrix(basis: jax.Array) -> jax.Array:
    """Stewénius 10x10 action matrix for multiplication by x."""
    dt = basis.dtype
    pts = jnp.asarray(_EVAL_PTS, dt)
    g = jax.vmap(lambda p: _constraints_at(basis, p))(pts)  # [20 pts, 10]
    c = g.T @ jnp.asarray(_VINV_T, dt)  # [10 constraints, 20 monos]

    a = c[:, :10]  # degree-3 block
    b = c[:, 10:]  # basis block
    m = -jnp.linalg.solve(a, b)  # deg3_i = m[i] · basis

    # multiplication by x maps basis monomials:
    #   x*x²=x³(0)  x*xy=x²y(1)  x*y²=xy²(3)  x*xz=x²z(2)  x*yz=xyz(4)
    #   x*z²=xz²(5) x*x=x²(b0)   x*y=xy(b1)   x*z=xz(b3)   x*1=x(b6)
    rows = [m[0], m[1], m[3], m[2], m[4], m[5]]
    e = jnp.eye(10, dtype=dt)
    rows += [e[0], e[1], e[3], e[6]]
    return jnp.stack(rows)


def _qr_eigvals(t: jax.Array, iters: int = 120) -> jax.Array:
    """Real-eigenvalue candidates of a nonsymmetric matrix via shifted QR.

    Complex pairs don't converge; their diagonal entries are returned too
    and must be filtered by downstream scoring."""
    n = t.shape[0]
    eye = jnp.eye(n, dtype=t.dtype)

    def body(tk, _):
        mu = tk[n - 1, n - 1]
        q, r = jnp.linalg.qr(tk - mu * eye)
        return r @ q + mu * eye, None

    tk, _ = jax.lax.scan(body, t, None, length=iters)
    return jnp.diagonal(tk)


def run_5point(pts1: jax.Array, pts2: jax.Array) -> jax.Array:
    """5-point essential solver on normalized image coords.

    pts1, pts2: [5, 2] -> [10, 3, 3] candidate essential matrices (padded
    with scaled duplicates for non-real solutions; score downstream).
    """
    x1 = to_homogeneous(pts1)
    x2 = to_homogeneous(pts2)
    # rows: x2ᵀ E x1 = 0 with E row-major
    q = jnp.einsum("ni,nj->nij", x2, x1).reshape(-1, 9)  # [5, 9]
    _, _, vt = jnp.linalg.svd(q, full_matrices=True)
    basis = vt[5:9].reshape(4, 3, 3)  # X, Y, Z, W (W = smallest SV)

    t = _action_matrix(basis)
    xs = _qr_eigvals(t)  # [10] candidate x values

    grad_constraints = jax.jacfwd(_constraints_at, argnums=1)

    def polish(p):
        # Gauss-Newton on the 10 constraint polynomials: rescues float32
        # round-off in the action matrix AND crude shifted-QR eigenvalues
        # (complex-pair candidates either converge to a real solution or
        # diverge and get scored out downstream)
        def gn(_, p):
            g = _constraints_at(basis, p)
            j = grad_constraints(basis, p)  # [10, 3]
            jtj = j.T @ j + 1e-8 * jnp.eye(3, dtype=p.dtype)
            return p - jnp.linalg.solve(jtj, j.T @ g)

        return jax.lax.fori_loop(0, 10, gn, p)

    def solution(xv):
        # eigenvector of (T - x I): smallest right singular vector
        _, _, vt_ = jnp.linalg.svd(t - xv * jnp.eye(10, dtype=t.dtype))
        v = vt_[-1]
        denom = jnp.where(jnp.abs(v[9]) > 1e-12, v[9], 1e-12)
        p = jnp.stack([v[6] / denom, v[7] / denom, v[8] / denom])
        p = polish(p)
        e = p[0] * basis[0] + p[1] * basis[1] + p[2] * basis[2] + basis[3]
        norm = jnp.linalg.norm(e)
        return e / jnp.where(norm > 1e-12, norm, 1.0)

    return jax.vmap(solution)(xs)


def estimate_essential_5point_ransac(
    pts1: jax.Array,
    pts2: jax.Array,
    k1: jax.Array,
    k2: jax.Array,
    key: jax.Array = None,
    threshold: float = 1e-3,
    num_hypotheses: int = 64,
) -> Tuple[RansacResult, jax.Array, jax.Array]:
    """Nistér 5-point RANSAC on normalized coordinates
    (essential.py:111,203 capability). Returns (result, R, t)."""
    key = key if key is not None else jax.random.PRNGKey(0)
    n1 = (to_homogeneous(pts1) @ jnp.linalg.inv(k1).T)[:, :2]
    n2 = (to_homogeneous(pts2) @ jnp.linalg.inv(k2).T)[:, :2]
    n = n1.shape[0]
    keys = jax.random.split(key, num_hypotheses)

    def hypothesis(k):
        idx = jax.random.choice(k, n, (5,), replace=False)
        return run_5point(n1[idx], n2[idx])  # [10, 3, 3]

    models = jax.vmap(hypothesis)(keys).reshape(-1, 3, 3)
    errs = jax.vmap(lambda m: sampson_distance(m, n1, n2))(models)
    inliers = errs < threshold
    scores = inliers.sum(axis=-1)
    best = jnp.argmax(scores)
    e = models[best]
    best_inl = inliers[best]
    best_score = scores[best]

    # local optimization: inlier-weighted 8-point refit projected onto the
    # essential manifold (the reference's LO step, two_view_geo/utils.py:325)
    from .estimators import motion_from_essential, run_8point

    f_refit = run_8point(n1, n2, weights=best_inl.astype(n1.dtype))
    u, _, vt = jnp.linalg.svd(f_refit)
    e_refit = (u * jnp.asarray([1.0, 1.0, 0.0], u.dtype)[None, :]) @ vt
    errs_r = sampson_distance(e_refit, n1, n2)
    inl_r = errs_r < threshold
    better = inl_r.sum() >= best_score
    e = jnp.where(better, e_refit, e)
    best_inl = jnp.where(better, inl_r, best_inl)
    best_score = jnp.maximum(inl_r.sum(), best_score)

    r, t = motion_from_essential(e, n1, n2)
    return (
        RansacResult(model=e, inliers=best_inl, score=best_score),
        r,
        t,
    )


# ---------------------------------------------------------------------------
# EPnP
# ---------------------------------------------------------------------------


class PnPSolution(NamedTuple):
    r: jax.Array  # [3, 3]
    t: jax.Array  # [3]
    err: jax.Array  # mean squared reprojection error (normalized coords)


def _control_points(points3d: jax.Array, weights: jax.Array) -> jax.Array:
    """4 control points: weighted centroid + principal directions."""
    wsum = jnp.maximum(weights.sum(), 1e-8)
    c0 = (points3d * weights[:, None]).sum(0) / wsum
    centered = (points3d - c0) * jnp.sqrt(weights)[:, None]
    _, s, vt = jnp.linalg.svd(centered, full_matrices=False)
    scale = s / jnp.sqrt(wsum)
    dirs = vt * jnp.maximum(scale, 1e-6)[:, None]  # [3, 3]
    return jnp.concatenate([c0[None], c0[None] + dirs], axis=0)  # [4, 3]


def _barycentric(points3d: jax.Array, ctrl: jax.Array) -> jax.Array:
    """alphas [N, 4] with X_i = Σ_j a_ij C_j, Σ_j a_ij = 1."""
    d = (ctrl[1:] - ctrl[0]).T  # [3, 3]
    rel = jnp.linalg.solve(d, (points3d - ctrl[0]).T).T  # [N, 3]
    a0 = 1.0 - rel.sum(-1, keepdims=True)
    return jnp.concatenate([a0, rel], axis=-1)


def _pairwise_dist(ctrl: jax.Array) -> jax.Array:
    i, j = jnp.triu_indices(4, k=1)
    return jnp.linalg.norm(ctrl[i] - ctrl[j], axis=-1)


def _pose_from_ctrl_cam(
    ctrl_w: jax.Array, ctrl_c: jax.Array, alphas: jax.Array,
    points3d: jax.Array, points2d: jax.Array, weights: jax.Array,
) -> PnPSolution:
    """Procrustes world->camera from control points; flips sign if the
    camera-frame cloud lands behind the camera."""
    from .align import corresponding_points_alignment

    # depth positivity: EPnP nullspace vectors have arbitrary sign
    pc = alphas @ ctrl_c  # [N, 3] camera-frame points
    sign = jnp.sign(jnp.sum(pc[:, 2] * weights))
    ctrl_c = ctrl_c * jnp.where(sign == 0, 1.0, sign)

    # row convention: ctrl_c ≈ ctrl_w @ R_row + t  ->  Xc = R_rowᵀ Xw + t
    sim = corresponding_points_alignment(ctrl_w, ctrl_c, estimate_scale=False)
    r = sim.r.T  # column convention
    t = sim.t
    proj = points3d @ sim.r + sim.t
    uv = proj[:, :2] / jnp.maximum(proj[:, 2:], 1e-8)
    err = ((uv - points2d) ** 2).sum(-1)
    werr = (err * weights).sum() / jnp.maximum(weights.sum(), 1e-8)
    return PnPSolution(r=r, t=t, err=werr)


def efficient_pnp(
    points3d: jax.Array,  # [N, 3] world points
    points2d: jax.Array,  # [N, 2] NORMALIZED image coords (K already removed)
    weights: jax.Array = None,
) -> PnPSolution:
    """EPnP (perspective_n_points.py:321): control-point parameterization,
    nullspace beta cases N=1/2/3, Procrustes; best case by reprojection."""
    n = points3d.shape[0]
    weights = jnp.ones((n,), points3d.dtype) if weights is None else weights

    ctrl_w = _control_points(points3d, weights)
    alphas = _barycentric(points3d, ctrl_w)  # [N, 4]

    u, v = points2d[:, 0], points2d[:, 1]
    # M rows (normalized intrinsics: fx=fy=1, cx=cy=0)
    zeros = jnp.zeros_like(alphas)
    rx = jnp.stack([alphas, zeros, -alphas * u[:, None]], axis=-1)  # [N,4,3]
    ry = jnp.stack([zeros, alphas, -alphas * v[:, None]], axis=-1)
    m = jnp.concatenate([rx, ry], axis=0).reshape(2 * n, 12)
    mw = m * jnp.sqrt(jnp.concatenate([weights, weights]))[:, None]

    _, _, vt = jnp.linalg.svd(mw, full_matrices=False)
    nullv = vt[-4:][::-1].reshape(4, 4, 3)  # v1 (smallest SV) first

    dist_w = _pairwise_dist(ctrl_w)  # [6]
    i, j = jnp.triu_indices(4, k=1)

    def case1():
        dv = nullv[0, i] - nullv[0, j]  # [6, 3]
        dd = jnp.linalg.norm(dv, axis=-1)
        beta = (dd * dist_w).sum() / jnp.maximum((dd * dd).sum(), 1e-12)
        return beta * nullv[0]

    def case2():
        dv1 = nullv[0, i] - nullv[0, j]
        dv2 = nullv[1, i] - nullv[1, j]
        # ||b1 dv1 + b2 dv2||² = d² -> unknowns (b1², b1b2, b2²)
        a = jnp.stack(
            [
                (dv1 * dv1).sum(-1),
                2 * (dv1 * dv2).sum(-1),
                (dv2 * dv2).sum(-1),
            ],
            axis=-1,
        )  # [6, 3]
        sol = jnp.linalg.lstsq(a, dist_w**2)[0]
        b1 = jnp.sqrt(jnp.abs(sol[0]))
        b2 = jnp.sqrt(jnp.abs(sol[2])) * jnp.sign(sol[1]) * jnp.sign(sol[0])
        return b1 * nullv[0] + b2 * nullv[1]

    def case3():
        dv = [nullv[k, i] - nullv[k, j] for k in range(3)]
        # unknowns (b1², b1b2, b2², b1b3, b2b3, b3²)
        a = jnp.stack(
            [
                (dv[0] * dv[0]).sum(-1),
                2 * (dv[0] * dv[1]).sum(-1),
                (dv[1] * dv[1]).sum(-1),
                2 * (dv[0] * dv[2]).sum(-1),
                2 * (dv[1] * dv[2]).sum(-1),
                (dv[2] * dv[2]).sum(-1),
            ],
            axis=-1,
        )  # [6, 6]
        sol = jnp.linalg.lstsq(a, dist_w**2)[0]
        b1 = jnp.sqrt(jnp.abs(sol[0]))
        b2 = jnp.sqrt(jnp.abs(sol[2])) * jnp.sign(sol[1]) * jnp.sign(sol[0])
        b3 = jnp.sqrt(jnp.abs(sol[5])) * jnp.sign(sol[3]) * jnp.sign(sol[0])
        return b1 * nullv[0] + b2 * nullv[1] + b3 * nullv[2]

    sols = [
        _pose_from_ctrl_cam(
            ctrl_w, ctrl_c, alphas, points3d, points2d, weights
        )
        for ctrl_c in (case1(), case2(), case3())
    ]
    errs = jnp.stack([s.err for s in sols])
    best = jnp.argmin(errs)
    rs = jnp.stack([s.r for s in sols])
    ts = jnp.stack([s.t for s in sols])
    return PnPSolution(r=rs[best], t=ts[best], err=errs[best])


# ---------------------------------------------------------------------------
# homography decomposition
# ---------------------------------------------------------------------------


def decompose_homography(
    h: jax.Array, k1: jax.Array, k2: jax.Array
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """H -> 4 candidate (R [4,3,3], t [4,3], n [4,3]) via the SVD
    (Faugeras–Lustman) construction (homography.py:246 capability).

    t is scaled by the inverse plane distance (standard homography scale
    ambiguity); use select_homography_motion for the cheirality pick.
    """
    hn = jnp.linalg.inv(k2) @ h @ k1
    _, s, _ = jnp.linalg.svd(hn)
    hn = hn / s[1]
    hn = hn * jnp.sign(jnp.linalg.det(hn))

    _, s2, vt = jnp.linalg.svd(hn.T @ hn)
    v = vt.T
    s1sq, s3sq = s2[0], s2[2]
    denom = jnp.sqrt(jnp.maximum(s1sq - s3sq, 1e-12))
    a = jnp.sqrt(jnp.maximum(1.0 - s3sq, 0.0)) / denom
    b = jnp.sqrt(jnp.maximum(s1sq - 1.0, 0.0)) / denom
    v1, v2, v3 = v[:, 0], v[:, 1], v[:, 2]
    u1 = a * v1 + b * v3
    u2 = a * v1 - b * v3

    def motion(u):
        w = jnp.stack([v2, u, jnp.cross(v2, u)], axis=1)
        hu = jnp.stack(
            [hn @ v2, hn @ u, jnp.cross(hn @ v2, hn @ u)], axis=1
        )
        r = hu @ w.T
        nvec = jnp.cross(v2, u)
        t = (hn - r) @ nvec
        return r, t, nvec

    r1, t1, n1 = motion(u1)
    r2, t2, n2 = motion(u2)
    rs = jnp.stack([r1, r1, r2, r2])
    ts = jnp.stack([t1, -t1, t2, -t2])
    ns = jnp.stack([n1, -n1, n2, -n2])
    return rs, ts, ns


def select_homography_motion(
    rs: jax.Array, ts: jax.Array, ns: jax.Array,
    pts1_norm: jax.Array, pts2_norm: jax.Array,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Pick the (R, t, n) candidate with the best cheirality count."""
    counts = jax.vmap(
        lambda r, t: cheirality_count(r, t, pts1_norm, pts2_norm)
    )(rs, ts)
    best = jnp.argmax(counts)
    return rs[best], ts[best], ns[best]
