"""Synthetic-geometry tests for the minimal solvers (5-point, EPnP,
homography decomposition) — each must recover a known (R, t | n) from
clean correspondences and survive outliers where RANSAC applies.

Capability parity: comet/two_view_geo/essential.py:111,203 (Nistér),
perspective_n_points.py:321 (EPnP), homography.py:246 (decomposition).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from scipy.spatial.transform import Rotation

from comet_tpu.twoview.solvers import (
    decompose_homography,
    efficient_pnp,
    estimate_essential_5point_ransac,
    run_5point,
    select_homography_motion,
)


def _scene(rng, n, r_deg=12.0):
    axis = rng.normal(size=3)
    axis /= np.linalg.norm(axis)
    rot = Rotation.from_rotvec(np.deg2rad(r_deg) * axis).as_matrix()
    t = rng.normal(size=3)
    t = t / np.linalg.norm(t) * 0.5
    pts3d = rng.uniform(-1, 1, size=(n, 3))
    pts3d[:, 2] += 4.0
    x1 = pts3d[:, :2] / pts3d[:, 2:]
    pc = pts3d @ rot.T + t
    x2 = pc[:, :2] / pc[:, 2:]
    return rot.astype(np.float32), t.astype(np.float32), pts3d.astype(np.float32), x1.astype(np.float32), x2.astype(np.float32)


def _rot_err_deg(r1, r2):
    cos = (np.trace(np.asarray(r1).T @ np.asarray(r2)) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


def _t_dir_err_deg(t1, t2):
    t1 = np.asarray(t1) / np.linalg.norm(t1)
    t2 = np.asarray(t2) / np.linalg.norm(t2)
    return np.degrees(np.arccos(np.clip(abs(t1 @ t2), -1, 1)))


@pytest.mark.slow  # QR-iteration RANSAC, ~20 s
class TestFivePoint:
    def test_minimal_recovers_essential(self, rng):
        rot, t, _, x1, x2 = _scene(rng, 5)
        cands = np.asarray(run_5point(jnp.asarray(x1), jnp.asarray(x2)))
        # true E (row-major convention x2ᵀ E x1 = 0)
        tx = np.array([
            [0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]
        ])
        e_true = tx @ rot
        e_true = e_true / np.linalg.norm(e_true)
        # at least one candidate matches up to sign
        errs = [
            min(np.linalg.norm(c - e_true), np.linalg.norm(c + e_true))
            for c in cands
        ]
        assert min(errs) < 5e-3, min(errs)

    def test_ransac_with_outliers(self, rng):
        rot, t, _, x1, x2 = _scene(rng, 100)
        # 25% outliers
        n_out = 25
        x2 = x2.copy()
        x2[:n_out] += rng.uniform(0.1, 0.4, size=(n_out, 2)).astype(np.float32)
        k = jnp.eye(3)
        res, r_est, t_est = estimate_essential_5point_ransac(
            jnp.asarray(x1), jnp.asarray(x2), k, k,
            key=jax.random.PRNGKey(1), threshold=1e-4,
        )
        assert int(res.score) >= 70
        assert _rot_err_deg(rot, r_est) < 0.5
        assert _t_dir_err_deg(t, t_est) < 1.0


class TestEPnP:
    def test_clean_pose_recovery(self, rng):
        rot, t, pts3d, _, x2 = _scene(rng, 40)
        sol = efficient_pnp(jnp.asarray(pts3d), jnp.asarray(x2))
        assert _rot_err_deg(rot, sol.r) < 0.2
        np.testing.assert_allclose(np.asarray(sol.t), t, atol=5e-3)
        assert float(sol.err) < 1e-5

    def test_weighted_ignores_corrupted(self, rng):
        rot, t, pts3d, _, x2 = _scene(rng, 40)
        x2 = x2.copy()
        x2[:5] += 0.3
        w = np.ones(40, np.float32)
        w[:5] = 0.0
        sol = efficient_pnp(jnp.asarray(pts3d), jnp.asarray(x2), jnp.asarray(w))
        assert _rot_err_deg(rot, sol.r) < 0.3
        np.testing.assert_allclose(np.asarray(sol.t), t, atol=1e-2)

    def test_planar_scene(self, rng):
        # planar degenerate-ish case: control points still span via PCA floor
        rot = Rotation.from_euler("xyz", [5, -8, 3], degrees=True).as_matrix()
        t = np.array([0.1, -0.2, 0.3])
        pts3d = np.concatenate(
            [rng.uniform(-1, 1, size=(30, 2)), np.zeros((30, 1))], axis=1
        )
        pts3d[:, 2] += 0.001 * rng.normal(size=30)
        pc = pts3d @ rot.T + t + np.array([0, 0, 4.0])
        x2 = pc[:, :2] / pc[:, 2:]
        sol = efficient_pnp(
            jnp.asarray(pts3d, jnp.float32), jnp.asarray(x2, jnp.float32)
        )
        assert _rot_err_deg(rot, sol.r) < 1.0


class TestHomographyDecomposition:
    def test_recovers_plane_motion(self, rng):
        # plane z = d in camera-1 frame, normal n = (0,0,1)
        rot = Rotation.from_euler("xyz", [8, -5, 4], degrees=True).as_matrix()
        t = np.array([0.2, 0.1, -0.15])
        n = np.array([0.0, 0.0, 1.0])
        d = 4.0
        h_true = rot + np.outer(t, n) / d  # x2 ~ H x1 (normalized coords)

        # generate correspondences on the plane
        pts = rng.uniform(-1, 1, size=(50, 2)).astype(np.float32)
        p3 = np.concatenate([pts * d, np.full((50, 1), d)], axis=1)
        x1 = p3[:, :2] / p3[:, 2:]
        pc = p3 @ rot.T + t
        x2 = pc[:, :2] / pc[:, 2:]

        k = jnp.eye(3)
        rs, ts, ns = decompose_homography(
            jnp.asarray(h_true, jnp.float32), k, k
        )
        r_best, t_best, n_best = select_homography_motion(
            rs, ts, ns, jnp.asarray(x1), jnp.asarray(x2)
        )
        assert _rot_err_deg(rot, r_best) < 0.5
        assert _t_dir_err_deg(t, t_best) < 1.5
        nb = np.asarray(n_best)
        assert abs(abs(nb @ n) / np.linalg.norm(nb) - 1.0) < 1e-2
