"""Tests for the two-view geometry / triangulation / BA / alignment stack.

Ground truth built from synthetic projective scenes; estimators must recover
the generating geometry."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from comet_tpu.twoview import (
    bundle_adjust,
    corresponding_points_alignment,
    estimate_fundamental_ransac,
    estimate_homography_ransac,
    estimate_essential_ransac,
    farthest_point_sample,
    projection_matrices,
    relative_to_first,
    rotation_average,
    run_8point,
    run_homography_dlt,
    sampson_distance,
    solve_pnp,
    solve_pnp_focal_sweep,
    triangulate_tracks,
    triangulate_and_refine,
)
from comet_tpu.geometry import matrix_to_quat, quat_to_matrix


K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])


def synth_two_view(rng, n=64, noise=0.0, outliers=0):
    """Random 3D points seen by two cameras (column convention x_cam = R x + t)."""
    pts3d = rng.random((n, 3)) * np.array([4, 4, 2]) + np.array([-2, -2, 6])
    r_rel = R.from_euler("xyz", [5, -8, 3], degrees=True).as_matrix()
    t_rel = np.array([0.5, 0.1, 0.05])

    def project(pts, r, t):
        cam = pts @ r.T + t
        pix = cam @ K.T
        return pix[:, :2] / pix[:, 2:]

    x1 = project(pts3d, np.eye(3), np.zeros(3))
    x2 = project(pts3d, r_rel, t_rel)
    if noise:
        x1 += rng.normal(0, noise, x1.shape)
        x2 += rng.normal(0, noise, x2.shape)
    if outliers:
        idx = rng.choice(n, outliers, replace=False)
        x2[idx] += rng.random((outliers, 2)) * 100 + 30
    return pts3d, x1, x2, r_rel, t_rel


class TestFundamental:
    def test_8point_epipolar_constraint(self, rng):
        _, x1, x2, _, _ = synth_two_view(rng)
        f = run_8point(jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32))
        d = np.asarray(sampson_distance(f, jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)))
        assert np.median(d) < 1e-2

    def test_ransac_rejects_outliers(self, rng):
        _, x1, x2, _, _ = synth_two_view(rng, n=80, noise=0.2, outliers=20)
        res = estimate_fundamental_ransac(
            jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32),
            key=jax.random.PRNGKey(1), threshold=2.0, num_hypotheses=64,
        )
        assert int(res.score) >= 50  # most inliers found
        d = np.asarray(sampson_distance(res.model, jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32)))
        assert np.median(d) < 2.0


class TestEssential:
    def test_recovers_relative_motion(self, rng):
        _, x1, x2, r_rel, t_rel = synth_two_view(rng, n=100)
        kj = jnp.asarray(K, jnp.float32)
        res, r_est, t_est = estimate_essential_ransac(
            jnp.asarray(x1, jnp.float32), jnp.asarray(x2, jnp.float32), kj, kj,
            key=jax.random.PRNGKey(0), threshold=1e-4, num_hypotheses=64,
        )
        # rotation error
        err = R.from_matrix(np.asarray(r_est) @ r_rel.T).magnitude() * 180 / np.pi
        assert err < 1.0
        # translation direction error (scale-free)
        t_est_n = np.asarray(t_est) / np.linalg.norm(np.asarray(t_est))
        t_gt_n = t_rel / np.linalg.norm(t_rel)
        assert np.degrees(np.arccos(np.clip(abs(t_est_n @ t_gt_n), -1, 1))) < 2.0


class TestHomography:
    def test_planar_scene(self, rng):
        # planar points -> exact homography
        pts = rng.random((40, 2)) * 200 + 100
        h_gt = np.array([[1.1, 0.05, 3.0], [-0.04, 0.95, -2.0], [1e-4, -5e-5, 1.0]])
        ph = np.concatenate([pts, np.ones((40, 1))], axis=1) @ h_gt.T
        pts2 = ph[:, :2] / ph[:, 2:]
        h = run_homography_dlt(jnp.asarray(pts, jnp.float32), jnp.asarray(pts2, jnp.float32))
        h_np = np.asarray(h) / np.asarray(h)[2, 2]
        np.testing.assert_allclose(h_np, h_gt / h_gt[2, 2], atol=1e-2)

    def test_ransac_with_outliers(self, rng):
        pts = rng.random((60, 2)) * 200 + 100
        h_gt = np.array([[1.0, 0.1, 5.0], [0.0, 1.0, -3.0], [0.0, 0.0, 1.0]])
        ph = np.concatenate([pts, np.ones((60, 1))], axis=1) @ h_gt.T
        pts2 = ph[:, :2] / ph[:, 2:]
        pts2[:10] += 50
        res = estimate_homography_ransac(
            jnp.asarray(pts, jnp.float32), jnp.asarray(pts2, jnp.float32),
            key=jax.random.PRNGKey(0), threshold=1.0, num_hypotheses=64,
        )
        assert int(res.score) >= 45


def synth_sequence(rng, s=4, n=30):
    """Cameras in row convention (x_cam = x @ R + T) viewing a point cloud."""
    pts3d = rng.random((n, 3)) * np.array([4, 4, 2]) + np.array([-2, -2, 8])
    qs, ts, obs = [], [], []
    for i in range(s):
        rot = R.from_euler("xyz", np.array([2, 3, -1]) * i, degrees=True).as_matrix()
        t = np.array([0.1 * i, -0.05 * i, 0.2 * i])
        cam = pts3d @ rot + t  # row convention
        pix = cam @ K.T
        obs.append(pix[:, :2] / pix[:, 2:])
        # project_points composes x @ quat_to_matrix(q), so q must satisfy
        # quat_to_matrix(q) == rot (the row-convention matrix used above)
        qs.append(R.from_matrix(rot).as_quat(scalar_first=True))
        ts.append(t)
    return pts3d, np.array(qs), np.array(ts), np.stack(obs)


class TestTriangulationBA:
    def test_triangulate_exact(self, rng):
        pts3d, qs, ts, obs = synth_sequence(rng)
        proj = projection_matrices(
            jnp.asarray(qs, jnp.float32), jnp.asarray(ts, jnp.float32),
            jnp.asarray(K, jnp.float32),
        )
        mask = jnp.ones(obs.shape[:2], jnp.float32)
        est = np.asarray(
            triangulate_tracks(proj, jnp.asarray(obs, jnp.float32), mask)
        )
        np.testing.assert_allclose(est, pts3d, atol=1e-2)

    def test_ba_reduces_noise(self, rng):
        pts3d, qs, ts, obs = synth_sequence(rng, s=4, n=20)
        noisy_pts = pts3d + rng.normal(0, 0.05, pts3d.shape)
        mask = jnp.ones(obs.shape[:2], jnp.float32)
        state, rms = bundle_adjust(
            jnp.asarray(qs, jnp.float32), jnp.asarray(ts, jnp.float32),
            jnp.asarray(noisy_pts, jnp.float32), jnp.asarray(obs, jnp.float32),
            mask, jnp.asarray(K, jnp.float32), iters=12,
        )
        assert float(rms) < 0.5  # pixels
        err_before = np.abs(noisy_pts - pts3d).mean()
        err_after = np.abs(np.asarray(state.points) - pts3d).mean()
        assert err_after < err_before * 0.5  # noise substantially reduced

    def test_triangulate_and_refine_pipeline(self, rng):
        pts3d, qs, ts, obs = synth_sequence(rng, s=4, n=16)
        mask = jnp.ones(obs.shape[:2], jnp.float32)
        state, rms = triangulate_and_refine(
            jnp.asarray(qs, jnp.float32), jnp.asarray(ts, jnp.float32),
            jnp.asarray(obs, jnp.float32), mask, jnp.asarray(K, jnp.float32),
            ba_iters=8,
        )
        assert float(rms) < 0.5


class TestPnP:
    def test_recovers_pose(self, rng):
        pts3d = rng.random((40, 3)) * np.array([4, 4, 2]) + np.array([-2, -2, 8])
        rot = R.from_euler("xyz", [10, -5, 7], degrees=True).as_matrix()
        t = np.array([0.3, -0.2, 0.5])
        cam = pts3d @ rot.T + t
        pix = cam @ K.T
        pts2d = pix[:, :2] / pix[:, 2:]
        res = solve_pnp(
            jnp.asarray(pts3d, jnp.float32), jnp.asarray(pts2d, jnp.float32),
            jnp.asarray(K, jnp.float32),
        )
        err = R.from_matrix(np.asarray(res.r) @ rot.T).magnitude() * 180 / np.pi
        assert err < 0.5
        np.testing.assert_allclose(np.asarray(res.t), t, atol=0.02)

    def test_focal_sweep(self, rng):
        pts3d = rng.random((40, 3)) * np.array([4, 4, 2]) + np.array([-2, -2, 8])
        rot = np.eye(3)
        t = np.array([0.0, 0.0, 0.1])
        cam = pts3d @ rot.T + t
        pix = cam @ K.T
        pts2d = pix[:, :2] / pix[:, 2:]
        res, focal = solve_pnp_focal_sweep(
            jnp.asarray(pts3d, jnp.float32), jnp.asarray(pts2d, jnp.float32),
            jnp.asarray([320.0, 240.0], jnp.float32),
            jnp.asarray([300.0, 500.0, 800.0], jnp.float32),
        )
        assert float(focal) == pytest.approx(500.0)


class TestAlign:
    def test_umeyama_roundtrip(self, rng):
        x = rng.random((50, 3))
        r_gt = R.from_euler("xyz", [20, -10, 5], degrees=True).as_matrix()
        s_gt, t_gt = 2.5, np.array([1.0, -2.0, 0.5])
        y = s_gt * x @ r_gt + t_gt
        sim = corresponding_points_alignment(
            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
        )
        assert float(sim.s) == pytest.approx(s_gt, rel=1e-4)
        np.testing.assert_allclose(np.asarray(sim.r), r_gt, atol=1e-4)
        np.testing.assert_allclose(np.asarray(sim.t), t_gt, atol=1e-3)

    def test_rotation_average(self, rng):
        base = R.from_euler("xyz", [30, 10, -5], degrees=True)
        quats = []
        for _ in range(20):
            pert = R.from_euler("xyz", rng.normal(0, 1.0, 3), degrees=True)
            q = (base * pert).as_quat(scalar_first=True)
            quats.append(q * np.sign(q[0]))
        avg = rotation_average(jnp.asarray(np.array(quats), jnp.float32))
        err = (base.inv() * R.from_quat(np.asarray(avg)[[1, 2, 3, 0]])).magnitude()
        assert np.degrees(err) < 1.0

    def test_relative_to_first(self, rng):
        q = rng.normal(size=(5, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        t = rng.normal(size=(5, 3))
        q_rel, t_rel = relative_to_first(jnp.asarray(q, jnp.float32), jnp.asarray(t, jnp.float32))
        np.testing.assert_allclose(np.abs(np.asarray(q_rel[0])), [1, 0, 0, 0], atol=1e-5)
        np.testing.assert_allclose(np.asarray(t_rel[0]), 0.0, atol=1e-6)

    def test_farthest_point_sample(self, rng):
        pts = rng.random((100, 3))
        idx = np.asarray(farthest_point_sample(jnp.asarray(pts, jnp.float32), 10))
        assert len(np.unique(idx)) == 10


class TestFrameRanking:
    """Query-frame selection utilities (comet/utils/utils.py:167-332)."""

    def test_index_mappings_swap(self):
        from comet_tpu.twoview.align import (
            calculate_index_mappings,
            switch_tensor_order,
        )

        order = np.asarray(calculate_index_mappings(3, 6))
        assert order[0] == 3 and order[3] == 0
        assert sorted(order.tolist()) == list(range(6))
        x = jnp.arange(12).reshape(2, 6)
        (y, z) = switch_tensor_order([x, None], jnp.asarray(order), axis=1)
        assert z is None
        np.testing.assert_array_equal(np.asarray(y[:, 0]), np.asarray(x[:, 3]))

    def test_midpoint_and_interval_orders(self):
        from comet_tpu.twoview.align import (
            generate_rank_by_interval,
            generate_rank_by_midpoint,
        )

        for n in (5, 8, 13):
            m = generate_rank_by_midpoint(n)
            assert sorted(m) == list(range(n))
            assert m[0] == (n - 1) // 2 and m[1] == 0 and m[2] == n - 1
        iv = generate_rank_by_interval(10, 3)
        assert iv == [0, 3, 6, 9, 1, 4, 7, 2, 5, 8]

    def test_feature_similarity_ranking(self):
        from comet_tpu.twoview.align import rank_by_feature_similarity

        rng = np.random.default_rng(0)
        base = rng.normal(size=(1, 16, 8)).astype(np.float32)
        # frames 0-2 nearly identical, frame 3 very different
        feats = np.concatenate(
            [
                base + 0.01 * rng.normal(size=(3, 16, 8)),
                10.0 * rng.normal(size=(1, 16, 8)),
            ],
            axis=0,
        ).astype(np.float32)
        picked = np.asarray(rank_by_feature_similarity(jnp.asarray(feats), 2))
        # seed = one of the mutually-similar frames; second pick = the
        # dissimilar one
        assert picked[0] in (0, 1, 2)
        assert picked[1] == 3
