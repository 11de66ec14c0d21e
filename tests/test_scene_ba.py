"""Scene-level geometry: preliminary cameras from tracks + global BA.

Parity targets: estimate_preliminary_cameras
(comet/two_view_geo/estimate_preliminary.py:98) and the pycolmap
global_BA / iterative_global_BA drivers (comet/utils/triangulation.py:
677, 776, 1020, 1076) — reimplemented as RANSAC triangulation + dense LM.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from comet_tpu.geometry.quaternions import quat_to_matrix
from comet_tpu.twoview import (
    estimate_preliminary_cameras,
    global_bundle_adjust,
    projection_matrices,
    triangulate_tracks_ransac,
)


def _scene(rng, s=6, n=64, rot_deg=6.0, noise=0.0):
    """Synthetic multi-view scene. Returns column-convention poses
    (Xc = R Xw + t), pixel tracks through K, and the 3D points."""
    k = np.array([[400.0, 0, 256], [0, 400.0, 256], [0, 0, 1]], np.float32)
    points = rng.uniform(-1, 1, size=(n, 3)).astype(np.float32)
    points[:, 2] += 6.0
    rs, ts, tracks = [], [], []
    for i in range(s):
        axis = rng.normal(size=3)
        axis /= np.linalg.norm(axis)
        r = Rotation.from_rotvec(np.deg2rad(rot_deg * i) * axis).as_matrix()
        t = 0.2 * i * rng.normal(size=3)
        pc = points @ r.T + t
        pix = pc @ k.T
        uv = pix[:, :2] / pix[:, 2:]
        if noise:
            uv = uv + rng.normal(size=uv.shape) * noise
        rs.append(r.astype(np.float32))
        ts.append(t.astype(np.float32))
        tracks.append(uv.astype(np.float32))
    return k, np.stack(rs), np.stack(ts), np.stack(tracks), points


def _rot_err_deg(r1, r2):
    cos = (np.trace(np.asarray(r1).T @ np.asarray(r2)) - 1) / 2
    return np.degrees(np.arccos(np.clip(cos, -1, 1)))


pytestmark = pytest.mark.slow  # dense LM BA, ~45 s on the 1-core host

class TestPreliminaryCameras:
    def test_recovers_relative_rotations(self, rng):
        k, rs, ts, tracks, _ = _scene(rng, s=5, n=128)
        # make all poses relative to frame 0 (identity) like the tracks are
        vis = np.ones((1, 5, 128), np.float32)
        cams, prelim = estimate_preliminary_cameras(
            jnp.asarray(tracks)[None], jnp.asarray(vis), 512, 512,
            max_error=2.0, key=jax.random.PRNGKey(0),
        )
        assert cams["q"].shape == (1, 5, 4)
        assert prelim["fmat"].shape == (1, 4, 3, 3)
        # frame 0 is identity
        np.testing.assert_allclose(
            np.asarray(cams["q"][0, 0]), [1, 0, 0, 0], atol=1e-6
        )
        # relative rotations match GT (frame 0 of the scene IS identity)
        for i in range(1, 5):
            r_est = np.asarray(quat_to_matrix(cams["q"][0, i]))
            err = _rot_err_deg(rs[i], r_est)
            assert err < 2.0, (i, err)
        # most correspondences are inliers
        assert np.asarray(prelim["fmat_inlier_mask"]).mean() > 0.9

    def test_visibility_mask_excludes_points(self, rng):
        k, rs, ts, tracks, _ = _scene(rng, s=3, n=64)
        tracks = tracks.copy()
        tracks[1:, :10] += 50.0  # corrupt 10 tracks
        vis = np.ones((1, 3, 64), np.float32)
        vis[0, :, :10] = 0.0  # and mark them invisible
        cams, prelim = estimate_preliminary_cameras(
            jnp.asarray(tracks)[None], jnp.asarray(vis), 512, 512,
            max_error=2.0, key=jax.random.PRNGKey(0),
        )
        inl = np.asarray(prelim["fmat_inlier_mask"])
        assert inl[0, :, :10].sum() == 0  # invisible points never inliers
        r_est = np.asarray(quat_to_matrix(cams["q"][0, 1]))
        assert _rot_err_deg(rs[1], r_est) < 2.0


class TestRansacTriangulation:
    def test_rejects_corrupted_views(self, rng):
        k, rs, ts, tracks, points = _scene(rng, s=6, n=32)
        tracks = tracks.copy()
        tracks[2, :, :] += 40.0  # view 2 observations are garbage
        q = np.stack(
            [Rotation.from_matrix(r.T).as_quat(scalar_first=True) for r in rs]
        ).astype(np.float32)
        # our projection_matrices use row convention x_cam = x @ R + t
        proj = projection_matrices(
            jnp.asarray(q), jnp.asarray(ts), jnp.asarray(k)
        )
        vis = jnp.ones((6, 32))
        pts, inl = triangulate_tracks_ransac(
            proj, jnp.asarray(tracks), vis, threshold=2.0
        )
        assert np.asarray(inl)[2].mean() < 0.1  # corrupted view masked out
        np.testing.assert_allclose(np.asarray(pts), points, atol=5e-2)


class TestGlobalBA:
    def test_refines_noisy_poses(self, rng):
        # noise 0.1 px: the ML optimum itself sits ~0.2-0.3 deg from GT at
        # this narrow effective FOV (rotation/translation trade-off);
        # verified by running BA from the GT itself, which converges to the
        # same solution as from the perturbed start
        k, rs, ts, tracks, points = _scene(rng, s=5, n=48, noise=0.1)
        q_gt = np.stack(
            [Rotation.from_matrix(r.T).as_quat(scalar_first=True) for r in rs]
        ).astype(np.float32)
        # perturb initial poses (frame 0 stays fixed as gauge)
        q0 = q_gt.copy()
        t0 = np.asarray(ts).copy()
        for i in range(1, 5):
            dq = Rotation.from_rotvec(np.deg2rad(1.5) * rng.normal(size=3))
            r_pert = (Rotation.from_quat(q0[i], scalar_first=True) * dq)
            q0[i] = r_pert.as_quat(scalar_first=True)
            t0[i] += 0.05 * rng.normal(size=3)

        state, obs_mask, rms = global_bundle_adjust(
            jnp.asarray(q0), jnp.asarray(t0), jnp.asarray(tracks),
            jnp.ones((5, 48)), jnp.asarray(k), rounds=2, ba_iters=20,
        )
        assert float(rms) < 0.5  # converged to ~observation noise
        for i in range(5):
            r_est = np.asarray(quat_to_matrix(state.q[i])).T
            err = _rot_err_deg(rs[i], r_est)
            # 0.3 px observation noise on 5 cams / 48 pts bounds the
            # achievable accuracy around ~0.3 deg; initial error was 1.5-3 deg
            assert err < 0.5, (i, err)
