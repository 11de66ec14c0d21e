"""Staged scene reconstruction (twoview/scene_ba.py).

VERDICT round-2 item 7 done-criterion: recover a 16-camera synthetic scene
with injected outlier tracks through the full staged pipeline
(init-pair BA -> per-camera PnP refine -> global BA -> filter + re-BA),
plus unit checks for each stage against analytic ground truth.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comet_tpu.geometry.quaternions import (
    quat_multiply,
    quat_normalize,
    quat_to_matrix,
)
from comet_tpu.twoview.scene_ba import (
    camera_centers,
    filter_points3d,
    init_ba,
    reconstruct_scene,
    refine_poses,
    triangulate_by_pair,
    triangulation_angles_deg,
)
from comet_tpu.twoview.triangulation import project_points

pytestmark = pytest.mark.slow


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _axis_angle_quat(axis, angle):
    axis = np.asarray(axis, np.float64)
    axis = axis / np.linalg.norm(axis)
    return np.concatenate(
        [[np.cos(angle / 2)], np.sin(angle / 2) * axis]
    ).astype(np.float32)


def _scene(rng, s=16, n=96, f=320.0, img=256.0, noise=0.3):
    """Cameras on an arc looking at a point cloud near the origin."""
    k = np.asarray([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]], np.float32)
    pts = rng.uniform(-1.0, 1.0, size=(n, 3)).astype(np.float32)
    pts[:, 2] *= 0.5
    qs, ts = [], []
    for i in range(s):
        ang = (i - s / 2) * 0.04
        q = _axis_angle_quat([0, 1, 0], ang)
        qs.append(q)
        # camera center orbits; x_cam = x @ R + T -> T = -C @ R
        c = np.asarray([np.sin(ang) * 4.0, 0.1 * i / s, -np.cos(ang) * 4.0])
        r = np.asarray(quat_to_matrix(jnp.asarray(q)))
        ts.append((-c @ r).astype(np.float32))
    q = jnp.asarray(np.stack(qs))
    t = jnp.asarray(np.stack(ts))
    tracks = project_points(jnp.asarray(pts), q, t, jnp.asarray(k))
    tracks = tracks + rng.normal(size=tracks.shape).astype(np.float32) * noise
    vis = jnp.ones(tracks.shape[:2], jnp.float32)
    return q, t, jnp.asarray(k), jnp.asarray(pts), jnp.asarray(tracks), vis


def _perturb(rng, q, t, rot=0.03, trans=0.08, keep_first=True):
    dq = rng.normal(size=q.shape).astype(np.float32) * rot
    qp = quat_normalize(q + jnp.asarray(dq))
    tp = t + jnp.asarray(rng.normal(size=t.shape).astype(np.float32) * trans)
    if keep_first:
        qp = qp.at[0].set(q[0])
        tp = tp.at[0].set(t[0])
    return qp, tp


def _rot_err_deg(qa, qb):
    d = quat_multiply(quat_normalize(qa), quat_normalize(qb) * jnp.asarray(
        [1.0, -1.0, -1.0, -1.0]
    ))
    w = jnp.clip(jnp.abs(d[..., 0]), 0, 1)
    return np.degrees(np.asarray(2 * jnp.arccos(w)))


class TestStages:
    def test_camera_centers(self, rng):
        q, t, k, pts, tracks, vis = _scene(rng, s=4, n=8, noise=0.0)
        c = np.asarray(camera_centers(q, t))
        # projecting the center must land it at the camera origin
        r = np.asarray(quat_to_matrix(q))
        for i in range(4):
            np.testing.assert_allclose(
                c[i] @ r[i] + np.asarray(t)[i], 0.0, atol=1e-5
            )

    def test_triangulation_angles(self):
        # two cameras at (+-1, 0, 0) looking at a point at (0, 0, 1):
        # each ray has length sqrt(2), baseline 2 -> angle 90 deg
        centers = jnp.asarray([[-1.0, 0, 0], [1.0, 0, 0]])
        pts = jnp.asarray([[0.0, 0, 1.0]])
        ang = np.asarray(triangulation_angles_deg(pts, centers))
        np.testing.assert_allclose(ang[0, 1, 0], 90.0, atol=1e-4)

    def test_triangulate_by_pair_recovers_points(self, rng):
        q, t, k, pts, tracks, vis = _scene(rng, s=6, n=32, noise=0.0)
        pair_pts, inlier, angles = triangulate_by_pair(q, t, k, tracks, vis)
        assert angles.shape == (5, 32)
        assert pair_pts.shape == (5, 32, 3)
        # wide-baseline pairs should be all-inlier and accurate
        best = int(np.argmax(np.asarray(inlier).sum(-1)))
        np.testing.assert_allclose(
            np.asarray(pair_pts[best]), np.asarray(pts), atol=1e-2
        )
        assert np.asarray(inlier[best]).mean() > 0.95

    def test_init_ba_picks_widest_pair(self, rng):
        q, t, k, pts, tracks, vis = _scene(rng, s=8, n=48, noise=0.1)
        res = init_ba(q, t, k, tracks, vis)
        # the chosen partner frame must produce a near-complete inlier set
        assert np.asarray(res.point_valid).mean() > 0.9
        assert 1 <= int(res.init_idx) <= 7

    def test_refine_poses_fixes_perturbed_camera(self, rng):
        q, t, k, pts, tracks, vis = _scene(rng, s=6, n=64, noise=0.0)
        qp, tp = q, t
        # badly perturb camera 3 only
        qp = qp.at[3].set(
            quat_normalize(q[3] + jnp.asarray([0.0, 0.05, 0.03, -0.04]))
        )
        tp = tp.at[3].set(t[3] + 0.3)
        valid = jnp.ones(pts.shape[0], bool)
        q2, t2 = refine_poses(qp, tp, k, pts, valid, tracks, vis)
        assert _rot_err_deg(q2[3], q[3]) < 0.2
        np.testing.assert_allclose(np.asarray(t2[3]), np.asarray(t[3]), atol=0.02)

    def test_filter_rejects_outlier_points(self, rng):
        q, t, k, pts, tracks, vis = _scene(rng, s=6, n=40, noise=0.0)
        bad = pts.at[:5].set(pts[:5] + jnp.asarray([5.0, 5.0, 5.0]))
        valid, inlier = filter_points3d(bad, tracks, q, t, k,
                                        max_reproj_error=2.0)
        v = np.asarray(valid)
        assert not v[:5].any()
        assert v[5:].all()
        assert np.asarray(inlier)[:, 5:].all()


class TestStagedPipeline:
    def test_sixteen_camera_scene_with_outliers(self, rng):
        """The VERDICT done-criterion: 16 cameras, noisy tracks, 15% of
        tracks corrupted outright; the staged pipeline must recover poses
        near GT and flag the corrupted tracks invalid."""
        s, n = 16, 96
        q, t, k, pts, tracks, vis = _scene(rng, s=s, n=n, noise=0.3)
        n_out = 14
        # corrupt entire tracks (gross outliers, e.g. a mismatched feature)
        corrupt = jnp.asarray(
            rng.uniform(0, 250, size=(s, n_out, 2)).astype(np.float32)
        )
        tracks = tracks.at[:, :n_out].set(corrupt)
        q0, t0 = _perturb(rng, q, t, rot=0.02, trans=0.05)

        rec = reconstruct_scene(
            q0, t0, tracks, vis, k, ba_iters=12, ba_rounds=2,
            max_reproj_error=3.0,
        )
        # pose recovery (relative to frame 0, the gauge anchor)
        rot_errs = _rot_err_deg(rec.state.q, q)
        assert np.median(rot_errs) < 0.5, rot_errs
        t_err = np.abs(np.asarray(rec.state.t - t))
        assert np.median(t_err) < 0.05, np.median(t_err)
        # outlier tracks flagged out, inlier tracks kept
        valid = np.asarray(rec.valid_tracks)
        assert valid[:n_out].mean() < 0.2, valid[:n_out]
        assert valid[n_out:].mean() > 0.9
        # surviving structure matches GT. An SfM reconstruction is defined
        # only up to a similarity gauge — the init pair's (perturbed)
        # baseline sets the global scale and BA cannot recover it — so the
        # structure check aligns with Umeyama first, exactly like the
        # reference evaluates reconstructions (comet/utils/align.py:109,145).
        from comet_tpu.twoview.align import corresponding_points_alignment

        kept = np.asarray(rec.state.points)[valid]
        want = np.asarray(pts)[valid]
        # unaligned: bounded by the injected pose noise (gauge drift only)
        med_raw = np.median(np.linalg.norm(kept - want, axis=-1))
        assert med_raw < 0.5, med_raw
        sim = corresponding_points_alignment(jnp.asarray(kept), jnp.asarray(want))
        aligned = np.asarray(
            float(sim.s) * jnp.asarray(kept) @ sim.r + sim.t
        )
        med = np.median(np.linalg.norm(aligned - want, axis=-1))
        assert med < 0.02, med
        assert np.isfinite(float(rec.rms))


class TestStagedPipelineFuzz:
    def test_random_scenes(self):
        """Property fuzz: the staged pipeline recovers poses across random
        scene geometries, noise levels, and outlier fractions."""
        for seed in (11, 23, 42):
            r = np.random.default_rng(seed)
            s = int(r.integers(8, 17))
            n = int(r.integers(64, 112))
            noise = float(r.uniform(0.1, 0.5))
            q, t, k, pts, tracks, vis = _scene(r, s=s, n=n, noise=noise)
            n_out = int(n * r.uniform(0.05, 0.18))
            corrupt = jnp.asarray(
                r.uniform(0, 250, size=(s, n_out, 2)).astype(np.float32)
            )
            tracks = tracks.at[:, :n_out].set(corrupt)
            q0, t0 = _perturb(r, q, t, rot=0.02, trans=0.05)
            rec = reconstruct_scene(
                q0, t0, tracks, vis, k, ba_iters=12, ba_rounds=2,
                max_reproj_error=3.0,
            )
            rot_errs = _rot_err_deg(rec.state.q, q)
            assert np.median(rot_errs) < 1.0, (seed, rot_errs)
            t_err = np.abs(np.asarray(rec.state.t - t))
            assert np.median(t_err) < 0.1, (seed, np.median(t_err))
            valid = np.asarray(rec.valid_tracks)
            if n_out >= 5:
                assert valid[:n_out].mean() < 0.35, (seed, valid[:n_out])
            assert valid[n_out:].mean() > 0.85, (seed,)
