"""Randomized property fuzz over the parity-critical numeric core.

Reduced-seed versions of the round-2 fuzz sweeps (full sweeps: 300/60/65/40
seeds, zero failures — COVERAGE.md): codec roundtrips, the production
folded-volume correlation sampler vs the torch-verified reference variant,
the Pallas kernels vs their jnp references, and essential-matrix RANSAC
pose recovery under noise + outliers.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow


class TestCodecFuzz:
    def test_uvz_and_xyz_roundtrip_random_cameras(self):
        from comet_tpu.geometry.cameras import CameraSet
        from comet_tpu.geometry.codecs import (
            Intrinsics,
            decode_relative_uvz,
            decode_relative_xyz,
            encode_relative_uvz,
            encode_relative_xyz,
        )

        intr = Intrinsics(fx=268.444, fy=268.444, cx=320.0, cy=240.0)
        for seed in range(50):
            rng = np.random.default_rng(seed)
            s = int(rng.integers(2, 17))
            q = rng.normal(size=(s, 4)).astype(np.float32)
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            d = (np.abs(rng.normal(size=(s,))) + 0.5).astype(np.float32)
            u = rng.uniform(0, 640, size=(s,)).astype(np.float32)
            v = rng.uniform(0, 480, size=(s,)).astype(np.float32)
            t_uvz = np.stack([u, v, d], -1)
            t_xyz = np.stack(
                [(u - 320.0) * d / 268.444, (v - 240.0) * d / 268.444, d], -1
            )
            cams = CameraSet(
                q=jnp.asarray(q), t_xyz=jnp.asarray(t_xyz),
                t_uvz=jnp.asarray(t_uvz), focal=jnp.full((s, 2), 1.5),
                pp=jnp.full((s, 2), 320.0),
                ratio=jnp.asarray(float(rng.uniform(0.3, 1.5))),
            )

            def check(qa, ta, tag):
                qa, ta = np.asarray(qa), np.asarray(ta)
                sign = np.sign((qa * q).sum(-1, keepdims=True))
                dq = np.abs(qa - q * sign).max()
                dt = np.abs(ta - t_xyz).max() / max(np.abs(t_xyz).max(), 1)
                assert dq < 2e-3 and dt < 2e-3, (tag, seed, dq, dt)

            check(*decode_relative_uvz(encode_relative_uvz(cams), cams, intr),
                  "uvz")
            check(*decode_relative_xyz(encode_relative_xyz(cams), cams),
                  "xyz")

    def test_abst_quar_onefl_roundtrip_random_cameras(self):
        from comet_tpu.geometry.cameras import CameraSet
        from comet_tpu.geometry.codecs import (
            decode_abst_quar_onefl,
            encode_abst_quar_onefl,
        )

        for seed in range(50):
            rng = np.random.default_rng(100 + seed)
            s = int(rng.integers(2, 17))
            q = rng.normal(size=(s, 4)).astype(np.float32)
            q /= np.linalg.norm(q, axis=-1, keepdims=True)
            q *= np.sign(q[:, :1] + 1e-12)
            t = rng.normal(size=(s, 3)).astype(np.float32) * 5.0
            # focals straddling both clamp branches
            focal = rng.uniform(0.01, 60.0, (s, 2)).astype(np.float32)
            cams = CameraSet(
                q=jnp.asarray(q), t_xyz=jnp.asarray(t),
                t_uvz=jnp.asarray(t), focal=jnp.asarray(focal),
                pp=jnp.full((s, 2), 0.0), ratio=jnp.asarray(1.0),
            )
            qa, ta, fl = decode_abst_quar_onefl(
                encode_abst_quar_onefl(cams), cams
            )
            qa, ta, fl = np.asarray(qa), np.asarray(ta), np.asarray(fl)
            sign = np.sign((qa * q).sum(-1, keepdims=True))
            assert np.abs(qa - q * sign).max() < 2e-3, seed
            assert np.abs(ta - t).max() < 2e-3, seed
            np.testing.assert_allclose(
                fl[:, 0], np.clip(focal[:, 0], 0.1, 30.0), atol=1e-5
            )


class TestCorrFuzz:
    def test_volume_pyramid_equals_feature_pyramid(self):
        from comet_tpu.ops.corr import (
            corr_pyramid_sample,
            corr_volume_pyramid_sample,
        )

        def avg_pool_2x2(x):
            b, s, h, w, c = x.shape
            hh, ww = h // 2, w // 2
            return x[:, :, : hh * 2, : ww * 2].reshape(
                b, s, hh, 2, ww, 2, c
            ).mean((3, 5))

        for seed in range(15):
            rng = np.random.default_rng(seed)
            s = int(rng.integers(1, 4))
            n = int(rng.integers(3, 20))
            c = int(rng.choice([16, 32]))
            h = int(rng.choice([16, 24, 32]))
            levels = int(rng.integers(1, 4))
            radius = int(rng.integers(1, 4))
            fmaps = jnp.asarray(
                rng.normal(size=(1, s, h, h, c)).astype(np.float32)
            )
            coords = jnp.asarray(
                rng.uniform(-2, h + 2, size=(1, s, n, 2)).astype(np.float32)
            )
            tf = jnp.asarray(rng.normal(size=(1, s, n, c)).astype(np.float32))
            pyr = [fmaps]
            for _ in range(levels - 1):
                pyr.append(avg_pool_2x2(pyr[-1]))
            ref = np.asarray(corr_pyramid_sample(pyr, coords, tf, radius))
            out = np.asarray(
                corr_volume_pyramid_sample(fmaps, coords, tf, radius, levels)
            )
            d = np.abs(ref - out).max() / max(np.abs(ref).max(), 1.0)
            assert d < 2e-5, (seed, d)


class TestPallasFuzz:
    def test_fused_attention_random_shapes(self):
        from comet_tpu.ops.pallas_attn import (
            _reference_attention,
            fused_attention,
        )

        for seed in range(12):
            rng = np.random.default_rng(seed)
            h = int(rng.choice([2, 4, 8]))
            d = int(rng.choice([16, 32, 48, 64]))
            c = h * d
            lq = int(rng.integers(2, 65))
            b = int(rng.integers(256 // lq + 1, 1200 // lq))
            mk = lambda s: jnp.asarray(
                np.random.default_rng(s).normal(size=(b, lq, c)).astype(
                    np.float32
                )
            )
            q, k, v = mk(seed), mk(seed + 1), mk(seed + 2)
            ref = _reference_attention(q, k, v, h, d ** -0.5)
            out = fused_attention(q, k, v, h)
            assert np.abs(np.asarray(ref) - np.asarray(out)).max() < 5e-5

    def test_fused_block_random_shapes(self):
        from comet_tpu.ops.pallas_block import _seq_reference, fused_attn_block

        for seed in range(8):
            rng = np.random.default_rng(1000 + seed)
            h = int(rng.choice([2, 4, 8]))
            d = int(rng.choice([16, 32, 48]))
            c = h * d
            lq = int(rng.integers(2, 65))
            b = int(rng.integers(256 // lq + 1, 900 // lq))
            hid = int(rng.choice([2, 4])) * c
            x = jnp.asarray(rng.normal(size=(b, lq, c)).astype(np.float32)) * 0.5
            sd = 0.1
            p = [
                jnp.asarray(rng.normal(size=(c, 3 * c)).astype(np.float32)) * sd,
                jnp.asarray(rng.normal(size=(3 * c,)).astype(np.float32)) * sd,
                jnp.asarray(rng.normal(size=(c, c)).astype(np.float32)) * sd,
                jnp.zeros((c,), jnp.float32),
                jnp.asarray(rng.normal(size=(c, hid)).astype(np.float32)) * sd,
                jnp.zeros((hid,), jnp.float32),
                jnp.asarray(rng.normal(size=(hid, c)).astype(np.float32)) * sd,
                jnp.zeros((c,), jnp.float32),
            ]
            ref = _seq_reference(x, *p, num_heads=h)
            out = fused_attn_block(x, *p, num_heads=h)
            rel = np.abs(np.asarray(ref) - np.asarray(out)).max() / max(
                np.abs(np.asarray(ref)).max(), 1.0
            )
            assert rel < 2e-5, (seed, rel)


class TestEstimatorFuzz:
    def test_essential_ransac_recovers_pose_with_outliers(self):
        from comet_tpu.twoview.estimators import estimate_essential_ransac

        def rot(rng):
            a = rng.normal(size=3) * 0.3
            th = np.linalg.norm(a)
            k = a / max(th, 1e-9)
            kx = np.array(
                [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
            )
            return np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * kx @ kx

        checked = 0
        for seed in range(12):
            rng = np.random.default_rng(seed)
            n = 80
            k = np.array([[300.0, 0, 320], [0, 300.0, 240], [0, 0, 1]])
            r = rot(rng)
            t = rng.normal(size=3)
            t /= np.linalg.norm(t)
            pts = rng.uniform([-2, -2, 3], [2, 2, 8], size=(n, 3))
            p0h = (k @ pts.T).T
            p0 = p0h[:, :2] / p0h[:, 2:]
            pts1 = (r @ pts.T).T + t
            if (pts1[:, 2] <= 0.1).any():
                continue
            p1h = (k @ pts1.T).T
            p1 = p1h[:, :2] / p1h[:, 2:] + rng.normal(size=(n, 2)) * 0.3
            out_mask = rng.random(n) < 0.15
            p1[out_mask] += rng.uniform(-80, 80, size=(out_mask.sum(), 2))

            res, re, te = estimate_essential_ransac(
                jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32),
                jnp.asarray(k, jnp.float32), jnp.asarray(k, jnp.float32),
                key=jax.random.PRNGKey(seed),
                threshold=(2.0 / 300.0) ** 2, num_hypotheses=256,
            )
            rerr = np.degrees(np.arccos(np.clip(
                (np.trace(np.asarray(re).T @ r) - 1) / 2, -1, 1
            )))
            tdir = np.asarray(te).ravel()
            terr = np.degrees(np.arccos(np.clip(
                abs(np.dot(tdir / np.linalg.norm(tdir), t)), -1, 1
            )))
            assert rerr < 3.0 and terr < 6.0, (seed, rerr, terr)
            checked += 1
        assert checked >= 8  # most scenes must be valid (cheirality)


class TestPnPFuzz:
    def test_solve_pnp_recovers_pose(self):
        """DLT+LM PnP and EPnP recover random poses from noisy projections."""
        from comet_tpu.geometry.quaternions import quat_to_matrix
        from comet_tpu.twoview.pnp import solve_pnp
        from comet_tpu.twoview.solvers import efficient_pnp

        for seed in range(15):
            rng = np.random.default_rng(seed)
            a = rng.normal(size=3) * 0.4
            th = np.linalg.norm(a)
            k_ = a / max(th, 1e-9)
            kx = np.array(
                [[0, -k_[2], k_[1]], [k_[2], 0, -k_[0]], [-k_[1], k_[0], 0]]
            )
            r = np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * kx @ kx
            t = rng.normal(size=3) * 0.5 + np.array([0, 0, 5.0])
            kmat = np.array([[280.0, 0, 160], [0, 280.0, 120], [0, 0, 1]])
            n = 48
            pts = rng.uniform([-2, -2, 2], [2, 2, 8], size=(n, 3))
            pc = (r @ pts.T).T + t
            if (pc[:, 2] < 0.2).any():
                continue
            uv = (kmat @ pc.T).T
            uv = uv[:, :2] / uv[:, 2:] + rng.normal(size=(n, 2)) * 0.3

            res = solve_pnp(
                jnp.asarray(pts, jnp.float32), jnp.asarray(uv, jnp.float32),
                jnp.asarray(kmat, jnp.float32),
            )
            rerr = np.degrees(np.arccos(np.clip(
                (np.trace(np.asarray(res.r).T @ r) - 1) / 2, -1, 1)))
            terr = np.linalg.norm(np.asarray(res.t) - t)
            assert rerr < 0.5 and terr < 0.05, ("lm", seed, rerr, terr)

            pn = (uv - [160, 120]) / 280.0
            sol = efficient_pnp(
                jnp.asarray(pts, jnp.float32), jnp.asarray(pn, jnp.float32)
            )
            rerr2 = np.degrees(np.arccos(np.clip(
                (np.trace(np.asarray(sol.r).T @ r) - 1) / 2, -1, 1)))
            assert rerr2 < 2.0, ("epnp", seed, rerr2)


class TestFivePointFuzz:
    def test_nister_ransac_recovers_pose(self):
        """The evaluation-interpolation 5-point solver + RANSAC recovers
        random relative poses from noisy minimal-ish correspondence sets."""
        from comet_tpu.twoview.solvers import estimate_essential_5point_ransac

        def rot(rng, s=0.3):
            a = rng.normal(size=3) * s
            th = np.linalg.norm(a)
            k = a / max(th, 1e-9)
            kx = np.array(
                [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
            )
            return np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * kx @ kx

        checked = 0
        for seed in range(10):
            rng = np.random.default_rng(100 + seed)
            n = 40
            kmat = np.array([[300.0, 0, 320], [0, 300.0, 240], [0, 0, 1]])
            r = rot(rng)
            t = rng.normal(size=3)
            t /= np.linalg.norm(t)
            pts = rng.uniform([-2, -2, 3], [2, 2, 8], size=(n, 3))
            p0h = (kmat @ pts.T).T
            p0 = p0h[:, :2] / p0h[:, 2:]
            pts1 = (r @ pts.T).T + t
            if (pts1[:, 2] <= 0.1).any():
                continue
            p1h = (kmat @ pts1.T).T
            p1 = p1h[:, :2] / p1h[:, 2:] + rng.normal(size=(n, 2)) * 0.2

            res, re, te = estimate_essential_5point_ransac(
                jnp.asarray(p0, jnp.float32), jnp.asarray(p1, jnp.float32),
                jnp.asarray(kmat, jnp.float32), jnp.asarray(kmat, jnp.float32),
                key=jax.random.PRNGKey(seed),
                threshold=(2.0 / 300.0) ** 2, num_hypotheses=64,
            )
            rerr = np.degrees(np.arccos(np.clip(
                (np.trace(np.asarray(re).T @ r) - 1) / 2, -1, 1
            )))
            tdir = np.asarray(te).ravel()
            terr = np.degrees(np.arccos(np.clip(
                abs(np.dot(tdir / np.linalg.norm(tdir), t)), -1, 1
            )))
            assert rerr < 3.0 and terr < 8.0, (seed, rerr, terr)
            checked += 1
        assert checked >= 7


class TestHomographyDecompositionFuzz:
    def test_decompose_recovers_plane_motion(self):
        """Plane-induced homographies H = K (R + t n^T / d) K^-1 decompose
        into a candidate set containing the true (R, t-direction, n)."""
        from comet_tpu.twoview.solvers import decompose_homography

        def rot(rng, s=0.25):
            a = rng.normal(size=3) * s
            th = np.linalg.norm(a)
            k = a / max(th, 1e-9)
            kx = np.array(
                [[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]]
            )
            return np.eye(3) + np.sin(th) * kx + (1 - np.cos(th)) * kx @ kx

        for seed in range(20):
            rng = np.random.default_rng(seed)
            kmat = np.array([[300.0, 0, 320], [0, 300.0, 240], [0, 0, 1]])
            r = rot(rng)
            t = rng.normal(size=3)
            t /= np.linalg.norm(t)
            # plane normal roughly facing the camera, distance d
            n_pl = rng.normal(size=3) * 0.3 + np.array([0, 0, -1.0])
            n_pl /= np.linalg.norm(n_pl)
            d = float(rng.uniform(2.0, 6.0))
            h = kmat @ (r + np.outer(t, n_pl) / d) @ np.linalg.inv(kmat)

            rs, ts, ns = decompose_homography(
                jnp.asarray(h, jnp.float32), jnp.asarray(kmat, jnp.float32),
                jnp.asarray(kmat, jnp.float32),
            )
            rs, ts, ns = np.asarray(rs), np.asarray(ts), np.asarray(ns)
            best = np.inf
            for i in range(rs.shape[0]):
                rerr = np.degrees(np.arccos(np.clip(
                    (np.trace(rs[i].T @ r) - 1) / 2, -1, 1
                )))
                tn = ts[i] / max(np.linalg.norm(ts[i]), 1e-9)
                terr = np.degrees(np.arccos(np.clip(
                    abs(np.dot(tn, t)), -1, 1
                )))
                best = min(best, max(rerr, terr))
            assert best < 1.0, (seed, best)


class TestQuaternionScipyFuzz:
    def test_quat_matrix_roundtrips_vs_scipy(self):
        """quat<->matrix conversions vs scipy.spatial.transform.Rotation
        (the reference's convention source: scalar-first wxyz, matching
        scipy's as_quat(scalar_first=True) / datasets' pose load)."""
        from scipy.spatial.transform import Rotation

        from comet_tpu.geometry.quaternions import (
            matrix_to_quat,
            quat_multiply,
            quat_to_matrix,
        )

        rng = np.random.default_rng(0)
        for _ in range(200):
            q = rng.normal(size=4)
            q /= np.linalg.norm(q)
            # scipy xyzw <- our wxyz
            r_scipy = Rotation.from_quat(
                np.r_[q[1:4], q[0]]
            ).as_matrix()
            r_ours = np.asarray(quat_to_matrix(jnp.asarray(q, jnp.float64)))
            np.testing.assert_allclose(r_ours, r_scipy, atol=1e-6)

            q_back = np.asarray(matrix_to_quat(jnp.asarray(r_scipy)))
            sign = np.sign(np.dot(q_back, q)) or 1.0
            np.testing.assert_allclose(q_back * sign, q, atol=1e-6)

            # composition order: quat_multiply(a, b) == R_a @ R_b
            q2 = rng.normal(size=4)
            q2 /= np.linalg.norm(q2)
            r2 = Rotation.from_quat(np.r_[q2[1:4], q2[0]]).as_matrix()
            prod = np.asarray(quat_to_matrix(quat_multiply(
                jnp.asarray(q, jnp.float64), jnp.asarray(q2, jnp.float64)
            )))
            np.testing.assert_allclose(prod, r_scipy @ r2, atol=1e-6)

    def test_euler_branch_matches_reference_formula(self):
        """euler_xyz_from_matrix vs a literal numpy transcription of the
        reference's rotationMatrixToEulerAngles (metric.py:302-324),
        including near-singular matrices."""
        from comet_tpu.geometry.quaternions import euler_xyz_from_matrix
        from scipy.spatial.transform import Rotation

        def ref(m):
            sy = np.sqrt(m[0, 0] ** 2 + m[1, 0] ** 2)
            if sy >= 1e-6:
                x = np.arctan2(m[1, 0], m[0, 0])
                y = np.arctan2(-m[2, 0], sy)
                z = np.arctan2(m[2, 1], m[2, 2])
            else:
                x = 0.0
                y = np.arctan2(-m[2, 0], sy)
                z = np.arctan2(-m[1, 2], m[1, 1])
            return np.array([x, y, z])

        rng = np.random.default_rng(1)
        mats = [Rotation.random(random_state=int(rng.integers(1 << 30))).as_matrix()
                for _ in range(150)]
        # near-gimbal-lock cases: y ~ +-90 deg
        for sgn in (+1, -1):
            mats.append(
                Rotation.from_euler("ZYX", [0.3, sgn * (np.pi / 2 - 1e-8), 0.2]
                                    ).as_matrix())
        for m in mats:
            ours = np.asarray(euler_xyz_from_matrix(jnp.asarray(m)))
            np.testing.assert_allclose(ours, ref(m), atol=1e-5)


class TestBilinearFuzz:
    def test_bilinear_sample_vs_grid_sample_random(self):
        """bilinear_sample vs torch F.grid_sample over random map sizes,
        both padding modes, coords far outside the map."""
        import torch
        import torch.nn.functional as F

        from comet_tpu.ops.bilinear import bilinear_sample

        for seed in range(30):
            rng = np.random.default_rng(seed)
            h = int(rng.integers(2, 40))
            w = int(rng.integers(2, 40))
            c = int(rng.integers(1, 8))
            n = int(rng.integers(1, 50))
            mode = ["border", "zeros"][seed % 2]
            fmap = rng.normal(size=(h, w, c)).astype(np.float32)
            pts = (
                rng.uniform(-5, max(h, w) + 5, size=(n, 2))
            ).astype(np.float32)
            ours = np.asarray(
                bilinear_sample(jnp.asarray(fmap), jnp.asarray(pts), mode)
            )
            t_in = torch.from_numpy(fmap).permute(2, 0, 1)[None]
            sizes = (h, w)
            scale = torch.tensor([2 / max(s - 1, 1) for s in reversed(sizes)])
            t_pts = torch.from_numpy(pts)[None, :, None, :] * scale - 1
            theirs = F.grid_sample(
                t_in, t_pts, align_corners=True, padding_mode=mode
            )[0, :, :, 0].T.numpy()
            np.testing.assert_allclose(ours, theirs, atol=2e-5,
                                       err_msg=f"seed={seed} mode={mode}")
