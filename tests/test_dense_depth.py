"""Dense-depth workflow (utils/dense_depth.py) + multi-query prediction
averaging (twoview/align.py)."""

import numpy as np

import jax.numpy as jnp

from comet_tpu.utils.dense_depth import (
    align_dense_depth_maps,
    align_disparity_to_sparse,
    filter_invisible_reprojections,
    ransac_linear_fit,
    read_colmap_array,
    unproject_depth_map,
    write_colmap_array,
)


class TestZBuffer:
    def test_duplicates_keep_nearest(self):
        uv = np.array([[3, 4], [3, 4], [7, 7], [3, 4]])
        depths = np.array([2.0, 1.0, 5.0, 3.0])
        mask = filter_invisible_reprojections(uv, depths)
        np.testing.assert_array_equal(mask, [False, True, True, False])

    def test_all_unique_all_kept(self):
        uv = np.arange(10).reshape(5, 2)
        assert filter_invisible_reprojections(uv, np.ones(5)).all()


class TestRansacFit:
    def test_recovers_line_under_outliers(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(0.1, 4.0, 200)
        y = 2.5 * x + 0.7
        y[::5] += rng.uniform(3, 10, 40)  # 20% gross outliers
        scale, shift, inl = ransac_linear_fit(x, y, residual_threshold=0.05)
        assert abs(scale - 2.5) < 1e-6 and abs(shift - 0.7) < 1e-6
        assert inl.sum() == 160


class TestDisparityAlignment:
    def _scene(self, scale=3.0, shift=0.2, seed=1):
        rng = np.random.default_rng(seed)
        h, w = 48, 64
        depth_gt = rng.uniform(2.0, 6.0, (h, w)).astype(np.float32)
        # monocular disparity = (1/depth - shift) / scale (inverse of the
        # alignment model target = scale*disp + shift)
        disp = ((1.0 / depth_gt) - shift) / scale
        n = 120
        us = rng.integers(0, w, n)
        vs = rng.integers(0, h, n)
        sparse = np.stack([us, vs, depth_gt[vs, us]], -1).astype(np.float64)
        return disp.astype(np.float32), sparse, depth_gt

    def test_recovers_metric_depth(self):
        disp, sparse, depth_gt = self._scene()
        out = align_disparity_to_sparse(disp, sparse)
        np.testing.assert_allclose(out, depth_gt, rtol=1e-3)

    def test_outlier_sparse_points_tolerated(self):
        disp, sparse, depth_gt = self._scene()
        bad = sparse.copy()
        bad[:12, 2] *= 10.0  # corrupt 10% of the sparse depths
        out = align_disparity_to_sparse(disp, bad)
        np.testing.assert_allclose(out, depth_gt, rtol=1e-2)

    def test_invalid_disparity_stays_invalid(self):
        disp, sparse, _ = self._scene()
        disp[:5] = 0.0  # e.g. sky
        out = align_disparity_to_sparse(disp, sparse)
        assert (out[:5] == 0).all() and (out[10:] > 0).all()

    def test_driver_dict(self):
        disp, sparse, depth_gt = self._scene()
        out = align_dense_depth_maps({"im0": sparse}, {"im0": disp})
        np.testing.assert_allclose(out["im0"], depth_gt, rtol=1e-3)


class TestUnproject:
    def test_roundtrip_projection(self):
        rng = np.random.default_rng(2)
        h, w = 24, 32
        k = np.array([[40.0, 0, 16], [0, 40.0, 12], [0, 0, 1]])
        # world->cam pose
        a = 0.1
        r = np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1.0]]
        )
        t = np.array([0.2, -0.1, 0.3])
        depth = rng.uniform(2, 5, (h, w)).astype(np.float32)
        depth[0, 0] = 0.0  # one invalid pixel
        rgb = rng.uniform(0, 1, (h, w, 3))
        pts, cols = unproject_depth_map(depth, k, r, t, rgb)
        assert pts.shape == (h * w - 1, 3) and cols.shape == (h * w - 1, 3)
        # reproject: every point lands back on its source pixel
        cam = pts @ r.T + t
        uv = (cam / cam[:, 2:]) @ k.T
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        grid = np.stack([xs.reshape(-1), ys.reshape(-1)], -1)[1:]
        np.testing.assert_allclose(uv[:, :2], grid, atol=1e-6)
        np.testing.assert_allclose(cam[:, 2], depth.reshape(-1)[1:], atol=1e-6)


class TestColmapIO:
    def test_roundtrip_2d_and_3d(self, tmp_path):
        rng = np.random.default_rng(3)
        for shape in [(5, 7), (4, 6, 3)]:
            arr = rng.normal(size=shape).astype(np.float32)
            path = str(tmp_path / f"m{len(shape)}.bin")
            write_colmap_array(arr, path)
            back = read_colmap_array(path)
            np.testing.assert_array_equal(back, arr.squeeze())

    def test_header_layout(self, tmp_path):
        arr = np.arange(6, dtype=np.float32).reshape(2, 3)
        path = str(tmp_path / "m.bin")
        write_colmap_array(arr, path)
        with open(path, "rb") as f:
            raw = f.read()
        assert raw.startswith(b"3&2&1&")  # width & height & channels
        assert len(raw) == 6 + 6 * 4  # header + f32 payload


class TestQueryAveraging:
    def _gt(self, s=6, seed=4):
        rng = np.random.default_rng(seed)
        from scipy.spatial.transform import Rotation

        r = Rotation.random(s, rng).as_matrix()
        t = rng.normal(size=(s, 3))
        # normalize to first-frame-relative ground truth
        r_rel = np.einsum("nij,kj->nik", r, r[0])
        t_rel = t - np.einsum("nij,j->ni", r_rel, t[0])
        return r, t, r_rel, t_rel

    def test_average_batch_rotations_recovers_base(self):
        from scipy.spatial.transform import Rotation

        from comet_tpu.twoview.align import average_batch_rotations

        rng = np.random.default_rng(5)
        base = Rotation.random(4, rng)
        batch = []
        for _ in range(8):
            noise = Rotation.from_rotvec(rng.normal(scale=0.02, size=(4, 3)))
            batch.append((noise * base).as_matrix())
        avg = np.asarray(average_batch_rotations(jnp.asarray(np.stack(batch))))
        err = Rotation.from_matrix(avg) * base.inv()
        assert np.abs(err.magnitude()).max() < 0.02

    def test_antipodal_representations_averaged_correctly(self):
        from comet_tpu.twoview.align import average_batch_rotations

        r = np.eye(3)[None, None].repeat(2, 0)  # two predictions, N=1
        avg = np.asarray(average_batch_rotations(jnp.asarray(r)))
        np.testing.assert_allclose(avg[0], np.eye(3), atol=1e-6)

    def test_query_averaging_beats_single_noisy_prediction(self):
        rng = np.random.default_rng(6)
        from scipy.spatial.transform import Rotation

        from comet_tpu.twoview.align import average_query_predictions

        r, t, r_rel, t_rel = self._gt()
        s = len(r)
        focal = np.full((s, 2), 2.0)
        errs = []

        def predict_fn(order):
            """Noisy oracle: GT poses of the reordered frames, with
            per-query noise (what a different query frame would give)."""
            o = np.asarray(order)
            noise = Rotation.from_rotvec(
                rng.normal(scale=0.05, size=(s, 3))
            ).as_matrix()
            r_o = np.einsum("nij,njk->nik", noise, r[o])
            errs.append(
                np.abs(Rotation.from_matrix(noise).magnitude()).mean()
            )
            return (
                jnp.asarray(r_o),
                jnp.asarray(t[o] + rng.normal(scale=0.02, size=(s, 3))),
                jnp.asarray(focal[o]),
            )

        r_avg, t_avg, f_avg, qidx = average_query_predictions(
            predict_fn, s, query_indices=[0, 2, 4, 1, 5]
        )
        assert 0 in qidx
        rot_err = np.abs(
            (
                Rotation.from_matrix(np.asarray(r_avg))
                * Rotation.from_matrix(r_rel).inv()
            ).magnitude()
        ).mean()
        # a single prediction carries ~2x the per-query noise magnitude
        # (relative-to-first composes two noisy rotations); averaging 5
        # independent queries must beat it decisively
        single_err = 2.0 * np.mean(errs)
        assert rot_err < 0.6 * single_err
        np.testing.assert_allclose(np.asarray(f_avg), focal, atol=1e-6)
        # rotation noise propagates into t_rel through R_rel @ t0
        # (~|t0| * noise magnitude / sqrt(n_queries))
        np.testing.assert_allclose(np.asarray(t_avg), t_rel, atol=0.3)
        # frame 0 is exactly identity/zero after relative normalization
        np.testing.assert_allclose(np.asarray(r_avg[0]), np.eye(3), atol=1e-5)
        np.testing.assert_allclose(np.asarray(t_avg[0]), 0.0, atol=1e-6)
