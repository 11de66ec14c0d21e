"""COLMAP sparse-model interchange (utils/colmap_io.py).

Parity target: the reference's pycolmap bridge semantics
(comet/utils/tensor_to_pycolmap.py:16,163) — >=2-observation track
filter, max_points3D_val observation suppression, 1-based point ids,
shared-camera option, SIMPLE_PINHOLE/PINHOLE/SIMPLE_RADIAL models —
serialized through COLMAP's standard text model instead of pycolmap
objects, and parsed back to batched arrays.
"""

import numpy as np
import pytest

from comet_tpu.geometry.quaternions import quat_to_matrix
from comet_tpu.utils.colmap_io import (
    batch_to_colmap,
    colmap_to_batch,
    read_model_text,
    scene_to_colmap,
    write_model_text,
)


@pytest.fixture
def rng():
    return np.random.default_rng(3)


def _random_batch(rng, n=4, p=12, camera_type="SIMPLE_PINHOLE"):
    points3d = rng.uniform(-2, 2, size=(p, 3))
    # random cam_from_world with orthonormal R
    exts = []
    for _ in range(n):
        a = rng.normal(size=(3, 3))
        qm, _ = np.linalg.qr(a)
        qm = qm * np.sign(np.linalg.det(qm))
        exts.append(np.concatenate([qm, rng.normal(size=(3, 1))], axis=1))
    extrinsics = np.stack(exts)
    f = 300.0 + (10.0 if camera_type == "PINHOLE" else 0.0)
    intrinsics = np.tile(
        np.array([[300.0, 0, 128.0], [0, f, 120.0], [0, 0, 1.0]]), (n, 1, 1)
    )
    tracks = rng.uniform(0, 256, size=(n, p, 2))
    masks = rng.uniform(size=(n, p)) > 0.25
    masks[:, 0] = True  # guarantee at least one fully-observed track
    return points3d, extrinsics, intrinsics, tracks, masks


class TestBridgeSemantics:
    def test_min_two_observations(self, rng):
        pts, ext, intr, trk, masks = _random_batch(rng)
        masks[:, 3] = False
        masks[0, 3] = True  # single observation -> dropped
        masks[:, 4] = False
        masks[0, 4] = masks[1, 4] = True  # two observations -> kept
        model = batch_to_colmap(pts, ext, intr, trk, masks, (256, 240))
        kept = {tuple(np.round(p.xyz, 9)) for p in model.points3d.values()}
        assert tuple(np.round(pts[4], 9)) in kept
        assert tuple(np.round(pts[3], 9)) not in kept

    def test_point_ids_start_at_one(self, rng):
        pts, ext, intr, trk, masks = _random_batch(rng)
        model = batch_to_colmap(pts, ext, intr, trk, masks, (256, 240))
        assert min(model.points3d) == 1

    def test_far_point_kept_but_unobserved(self, rng):
        # tensor_to_pycolmap.py:131-133 suppresses the *observations* of
        # out-of-range points; the 3D point itself is still added
        pts, ext, intr, trk, masks = _random_batch(rng)
        masks[:, 2] = True
        pts[2] = [5000.0, 0.0, 0.0]
        model = batch_to_colmap(
            pts, ext, intr, trk, masks, (256, 240), max_points3d_val=3000.0
        )
        far = [p for p in model.points3d.values() if p.xyz[0] == 5000.0]
        assert len(far) == 1 and far[0].track == ()
        for img in model.images.values():
            assert far[0].point3d_id not in img.point3d_ids

    def test_shared_camera_single_entry(self, rng):
        pts, ext, intr, trk, masks = _random_batch(rng)
        shared = batch_to_colmap(
            pts, ext, intr, trk, masks, (256, 240), shared_camera=True
        )
        per_frame = batch_to_colmap(pts, ext, intr, trk, masks, (256, 240))
        assert len(shared.cameras) == 1
        assert len(per_frame.cameras) == ext.shape[0]

    def test_track_elements_point_back_to_images(self, rng):
        pts, ext, intr, trk, masks = _random_batch(rng)
        model = batch_to_colmap(pts, ext, intr, trk, masks, (256, 240))
        for pt in model.points3d.values():
            for image_id, p2d_idx in pt.track:
                img = model.images[image_id]
                assert img.point3d_ids[p2d_idx] == pt.point3d_id


class TestRoundTrip:
    @pytest.mark.parametrize(
        "camera_type", ["SIMPLE_PINHOLE", "PINHOLE", "SIMPLE_RADIAL"]
    )
    def test_batch_text_batch(self, rng, tmp_path, camera_type):
        pts, ext, intr, trk, masks = _random_batch(
            rng, camera_type=camera_type
        )
        if camera_type == "SIMPLE_PINHOLE":
            intr[:, 1, 1] = intr[:, 0, 0]  # fy == fx for the 1-focal model
        extra = (
            rng.uniform(-0.1, 0.1, size=(ext.shape[0], 1))
            if camera_type == "SIMPLE_RADIAL"
            else None
        )
        model = batch_to_colmap(
            pts, ext, intr, trk, masks, (256, 240),
            camera_type=camera_type, extra_params=extra,
        )
        write_model_text(model, str(tmp_path))
        back = read_model_text(str(tmp_path))

        pts2, ext2, intr2, extra2 = colmap_to_batch(back)
        np.testing.assert_allclose(ext2, ext, atol=1e-9)
        np.testing.assert_allclose(intr2, intr, atol=1e-9)
        if camera_type == "SIMPLE_RADIAL":
            np.testing.assert_allclose(extra2, extra, atol=1e-12)
        # points come back indexed by id-1 in insertion (track) order
        valid = np.nonzero(masks.sum(0) >= 2)[0]
        np.testing.assert_allclose(pts2, pts[valid], atol=1e-12)

    def test_observations_roundtrip(self, rng, tmp_path):
        pts, ext, intr, trk, masks = _random_batch(rng)
        model = batch_to_colmap(pts, ext, intr, trk, masks, (256, 240))
        write_model_text(model, str(tmp_path))
        back = read_model_text(str(tmp_path))
        for iid, img in model.images.items():
            np.testing.assert_allclose(back.images[iid].xys, img.xys)
            np.testing.assert_array_equal(
                back.images[iid].point3d_ids, img.point3d_ids
            )
            assert back.images[iid].name == img.name
        for pid, pt in model.points3d.items():
            assert back.points3d[pid].track == pt.track


class TestSceneBridge:
    def test_scene_to_colmap_reprojects(self, rng, tmp_path):
        """reconstruct_scene output -> COLMAP model whose cameras/points
        reproject the original observations (column-convention check)."""
        import jax.numpy as jnp

        from comet_tpu.twoview.scene_ba import reconstruct_scene
        from comet_tpu.twoview.triangulation import project_points

        # small arc scene (same recipe as test_scene_ba_staged)
        s, n, f, img = 6, 24, 320.0, 256.0
        k = np.array([[f, 0, img / 2], [0, f, img / 2], [0, 0, 1]])
        pts = rng.uniform(-1, 1, size=(n, 3))
        pts[:, 2] *= 0.5
        qs, ts = [], []
        for i in range(s):
            ang = (i - s / 2) * 0.06
            q = np.array(
                [np.cos(ang / 2), 0, np.sin(ang / 2), 0], dtype=np.float64
            )
            c = np.array([np.sin(ang) * 4.0, 0.0, -np.cos(ang) * 4.0])
            r = np.asarray(quat_to_matrix(jnp.asarray(q)))
            qs.append(q)
            ts.append(-c @ r)
        q = jnp.asarray(np.stack(qs), jnp.float32)
        t = jnp.asarray(np.stack(ts), jnp.float32)
        tracks = project_points(
            jnp.asarray(pts, jnp.float32), q, t, jnp.asarray(k, jnp.float32)
        )
        vis = jnp.ones(tracks.shape[:2], jnp.float32)
        recon = reconstruct_scene(q, t, tracks, vis, jnp.asarray(k, jnp.float32))

        model = scene_to_colmap(
            recon.state.q, recon.state.t, k, np.asarray(tracks), recon,
            image_size=(int(img), int(img)),
        )
        write_model_text(model, str(tmp_path))
        back = read_model_text(str(tmp_path))

        # reproject each observation with the COLMAP-convention camera:
        # x_cam = R @ X + t
        pts3d = {pid: p.xyz for pid, p in back.points3d.items()}
        max_err = 0.0
        n_obs = 0
        for im in back.images.values():
            r = np.asarray(quat_to_matrix(jnp.asarray(im.qvec)))
            kk = back.cameras[im.camera_id].calibration_matrix()
            for (x, y), pid in zip(im.xys, im.point3d_ids):
                cam = r @ pts3d[int(pid)] + im.tvec
                uv = (kk @ cam)[:2] / cam[2]
                max_err = max(max_err, float(np.abs(uv - [x, y]).max()))
                n_obs += 1
        assert n_obs > s * n * 0.8
        assert max_err < 1.0, f"reprojection error {max_err}"
