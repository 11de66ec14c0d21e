"""utils: JSON export, visualization, msgpack serialization round-trips.

Parity targets: the DCA demo JSON schema (train_eval_func_new_cp5.py:
704-753), pose-axes rendering (save_first_k_pose_images:383-511), and the
track-overlay writer (comet/models/visualizer.py:62).
"""

import json
import os

import numpy as np
import jax.numpy as jnp
import pytest


def _fake_out(s=4, n=6):
    rng = np.random.default_rng(0)
    q = rng.normal(size=(1, s, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return {
        "pred_pose_enc": jnp.asarray(rng.normal(size=(1, s, 7)).astype(np.float32)),
        "gt_pose_enc": jnp.asarray(rng.normal(size=(s, 8)).astype(np.float32)),
        "pred_q": jnp.asarray(q[0]),
        "pred_t": jnp.asarray(rng.normal(size=(s, 3)).astype(np.float32)),
        "pred_track": jnp.asarray(
            (rng.random((1, s, n, 2)) * 60).astype(np.float32)
        ),
        "track_score": jnp.asarray(rng.random((1, s, n)).astype(np.float32)),
    }


def _fake_cams(s=4):
    from comet_tpu.geometry.cameras import make_camera_set

    rng = np.random.default_rng(1)
    q = rng.normal(size=(s, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t_uvz = rng.normal(size=(s, 3)).astype(np.float32)
    t_uvz[:, 2] = np.abs(t_uvz[:, 2]) + 2.0
    return make_camera_set(
        q=q, t_xyz=rng.normal(size=(s, 3)).astype(np.float32), t_uvz=t_uvz,
        focal=np.full((s, 2), 2.0, np.float32), pp=None, ratio=np.float32(0.5),
    )


class TestExport:
    def test_sequence_json_schema(self, tmp_path):
        from comet_tpu.utils.export import export_sequence_json

        out = _fake_out()
        cams = _fake_cams()
        path = export_sequence_json(
            str(tmp_path), "seq_7", out, cams, {"R_avg": 1.5, "Auc_30": 0.5}
        )
        assert os.path.exists(path)
        data = json.load(open(path))
        # schema keys of the reference demo export
        # (train_eval_func_new_cp5.py:719-746)
        for key in ("sequence_name", "trajectory", "metrics"):
            assert key in data, data.keys()
        assert data["sequence_name"] == "seq_7"
        assert len(data["trajectory"]) == 4
        f0 = data["trajectory"][0]
        assert f0["frame_idx"] == 0
        for side in ("pred", "gt"):
            assert "R_quat" in f0[side] and len(f0[side]["R_quat"]) == 4
            assert "T" in f0[side] and len(f0[side]["T"]) == 3
            assert np.isfinite(np.asarray(f0[side]["R_quat"])).all()


class TestVisualize:
    def test_draw_tracks_and_video(self, tmp_path):
        from comet_tpu.utils.visualize import (
            draw_tracks_on_frames,
            save_track_video,
        )

        rng = np.random.default_rng(0)
        frames = (rng.random((3, 48, 48, 3)) * 255).astype(np.uint8)
        tracks = (rng.random((3, 5, 2)) * 40 + 4).astype(np.float32)
        drawn = draw_tracks_on_frames(frames, tracks)
        assert drawn.shape == frames.shape and drawn.dtype == np.uint8
        assert (drawn != frames).any()  # something was drawn
        path = save_track_video(frames, tracks, str(tmp_path / "trk.mp4"))
        assert os.path.exists(path) and os.path.getsize(path) > 0

    def test_pose_axes_rendering(self, tmp_path):
        from comet_tpu.utils.visualize import (
            draw_pose_axes,
            save_pose_axes_images,
        )

        rng = np.random.default_rng(0)
        frame = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        r = np.eye(3, dtype=np.float32)
        t = np.asarray([0.0, 0.0, 40.0], np.float32)
        k = np.asarray([[50.0, 0, 32], [0, 50.0, 32], [0, 0, 1]], np.float32)
        img = draw_pose_axes(frame, r, t, k)
        assert img.shape == frame.shape
        assert (img != frame).any()
        out_dir = save_pose_axes_images(
            frame[None], r[None], t[None], k, str(tmp_path / "axes")
        )
        assert os.path.exists(os.path.join(out_dir, "pose_0000.png"))


class TestSerialization:
    def test_msgpack_roundtrip(self, tmp_path):
        from comet_tpu.utils.serialization import (
            load_params_msgpack,
            save_params_msgpack,
        )

        params = {
            "params": {
                "dense": {"kernel": jnp.arange(6.0).reshape(2, 3)},
                "bias": jnp.zeros((3,)),
            }
        }
        p = str(tmp_path / "w.msgpack")
        save_params_msgpack(p, params)
        template = {
            "params": {
                "dense": {"kernel": jnp.zeros((2, 3))},
                "bias": jnp.ones((3,)),
            }
        }
        loaded = load_params_msgpack(p, template)
        np.testing.assert_allclose(
            np.asarray(loaded["params"]["dense"]["kernel"]),
            np.arange(6.0).reshape(2, 3),
        )


class TestGlbSceneExport:
    def test_roundtrip_points_and_cameras(self, tmp_path):
        from comet_tpu.utils.scene_export import (
            camera_frustum_lines,
            export_glb_scene,
            parse_glb,
        )

        rng = np.random.default_rng(0)
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        cols = rng.random(size=(50, 3)).astype(np.float32)
        rs = [np.eye(3), np.diag([1.0, -1.0, -1.0])]
        ts = [np.zeros(3), np.array([0.1, 0.0, 2.0])]
        path = str(tmp_path / "scene.glb")
        export_glb_scene(path, pts, cols, rs, ts)

        gltf, blob = parse_glb(path)
        assert gltf["asset"]["version"] == "2.0"
        assert gltf["buffers"][0]["byteLength"] == len(blob)
        # 1 point mesh + 2 camera meshes
        assert len(gltf["meshes"]) == 3
        assert gltf["meshes"][0]["primitives"][0]["mode"] == 0  # POINTS
        assert gltf["meshes"][1]["primitives"][0]["mode"] == 1  # LINES
        # positions round-trip exactly through the binary buffer
        acc = gltf["accessors"][
            gltf["meshes"][0]["primitives"][0]["attributes"]["POSITION"]
        ]
        view = gltf["bufferViews"][acc["bufferView"]]
        got = np.frombuffer(
            blob[view["byteOffset"] : view["byteOffset"] + view["byteLength"]],
            np.float32,
        ).reshape(-1, 3)
        np.testing.assert_array_equal(got, pts)
        # frustum apex is the camera center -R^T T
        segs = camera_frustum_lines(rs[1], ts[1], scale=0.5)
        np.testing.assert_allclose(
            segs[0], (-rs[1].T @ ts[1]).astype(np.float32), atol=1e-6
        )

    def test_points_only(self, tmp_path):
        from comet_tpu.utils.scene_export import export_glb_scene, parse_glb

        pts = np.zeros((5, 3), np.float32)
        path = str(tmp_path / "p.glb")
        export_glb_scene(path, pts)
        gltf, _ = parse_glb(path)
        assert len(gltf["meshes"]) == 1


class TestSmallParityUtils:
    """generate_grid_samples / sample_subrange / save_query_points_image
    (comet/utils/utils.py:320,782,827 equivalents)."""

    def test_grid_samples_by_count(self):
        import numpy as np

        from comet_tpu.data.keypoints import generate_grid_samples

        pts = generate_grid_samples([10, 20, 110, 70], n=50)
        # nx = int(sqrt(50 * 2)) = 10, ny = int(50/10) = 5
        assert pts.shape == (50, 2)
        assert pts[:, 0].min() == 10 and pts[:, 0].max() == 110
        assert pts[:, 1].min() == 20 and pts[:, 1].max() == 70
        # endpoints inclusive like torch.linspace
        np.testing.assert_allclose(np.unique(pts[:, 1]), np.linspace(20, 70, 5))

    def test_grid_samples_by_interval(self):
        from comet_tpu.data.keypoints import generate_grid_samples

        pts = generate_grid_samples([[0, 0, 64, 32]], pixel_interval=16)
        assert pts.shape == (4 * 2, 2)

    def test_sample_subrange_matches_reference_behavior(self):
        from comet_tpu.twoview.align import sample_subrange

        # interior: centered window
        assert sample_subrange(100, 50, 8) == (46, 54)
        # left edge: shifted right, still length 8
        assert sample_subrange(100, 1, 8) == (0, 8)
        # right edge: shifted left
        assert sample_subrange(100, 99, 8) == (92, 100)
        # shorter sequence than window: full range
        assert sample_subrange(5, 2, 8) == (0, 5)

    def test_query_points_image(self, tmp_path):
        import numpy as np

        cv2 = pytest.importorskip("cv2")
        from comet_tpu.utils.visualize import save_query_points_image

        imgs = np.zeros((2, 32, 40, 3), np.float32)
        out = save_query_points_image(
            imgs, 1, np.array([[5.0, 6.0], [20.0, 10.0]]),
            str(tmp_path / "q.png"),
        )
        img = cv2.imread(out)
        assert img is not None and img.shape == (32, 40, 3)
        # green circle drawn (BGR)
        assert img[6, 5, 1] == 255 and img[6, 5, 0] == 0
