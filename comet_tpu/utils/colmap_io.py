"""COLMAP sparse-model interchange (standard text format).

TPU-native replacement for the reference's pycolmap object bridge
(comet/utils/tensor_to_pycolmap.py:16 ``batch_matrix_to_pycolmap``,
:163 ``pycolmap_to_batch_matrix``). The reference converts batched
tensors into in-process ``pycolmap.Reconstruction`` objects so COLMAP's
C++ bundle adjuster can run on them; here BA is in-graph
(``twoview/scene_ba.py``), so the bridge's remaining job is
*interchange*: getting a reconstruction into/out of the COLMAP
ecosystem (colmap gui, MVS densification, nerf/3dgs pipelines). This
module therefore serializes to COLMAP's standard on-disk text model —
``cameras.txt`` / ``images.txt`` / ``points3D.txt`` — which those tools
consume directly, and parses the same format back to batched arrays.

Bridge semantics preserved from the reference:

- a track becomes a 3D point only with >= 2 inlier observations
  (tensor_to_pycolmap.py:62-63);
- observations of points with any ``|coord| >= max_points3D_val`` are
  suppressed (tensor_to_pycolmap.py:131-133);
- point3D ids start at 1 (tensor_to_pycolmap.py:127);
- camera models SIMPLE_PINHOLE (f, cx, cy), PINHOLE (fx, fy, cx, cy),
  SIMPLE_RADIAL (f, cx, cy, k); optionally one shared camera
  (tensor_to_pycolmap.py:74-110);
- extrinsics are cam_from_world: ``x_cam = R @ x_world + t``; COLMAP
  stores the rotation as a wxyz quaternion, which matches this
  package's quaternion convention.
"""

from __future__ import annotations

import os
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np

from ..geometry.quaternions import quat_to_matrix

def _np_matrix_to_quat(m: np.ndarray) -> np.ndarray:
    """Rotation matrix [3,3] -> wxyz quaternion in float64 (the jax
    geometry ops run float32 by default; interchange wants full
    precision, so this IO module keeps its own host-side converter)."""
    m = np.asarray(m, dtype=np.float64)
    t = np.trace(m)
    if t > 0:
        s = np.sqrt(t + 1.0) * 2
        return np.array(
            [
                0.25 * s,
                (m[2, 1] - m[1, 2]) / s,
                (m[0, 2] - m[2, 0]) / s,
                (m[1, 0] - m[0, 1]) / s,
            ]
        )
    i = int(np.argmax(np.diag(m)))
    j, k = (i + 1) % 3, (i + 2) % 3
    s = np.sqrt(max(m[i, i] - m[j, j] - m[k, k] + 1.0, 0.0)) * 2
    q = np.empty(4)
    q[0] = (m[k, j] - m[j, k]) / s
    q[1 + i] = 0.25 * s
    q[1 + j] = (m[j, i] + m[i, j]) / s
    q[1 + k] = (m[k, i] + m[i, k]) / s
    return q


def _np_quat_to_matrix(q: np.ndarray) -> np.ndarray:
    """wxyz quaternion -> rotation matrix [3,3] in float64."""
    w, x, y, z = np.asarray(q, dtype=np.float64) / np.linalg.norm(q)
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )

CAMERA_MODEL_PARAMS = {
    "SIMPLE_PINHOLE": 3,  # f, cx, cy
    "PINHOLE": 4,  # fx, fy, cx, cy
    "SIMPLE_RADIAL": 4,  # f, cx, cy, k
}


class ColmapCamera(NamedTuple):
    camera_id: int
    model: str
    width: int
    height: int
    params: Tuple[float, ...]

    def calibration_matrix(self) -> np.ndarray:
        if self.model == "PINHOLE":
            fx, fy, cx, cy = self.params
        elif self.model in ("SIMPLE_PINHOLE", "SIMPLE_RADIAL"):
            fx, cx, cy = self.params[:3]
            fy = fx
        else:
            raise ValueError(f"unsupported camera model {self.model}")
        return np.array(
            [[fx, 0.0, cx], [0.0, fy, cy], [0.0, 0.0, 1.0]], dtype=np.float64
        )


class ColmapImage(NamedTuple):
    image_id: int
    qvec: np.ndarray  # [4] wxyz, cam_from_world
    tvec: np.ndarray  # [3]
    camera_id: int
    name: str
    xys: np.ndarray  # [M, 2]
    point3d_ids: np.ndarray  # [M] int64, -1 = no 3D point


class ColmapPoint3D(NamedTuple):
    point3d_id: int
    xyz: np.ndarray  # [3]
    rgb: np.ndarray  # [3] uint8
    error: float
    track: Tuple[Tuple[int, int], ...]  # (image_id, point2d_idx)


class ColmapModel(NamedTuple):
    cameras: Dict[int, ColmapCamera]
    images: Dict[int, ColmapImage]
    points3d: Dict[int, ColmapPoint3D]


def _camera_params(
    model: str, k: np.ndarray, extra: Optional[np.ndarray]
) -> Tuple[float, ...]:
    fx, fy = float(k[0, 0]), float(k[1, 1])
    cx, cy = float(k[0, 2]), float(k[1, 2])
    if model == "SIMPLE_PINHOLE":
        return (fx, cx, cy)
    if model == "PINHOLE":
        return (fx, fy, cx, cy)
    if model == "SIMPLE_RADIAL":
        return (fx, cx, cy, float(extra[0]) if extra is not None else 0.0)
    raise ValueError(f"unsupported camera model {model}")


def batch_to_colmap(
    points3d,
    extrinsics,
    intrinsics,
    tracks,
    masks,
    image_size: Sequence[int],
    max_points3d_val: float = 3000.0,
    shared_camera: bool = False,
    camera_type: str = "SIMPLE_PINHOLE",
    extra_params=None,
    rgb=None,
    image_names: Optional[Sequence[str]] = None,
) -> ColmapModel:
    """Batched arrays -> ColmapModel (batch_matrix_to_pycolmap parity).

    points3d [P, 3]; extrinsics [N, 3, 4] cam_from_world; intrinsics
    [N, 3, 3]; tracks [N, P, 2]; masks [N, P] bool; image_size (w, h).
    """
    points3d = np.asarray(points3d, dtype=np.float64)
    extrinsics = np.asarray(extrinsics, dtype=np.float64)
    intrinsics = np.asarray(intrinsics, dtype=np.float64)
    tracks = np.asarray(tracks, dtype=np.float64)
    masks = np.asarray(masks).astype(bool)
    if extra_params is not None:
        extra_params = np.asarray(extra_params, dtype=np.float64)
    n, p, _ = tracks.shape
    if extrinsics.shape[0] != n or intrinsics.shape[0] != n:
        raise ValueError("frame-count mismatch between tracks and cameras")
    if points3d.shape[0] != p:
        raise ValueError("track-count mismatch between tracks and points3d")

    # tracks with >= 2 inlier observations become 3D points, ids 1..K
    valid_idx = np.nonzero(masks.sum(0) >= 2)[0]
    in_range = (np.abs(points3d) < max_points3d_val).all(1)
    if rgb is None:
        rgb_arr = np.zeros((p, 3), dtype=np.uint8)
    else:
        rgb_arr = np.asarray(rgb, dtype=np.uint8)

    points: Dict[int, ColmapPoint3D] = {}
    track_elems: Dict[int, List[Tuple[int, int]]] = {}
    for pid, vidx in enumerate(valid_idx, start=1):
        points[pid] = ColmapPoint3D(
            pid, points3d[vidx], rgb_arr[vidx], 0.0, ()
        )
        track_elems[pid] = []

    cameras: Dict[int, ColmapCamera] = {}
    images: Dict[int, ColmapImage] = {}
    w, h = int(image_size[0]), int(image_size[1])
    for fidx in range(n):
        cam_id = 0 if shared_camera else fidx
        if cam_id not in cameras:
            extra = extra_params[fidx] if extra_params is not None else None
            cameras[cam_id] = ColmapCamera(
                cam_id,
                camera_type,
                w,
                h,
                _camera_params(camera_type, intrinsics[fidx], extra),
            )
        r = extrinsics[fidx, :3, :3]
        qvec = _np_matrix_to_quat(r)
        tvec = extrinsics[fidx, :3, 3]

        xys: List[np.ndarray] = []
        pids: List[int] = []
        for pid, vidx in enumerate(valid_idx, start=1):
            if in_range[vidx] and masks[fidx, vidx]:
                track_elems[pid].append((fidx, len(xys)))
                xys.append(tracks[fidx, vidx])
                pids.append(pid)
        name = (
            image_names[fidx] if image_names is not None else f"image_{fidx}"
        )
        images[fidx] = ColmapImage(
            fidx,
            qvec,
            tvec,
            cam_id,
            name,
            np.array(xys, dtype=np.float64).reshape(-1, 2),
            np.array(pids, dtype=np.int64),
        )

    for pid in points:
        points[pid] = points[pid]._replace(track=tuple(track_elems[pid]))
    return ColmapModel(cameras, images, points)


def colmap_to_batch(model: ColmapModel):
    """ColmapModel -> (points3d, extrinsics, intrinsics, extra_params)
    (pycolmap_to_batch_matrix parity: points indexed by id-1 into a
    dense [max_id, 3] array; extrinsics [N, 3, 4] cam_from_world)."""
    max_id = max(model.points3d) if model.points3d else 0
    points3d = np.zeros((max_id, 3), dtype=np.float64)
    for pid, pt in model.points3d.items():
        points3d[pid - 1] = pt.xyz

    extrinsics, intrinsics, extra = [], [], []
    any_radial = False
    for image_id in sorted(model.images):
        img = model.images[image_id]
        cam = model.cameras[img.camera_id]
        r = _np_quat_to_matrix(img.qvec)
        extrinsics.append(np.concatenate([r, img.tvec[:, None]], axis=1))
        intrinsics.append(cam.calibration_matrix())
        if cam.model == "SIMPLE_RADIAL":
            any_radial = True
            extra.append([cam.params[-1]])
        else:
            extra.append([0.0])
    extrinsics = np.stack(extrinsics) if extrinsics else np.zeros((0, 3, 4))
    intrinsics = np.stack(intrinsics) if intrinsics else np.zeros((0, 3, 3))
    extra_params = np.asarray(extra) if any_radial else None
    return points3d, extrinsics, intrinsics, extra_params


# --------------------------------------------------------------------------
# Standard COLMAP text model IO (cameras.txt / images.txt / points3D.txt)
# --------------------------------------------------------------------------


def _fmt(values) -> str:
    return " ".join(repr(float(v)) for v in values)


def write_model_text(model: ColmapModel, out_dir: str) -> Tuple[str, str, str]:
    """Write the standard 3-file COLMAP text model; returns the paths."""
    os.makedirs(out_dir, exist_ok=True)
    cam_path = os.path.join(out_dir, "cameras.txt")
    with open(cam_path, "w") as f:
        f.write("# Camera list: CAMERA_ID MODEL WIDTH HEIGHT PARAMS[]\n")
        for cid in sorted(model.cameras):
            c = model.cameras[cid]
            f.write(
                f"{c.camera_id} {c.model} {c.width} {c.height} "
                f"{_fmt(c.params)}\n"
            )

    img_path = os.path.join(out_dir, "images.txt")
    with open(img_path, "w") as f:
        f.write(
            "# Image list: IMAGE_ID QW QX QY QZ TX TY TZ CAMERA_ID NAME\n"
            "#   then:     POINTS2D[] as (X Y POINT3D_ID)\n"
        )
        for iid in sorted(model.images):
            im = model.images[iid]
            f.write(
                f"{im.image_id} {_fmt(im.qvec)} {_fmt(im.tvec)} "
                f"{im.camera_id} {im.name}\n"
            )
            obs = " ".join(
                f"{repr(float(x))} {repr(float(y))} {int(pid)}"
                for (x, y), pid in zip(im.xys, im.point3d_ids)
            )
            f.write(obs + "\n")

    pts_path = os.path.join(out_dir, "points3D.txt")
    with open(pts_path, "w") as f:
        f.write(
            "# 3D point list: POINT3D_ID X Y Z R G B ERROR "
            "TRACK[] as (IMAGE_ID POINT2D_IDX)\n"
        )
        for pid in sorted(model.points3d):
            pt = model.points3d[pid]
            track = " ".join(f"{i} {j}" for i, j in pt.track)
            f.write(
                f"{pt.point3d_id} {_fmt(pt.xyz)} "
                f"{int(pt.rgb[0])} {int(pt.rgb[1])} {int(pt.rgb[2])} "
                f"{repr(float(pt.error))} {track}\n".rstrip() + "\n"
            )
    return cam_path, img_path, pts_path


def read_model_text(model_dir: str) -> ColmapModel:
    """Parse a COLMAP text model directory back into a ColmapModel."""
    cameras: Dict[int, ColmapCamera] = {}
    with open(os.path.join(model_dir, "cameras.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            cid, mdl = int(parts[0]), parts[1]
            w, h = int(parts[2]), int(parts[3])
            params = tuple(float(v) for v in parts[4:])
            if mdl in CAMERA_MODEL_PARAMS and len(params) != (
                CAMERA_MODEL_PARAMS[mdl]
            ):
                raise ValueError(
                    f"camera {cid}: {mdl} expects "
                    f"{CAMERA_MODEL_PARAMS[mdl]} params, got {len(params)}"
                )
            cameras[cid] = ColmapCamera(cid, mdl, w, h, params)

    images: Dict[int, ColmapImage] = {}
    with open(os.path.join(model_dir, "images.txt")) as f:
        lines = [
            ln.strip()
            for ln in f
            if ln.strip() and not ln.strip().startswith("#")
        ]
    for header, obs in zip(lines[0::2], lines[1::2]):
        parts = header.split()
        iid = int(parts[0])
        qvec = np.array([float(v) for v in parts[1:5]])
        tvec = np.array([float(v) for v in parts[5:8]])
        cam_id = int(parts[8])
        name = " ".join(parts[9:])
        toks = obs.split()
        xys = np.array(
            [[float(toks[i]), float(toks[i + 1])] for i in range(0, len(toks), 3)],
            dtype=np.float64,
        ).reshape(-1, 2)
        pids = np.array(
            [int(toks[i + 2]) for i in range(0, len(toks), 3)], dtype=np.int64
        )
        images[iid] = ColmapImage(iid, qvec, tvec, cam_id, name, xys, pids)

    points3d: Dict[int, ColmapPoint3D] = {}
    with open(os.path.join(model_dir, "points3D.txt")) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            parts = line.split()
            pid = int(parts[0])
            xyz = np.array([float(v) for v in parts[1:4]])
            rgb = np.array([int(v) for v in parts[4:7]], dtype=np.uint8)
            err = float(parts[7])
            rest = parts[8:]
            track = tuple(
                (int(rest[i]), int(rest[i + 1])) for i in range(0, len(rest), 2)
            )
            points3d[pid] = ColmapPoint3D(pid, xyz, rgb, err, track)
    return ColmapModel(cameras, images, points3d)


def scene_to_colmap(
    q,
    t,
    k,
    tracks,
    recon,
    image_size: Sequence[int],
    image_names: Optional[Sequence[str]] = None,
    shared_camera: bool = True,
    camera_type: str = "SIMPLE_PINHOLE",
) -> ColmapModel:
    """Convenience wiring from ``reconstruct_scene`` output: cameras
    (q wxyz, t), shared intrinsics k [3,3], tracks [S, N, 2], and the
    SceneReconstruction's valid/inlier masks.

    The scene-BA stack projects row-convention (``x_cam = x @ R + t``,
    twoview/triangulation.py:65), so COLMAP's column-convention
    cam_from_world rotation is R^T."""
    q = np.asarray(q, dtype=np.float64)
    t = np.asarray(t, dtype=np.float64)
    s = q.shape[0]
    r = np.asarray(quat_to_matrix(q), dtype=np.float64)
    extrinsics = np.concatenate(
        [np.swapaxes(r, -1, -2), t[..., None]], axis=-1
    )
    intrinsics = np.broadcast_to(np.asarray(k, dtype=np.float64), (s, 3, 3))
    masks = np.asarray(recon.inlier_mask).astype(bool) & np.asarray(
        recon.valid_tracks
    ).astype(bool)[None, :]
    return batch_to_colmap(
        np.asarray(recon.state.points),
        extrinsics,
        intrinsics,
        tracks,
        masks,
        image_size,
        shared_camera=shared_camera,
        camera_type=camera_type,
        image_names=image_names,
    )
