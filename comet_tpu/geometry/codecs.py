"""Relative-pose codecs (frame-0-referenced encodings), pure jnp + vmap.

Three codecs, each with an encode/decode pair:

- **uvz ("pizza") codec** — Δu, Δv in crop-normalized pixels, Δd as relative
  depth, relative quaternion. Parity with camera_to_pose_encoding2 /
  pose_encoding_to_camera2 (comet/models/utils.py:631-688, 312-403).
- **xyz codec** — ΔT = T_i − T_0 in metric space, relative quaternion.
  Parity with camera_to_pose_encoding3 / pose_encoding_to_camera3
  (utils.py:591-627, 270-310).
- **absT_quaR_OneFL codec** (the VGGSfM original) — ΔT, relative
  quaternion, one-dof clamped focal length. Parity with
  camera_to_pose_encoding / pose_encoding_to_camera (utils.py:537-588,
  211-268), plus the camera->matrix exports create_intri_matrix / get_EFP
  (utils.py:103-208).

The reference loops over frames in Python; here everything is vectorized so
the codec folds into the jitted model graph.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .cameras import CameraSet
from .quaternions import quat_invert, quat_multiply, quat_standardize


class Intrinsics(NamedTuple):
    fx: float
    fy: float
    cx: float
    cy: float


# Per-dataset intrinsics table (utils.py:355-367).
INTRINSICS_TABLE = {
    "spark": Intrinsics(1744.92206139719, 1746.58640701753, 737.272795902663, 528.471960188736),
    "AMD": Intrinsics(268.44444444, 268.44444444, 320.0, 240.0),
    "AMD_eval": Intrinsics(268.44444444, 268.44444444, 320.0, 240.0),
    "AMD_test": Intrinsics(214.75555555, 286.34074074, 256.0, 256.0),
}

# The Δu/Δv normalization constant hard-coded in the reference (256/2,
# utils.py:346-347, 678-679) irrespective of the actual crop size.
_UV_NORM = 256.0 / 2.0


def encode_relative_uvz(cams: CameraSet) -> jax.Array:
    """Encode S cameras as frame-0-relative [S, 8] = (Δu, Δv, Δd, quat, focal).

    Row 0 is the identity encoding (zeros + unit quaternion + focal).
    """
    q = cams.q
    t_uvz = cams.t_uvz
    ratio = cams.ratio
    s = q.shape[0]

    # pytorch3d quaternion_multiply standardizes (w >= 0); match it
    q_rel = quat_standardize(quat_multiply(q, quat_invert(q[0:1])))
    du = (t_uvz[:, 0] - t_uvz[0, 0]) * ratio / _UV_NORM
    dv = (t_uvz[:, 1] - t_uvz[0, 1]) * ratio / _UV_NORM
    dd = (t_uvz[:, 2] / t_uvz[0, 2] - 1.0) * ratio
    focal = jnp.clip(cams.focal[:, 0], 0.1, 30.0)

    enc = jnp.concatenate(
        [jnp.stack([du, dv, dd], axis=-1), q_rel, focal[:, None]], axis=-1
    )
    identity_row = jnp.asarray([0, 0, 0, 1, 0, 0, 0], dtype=enc.dtype)
    first = jnp.concatenate([identity_row, focal[0:1]], axis=0)
    return jnp.concatenate([first[None], enc[1:]], axis=0) if s > 1 else first[None]


def decode_relative_uvz(
    enc: jax.Array,
    ref_cams: CameraSet,
    intrinsics: Intrinsics,
) -> Tuple[jax.Array, jax.Array]:
    """Decode [*, C>=7] encodings to absolute (quat [*, 4], T_xyz [*, 3]).

    The reference frame is ``ref_cams`` row 0 (quat + t_uvz); translation is
    recovered through the pinhole model with the known per-dataset
    intrinsics: T = ((u-cx)·d/fx, (v-cy)·d/fy, d)  (utils.py:344-378).
    """
    flat = enc.reshape(-1, enc.shape[-1])
    q_ref = ref_cams.q[0]
    t_ref = ref_cams.t_uvz[0]
    ratio = ref_cams.ratio

    du = flat[:, 0] / ratio * _UV_NORM
    dv = flat[:, 1] / ratio * _UV_NORM
    dd = flat[:, 2] / ratio

    u_abs = t_ref[0] + du
    v_abs = t_ref[1] + dv
    d_abs = t_ref[2] * (dd + 1.0)

    tx = (u_abs - intrinsics.cx) * d_abs / intrinsics.fx
    ty = (v_abs - intrinsics.cy) * d_abs / intrinsics.fy
    t_abs = jnp.stack([tx, ty, d_abs], axis=-1)

    q_abs = quat_standardize(
        quat_multiply(flat[:, 3:7], jnp.broadcast_to(q_ref, flat[:, 3:7].shape))
    )
    batch = enc.shape[:-1]
    return q_abs.reshape(*batch, 4), t_abs.reshape(*batch, 3)


def encode_relative_xyz(cams: CameraSet) -> jax.Array:
    """Encode S cameras as frame-0-relative [S, 7] = (ΔT_xyz, quat)."""
    q_rel = quat_standardize(quat_multiply(cams.q, quat_invert(cams.q[0:1])))
    dt = cams.t_xyz - cams.t_xyz[0:1]
    enc = jnp.concatenate([dt, q_rel], axis=-1)
    identity_row = jnp.asarray([0, 0, 0, 1, 0, 0, 0], dtype=enc.dtype)
    return jnp.concatenate([identity_row[None], enc[1:]], axis=0)


def decode_relative_xyz(
    enc: jax.Array, ref_cams: CameraSet
) -> Tuple[jax.Array, jax.Array]:
    """Decode xyz-codec encodings to absolute (quat, T) (utils.py:270-310)."""
    flat = enc.reshape(-1, enc.shape[-1])
    q_ref = jnp.broadcast_to(ref_cams.q[0], (flat.shape[0], 4))
    t_ref = ref_cams.t_xyz[0]
    t_abs = t_ref[None, :] + flat[:, :3]
    q_abs = quat_standardize(quat_multiply(flat[:, 3:7], q_ref))
    batch = enc.shape[:-1]
    return q_abs.reshape(*batch, 4), t_abs.reshape(*batch, 3)


# ---------------------------------------------------------------------------
# absT_quaR_OneFL codec — the VGGSfM original (utils.py:211-268, 537-588)
# ---------------------------------------------------------------------------


def encode_abst_quar_onefl(
    cams: CameraSet,
    min_focal_length: float = 0.1,
    max_focal_length: float = 30.0,
) -> jax.Array:
    """[S, 8] = (ΔT_xyz, relative quat, clamped one-dof focal)
    (camera_to_pose_encoding, utils.py:537-588). Row 0 is zero
    translation + unit quaternion; the focal column carries every
    frame's own clamped focal_length[0]."""
    q_rel = quat_standardize(quat_multiply(cams.q, quat_invert(cams.q[0:1])))
    dt = cams.t_xyz - cams.t_xyz[0:1]
    focal = jnp.clip(cams.focal[:, 0], min_focal_length, max_focal_length)
    enc = jnp.concatenate([dt, q_rel, focal[:, None]], axis=-1)
    first = jnp.concatenate(
        [jnp.asarray([0, 0, 0, 1, 0, 0, 0], enc.dtype), focal[0:1]], axis=0
    )
    return jnp.concatenate([first[None], enc[1:]], axis=0)


def decode_abst_quar_onefl(
    enc: jax.Array,
    ref_cams: CameraSet,
    min_focal_length: float = 0.1,
    max_focal_length: float = 30.0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Decode absT_quaR_OneFL encodings to absolute
    (quat, T, focal) (pose_encoding_to_camera, utils.py:211-268):
    q_abs = q_rel * q_ref, T_abs = ΔT + T_ref, focal clamped."""
    flat = enc.reshape(-1, enc.shape[-1])
    q_ref = jnp.broadcast_to(ref_cams.q[0], (flat.shape[0], 4))
    t_abs = ref_cams.t_xyz[0][None, :] + flat[:, :3]
    q_abs = quat_standardize(quat_multiply(flat[:, 3:7], q_ref))
    focal = jnp.clip(flat[:, 7:8], min_focal_length, max_focal_length)
    batch = enc.shape[:-1]
    return (
        q_abs.reshape(*batch, 4),
        t_abs.reshape(*batch, 3),
        focal.reshape(*batch, 1),
    )


def create_intri_matrix(
    focal_length: jax.Array, principal_point: jax.Array
) -> jax.Array:
    """[..., 2] focal + [..., 2] principal point -> [..., 3, 3] intrinsics
    (utils.py:103-135)."""
    fx, fy = focal_length[..., 0], focal_length[..., 1]
    cx, cy = principal_point[..., 0], principal_point[..., 1]
    zero = jnp.zeros_like(fx)
    one = jnp.ones_like(fx)
    row0 = jnp.stack([fx, zero, cx], -1)
    row1 = jnp.stack([zero, fy, cy], -1)
    row2 = jnp.stack([zero, zero, one], -1)
    return jnp.stack([row0, row1, row2], -2)


def get_efp(
    r: jax.Array,  # [B*S, 3, 3] rotations
    t: jax.Array,  # [B*S, 3]
    focal_length: jax.Array,  # [B*S, 2] normalized (NDC-style) focals
    image_size: jax.Array,  # [2] (h, w) pixels
    b: int,
    s: int,
    default_focal: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Predicted cameras -> pixel-space (extrinsics [B,S,3,4],
    intrinsics [B,S,3,3]) (get_EFP, utils.py:174-208): focal scaled by
    min(image_size)/2 and clamped to [0.2, 5] x scale (or forced to
    scale with ``default_focal``), principal point at the image center,
    one-dof focal broadcast to fx=fy."""
    image_size = jnp.asarray(image_size, jnp.float32)
    scale = jnp.min(image_size)
    focal = focal_length * scale / 2.0
    pp = jnp.broadcast_to(image_size[None] / 2.0, focal.shape)
    extrinsics = jnp.concatenate([r, t[..., None]], axis=-1).reshape(b, s, 3, 4)
    focal = focal.reshape(b, s, 2)
    pp = pp.reshape(b, s, 2)
    if default_focal:
        focal = jnp.full_like(focal, scale)
    else:
        focal = jnp.broadcast_to(
            jnp.clip(focal.mean(-1, keepdims=True), 0.2 * scale, 5.0 * scale),
            focal.shape,
        )
    return extrinsics, create_intri_matrix(focal, pp)
