"""Camera containers as JAX pytrees.

Replaces the reference's ``QuaternionCameras`` class
(comet/models/train_eval_func_new_cp5.py:22-79) and the minipytorch3d
PerspectiveCameras subset it leans on. A camera set is a NamedTuple of
arrays — a pytree that flows through jit/vmap/shard_map unchanged.

Convention: rotations are wxyz quaternions; world-to-view follows the
PyTorch3D row-vector convention ``X_cam = X_world @ R + T``
(minipytorch3d/cameras.py:1566-1596).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .quaternions import quat_to_matrix, se3_matrix_row_convention


class CameraSet(NamedTuple):
    """A batch of cameras for one sequence (frames along axis 0).

    q:      [N, 4]  rotation quaternion (wxyz)
    t_xyz:  [N, 3]  metric camera translation (world units)
    t_uvz:  [N, 3]  image-plane (u, v) projection of T plus depth z
    focal:  [N, 2]  focal length (fx, fy)
    pp:     [N, 2]  principal point
    ratio:  []      crop-resize ratio (crop_size / bbox_size) from the dataset
    """

    q: jax.Array
    t_xyz: jax.Array
    t_uvz: jax.Array
    focal: jax.Array
    pp: jax.Array
    ratio: jax.Array

    @property
    def n(self) -> int:
        return self.q.shape[0]

    def rotation_matrices(self) -> jax.Array:
        return quat_to_matrix(self.q)

    def world_to_view_matrix(self) -> jax.Array:
        """Row-convention SE(3) matrices [N, 4, 4]: x_h @ M."""
        return se3_matrix_row_convention(self.rotation_matrices(), self.t_xyz)


def make_camera_set(
    q: jax.Array,
    t_xyz: jax.Array,
    t_uvz: Optional[jax.Array] = None,
    focal: Optional[jax.Array] = None,
    pp: Optional[jax.Array] = None,
    ratio: Optional[jax.Array] = None,
    dtype=jnp.float32,
) -> CameraSet:
    """Build a CameraSet with the reference's defaulting rules."""
    q = jnp.asarray(q, dtype)
    t_xyz = jnp.asarray(t_xyz, dtype)
    n = q.shape[0]
    if t_uvz is None:
        t_uvz = jnp.zeros((n, 3), dtype)
    else:
        t_uvz = jnp.asarray(t_uvz, dtype)
    if focal is None:
        focal = jnp.ones((n, 2), dtype)
    else:
        focal = jnp.asarray(focal, dtype)
        if focal.ndim == 0:
            focal = jnp.broadcast_to(focal, (n, 2))
        elif focal.ndim == 1:
            focal = jnp.broadcast_to(focal[:, None], (n, 2))
    if pp is None:
        pp = jnp.zeros((n, 2), dtype)
    else:
        pp = jnp.asarray(pp, dtype)
        if pp.ndim == 1:
            pp = jnp.broadcast_to(pp[None, :], (n, 2))
    if ratio is None:
        ratio = jnp.asarray(1.0, dtype)
    else:
        ratio = jnp.asarray(ratio, dtype).reshape(())
    return CameraSet(q=q, t_xyz=t_xyz, t_uvz=t_uvz, focal=focal, pp=pp, ratio=ratio)
