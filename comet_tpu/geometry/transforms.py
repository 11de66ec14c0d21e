"""Transform3d / PerspectiveCameras subset, pure jnp.

Parity targets: minipytorch3d/transform3d.py:48 (Transform3d compose /
inverse / transform_points, row-vector convention) and
minipytorch3d/cameras.py:1034 (PerspectiveCameras projection /
unprojection in screen or NDC space).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from .quaternions import se3_inverse_row_convention, se3_matrix_row_convention


class Transform3d(NamedTuple):
    """Batch of 4x4 row-vector transforms: x' = [x, 1] @ matrix."""

    matrix: jax.Array  # [..., 4, 4]

    @staticmethod
    def identity(batch=()) -> "Transform3d":
        m = jnp.broadcast_to(jnp.eye(4), (*batch, 4, 4))
        return Transform3d(matrix=m)

    @staticmethod
    def from_rotation_translation(r: jax.Array, t: jax.Array) -> "Transform3d":
        return Transform3d(matrix=se3_matrix_row_convention(r, t))

    def compose(self, other: "Transform3d") -> "Transform3d":
        """self then other: x @ M_self @ M_other."""
        return Transform3d(matrix=self.matrix @ other.matrix)

    def inverse(self) -> "Transform3d":
        return Transform3d(matrix=se3_inverse_row_convention(self.matrix))

    def transform_points(self, points: jax.Array, eps: Optional[float] = None) -> jax.Array:
        """points [..., N, 3] -> transformed [..., N, 3]."""
        ones = jnp.ones_like(points[..., :1])
        ph = jnp.concatenate([points, ones], axis=-1)
        out = jnp.einsum("...ni,...ij->...nj", ph, self.matrix)
        denom = out[..., 3:]
        if eps is not None:
            denom = jnp.where(
                jnp.abs(denom) < eps, jnp.sign(denom) * eps + (denom == 0) * eps, denom
            )
        return out[..., :3] / denom

    def transform_normals(self, normals: jax.Array) -> jax.Array:
        rot = self.matrix[..., :3, :3]
        inv_t = jnp.linalg.inv(rot)
        return jnp.einsum("...ni,...ij->...nj", normals, jnp.swapaxes(inv_t, -1, -2))

    def get_matrix(self) -> jax.Array:
        return self.matrix


class PerspectiveCameras(NamedTuple):
    """Minimal pinhole camera batch (screen-space convention).

    r: [N, 3, 3] row-vector world-to-view rotations; t: [N, 3];
    focal: [N, 2]; pp: [N, 2] principal points (pixels).
    """

    r: jax.Array
    t: jax.Array
    focal: jax.Array
    pp: jax.Array

    def world_to_view(self) -> Transform3d:
        return Transform3d.from_rotation_translation(self.r, self.t)

    def transform_points_screen(self, points: jax.Array, eps: float = 1e-8) -> jax.Array:
        """World points [N_pts, 3] per camera -> [N_cam, N_pts, 3]
        (x_pix, y_pix, depth)."""
        cam = self.world_to_view().transform_points(points[None].repeat(self.r.shape[0], 0))
        z = jnp.maximum(jnp.abs(cam[..., 2:]), eps) * jnp.sign(
            jnp.where(cam[..., 2:] == 0, 1.0, cam[..., 2:])
        )
        x = cam[..., 0:1] / z * self.focal[:, None, 0:1] + self.pp[:, None, 0:1]
        y = cam[..., 1:2] / z * self.focal[:, None, 1:2] + self.pp[:, None, 1:2]
        return jnp.concatenate([x, y, cam[..., 2:]], axis=-1)

    def unproject_points(self, xy_depth: jax.Array) -> jax.Array:
        """Screen (x, y, depth) -> world points, inverse of the above."""
        d = xy_depth[..., 2:]
        xc = (xy_depth[..., 0:1] - self.pp[:, None, 0:1]) * d / self.focal[:, None, 0:1]
        yc = (xy_depth[..., 1:2] - self.pp[:, None, 1:2]) * d / self.focal[:, None, 1:2]
        cam = jnp.concatenate([xc, yc, d], axis=-1)
        return self.world_to_view().inverse().transform_points(cam)


def iterative_undistort(
    pts: jax.Array,  # [N, 2] distorted normalized coords
    k_radial: jax.Array,  # [num_coeffs] radial distortion coefficients
    iters: int = 5,
) -> jax.Array:
    """Fixed-point iterative undistortion (comet/utils/distortion.py:27
    capability): x_u = x_d / (1 + k1 r^2 + k2 r^4 + ...)."""

    def distortion_factor(p):
        r2 = jnp.sum(p**2, axis=-1, keepdims=True)
        factor = jnp.ones_like(r2)
        rpow = r2
        for k in k_radial:
            factor = factor + k * rpow
            rpow = rpow * r2
        return factor

    def body(_, p):
        return pts / distortion_factor(p)

    return jax.lax.fori_loop(0, iters, body, pts)
