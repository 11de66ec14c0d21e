"""FoV / Orthographic camera family + NDC<->screen transforms + ndc_grid_sample.

Parity targets (the minipytorch3d camera family the repo carries,
VERDICT round-2 item 9):
- FoVPerspectiveCameras  (minipytorch3d/cameras.py:510-753)
- FoVOrthographicCameras (minipytorch3d/cameras.py:793-1003)
- OrthographicCameras    (minipytorch3d/cameras.py:1273, SfM convention)
- get_ndc_to_screen_transform / get_screen_to_ndc_transform
  (minipytorch3d/cameras.py:1765-1870)
- ndc_grid_sample / ndc_to_grid_sample_coords
  (minipytorch3d/renderer_utils.py:355-439)

Conventions preserved exactly: row-vector transforms (x' = [x,1] @ M, so
every matrix below is the transpose of the torch column-major K), PyTorch3D
NDC (+X left, +Y up, z in [0,1] between znear and zfar), right-handed
z_sign=+1. All functions are pure jnp and vmap/jit-safe; cameras are
NamedTuple pytrees like the rest of geometry/.
"""

from __future__ import annotations

import math
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from .quaternions import se3_matrix_row_convention
from .transforms import Transform3d


def _as_batch(x, n: int) -> jax.Array:
    x = jnp.asarray(x, jnp.float32)
    return jnp.broadcast_to(jnp.atleast_1d(x), (n,))


def fov_perspective_projection(
    znear, zfar, fov, aspect_ratio=1.0, degrees: bool = True
) -> jax.Array:
    """[N, 4, 4] row-vector FoV perspective projection matrices
    (compute_projection_matrix, cameras.py:591-641, transposed).

    Maps camera space to NDC: (max_x, max_y) -> (+1, +1); z -> [0, 1]
    between znear and zfar; w' = z (perspective divide)."""
    fov = jnp.asarray(fov, jnp.float32)
    n = max(int(jnp.size(jnp.asarray(v))) for v in (znear, zfar, fov, aspect_ratio))
    znear = _as_batch(znear, n)
    zfar = _as_batch(zfar, n)
    fov = _as_batch(fov, n)
    aspect_ratio = _as_batch(aspect_ratio, n)
    if degrees:
        fov = fov * (math.pi / 180.0)
    tan_half = jnp.tan(fov / 2.0)
    max_y = tan_half * znear
    max_x = max_y * aspect_ratio
    z = jnp.zeros((n,), jnp.float32)
    one = jnp.ones((n,), jnp.float32)
    f1 = zfar / (zfar - znear)
    f2 = -(zfar * znear) / (zfar - znear)
    # column-major K rows (as in the reference), then transpose
    k = jnp.stack(
        [
            jnp.stack([znear / max_x, z, z, z], -1),
            jnp.stack([z, znear / max_y, z, z], -1),
            jnp.stack([z, z, f1, f2], -1),
            jnp.stack([z, z, one, z], -1),
        ],
        axis=-2,
    )
    return jnp.swapaxes(k, -1, -2)


def fov_orthographic_projection(
    znear, zfar, max_y=1.0, min_y=-1.0, max_x=1.0, min_x=-1.0,
    scale_xyz=(1.0, 1.0, 1.0),
) -> jax.Array:
    """[N, 4, 4] row-vector FoV orthographic projection matrices
    (cameras.py:864-899, transposed)."""
    n = max(
        int(jnp.size(jnp.asarray(v)))
        for v in (znear, zfar, max_y, min_y, max_x, min_x)
    )
    znear = _as_batch(znear, n)
    zfar = _as_batch(zfar, n)
    max_y, min_y = _as_batch(max_y, n), _as_batch(min_y, n)
    max_x, min_x = _as_batch(max_x, n), _as_batch(min_x, n)
    scale = jnp.broadcast_to(
        jnp.asarray(scale_xyz, jnp.float32).reshape(-1, 3), (n, 3)
    )
    z = jnp.zeros((n,), jnp.float32)
    one = jnp.ones((n,), jnp.float32)
    k = jnp.stack(
        [
            jnp.stack([2.0 / (max_x - min_x) * scale[:, 0], z, z,
                       -(max_x + min_x) / (max_x - min_x)], -1),
            jnp.stack([z, 2.0 / (max_y - min_y) * scale[:, 1], z,
                       -(max_y + min_y) / (max_y - min_y)], -1),
            jnp.stack([z, z, scale[:, 2] / (zfar - znear),
                       -znear / (zfar - znear)], -1),
            jnp.stack([z, z, z, one], -1),
        ],
        axis=-2,
    )
    return jnp.swapaxes(k, -1, -2)


def sfm_calibration_matrix(
    focal: jax.Array, pp: jax.Array, orthographic: bool = False
) -> jax.Array:
    """[N, 4, 4] row-vector SfM calibration (cameras.py:1485-1559,
    transposed). Perspective: w' = z, z' = 1/z-convention slot."""
    focal = jnp.asarray(focal, jnp.float32)
    if focal.ndim == 1:
        focal = focal[:, None]
    fx, fy = focal[:, 0], jnp.broadcast_to(focal[:, -1], focal[:, 0].shape)
    pp = jnp.asarray(pp, jnp.float32)
    px, py = pp[:, 0], pp[:, 1]
    n = fx.shape[0]
    z = jnp.zeros((n,), jnp.float32)
    one = jnp.ones((n,), jnp.float32)
    if orthographic:
        k = jnp.stack(
            [
                jnp.stack([fx, z, z, px], -1),
                jnp.stack([z, fy, z, py], -1),
                jnp.stack([z, z, one, z], -1),
                jnp.stack([z, z, z, one], -1),
            ],
            axis=-2,
        )
    else:
        k = jnp.stack(
            [
                jnp.stack([fx, z, px, z], -1),
                jnp.stack([z, fy, py, z], -1),
                jnp.stack([z, z, z, one], -1),
                jnp.stack([z, z, one, z], -1),
            ],
            axis=-2,
        )
    return jnp.swapaxes(k, -1, -2)


class _FoVBase(NamedTuple):
    """Shared structure: extrinsics (row-vector R, T) + projection K."""

    r: jax.Array  # [N, 3, 3]
    t: jax.Array  # [N, 3]
    k: jax.Array  # [N, 4, 4] row-vector projection

    def world_to_view(self) -> Transform3d:
        return Transform3d(matrix=se3_matrix_row_convention(self.r, self.t))

    def projection(self) -> Transform3d:
        return Transform3d(matrix=self.k)

    def full_projection(self) -> Transform3d:
        """world -> NDC (get_full_projection_transform)."""
        return self.world_to_view().compose(self.projection())

    def transform_points(self, points: jax.Array, eps: Optional[float] = None) -> jax.Array:
        """World points [N_pts, 3] -> NDC [N_cam, N_pts, 3]."""
        pts = jnp.broadcast_to(points[None], (self.r.shape[0], *points.shape))
        return self.full_projection().transform_points(pts, eps=eps)

    def transform_points_screen(
        self, points: jax.Array, image_size: Tuple[int, int],
        with_xyflip: bool = True, eps: Optional[float] = None,
    ) -> jax.Array:
        ndc = self.transform_points(points, eps=eps)
        tr = ndc_to_screen_transform(
            self.r.shape[0], image_size, with_xyflip=with_xyflip
        )
        return tr.transform_points(ndc)


class FoVPerspectiveCameras(_FoVBase):
    """OpenGL-style FoV perspective cameras (cameras.py:510)."""

    @staticmethod
    def create(
        znear=1.0, zfar=100.0, aspect_ratio=1.0, fov=60.0, degrees=True,
        r: Optional[jax.Array] = None, t: Optional[jax.Array] = None,
    ) -> "FoVPerspectiveCameras":
        k = fov_perspective_projection(znear, zfar, fov, aspect_ratio, degrees)
        n = k.shape[0]
        r = jnp.broadcast_to(jnp.eye(3), (n, 3, 3)) if r is None else r
        t = jnp.zeros((n, 3)) if t is None else t
        return FoVPerspectiveCameras(r=r, t=t, k=k)

    def unproject_points(
        self, xy_depth: jax.Array, world_coordinates: bool = True,
        scaled_depth_input: bool = False,
    ) -> jax.Array:
        """NDC (x, y, depth) -> world/camera points (cameras.py:703-749).
        depth is world-units z unless scaled_depth_input (already [0,1])."""
        to_ndc = (
            self.full_projection() if world_coordinates else self.projection()
        )
        if scaled_depth_input:
            xy_sdepth = xy_depth
        else:
            # row-vector K: f1 = K[2,2]^T position = k[:, 2, 2],
            # f2 = column-major K[2,3] = row-vector k[:, 3, 2]
            f1 = self.k[:, 2, 2].reshape(-1, *([1] * (xy_depth.ndim - 1)))
            f2 = self.k[:, 3, 2].reshape(-1, *([1] * (xy_depth.ndim - 1)))
            sdepth = (f1 * xy_depth[..., 2:3] + f2) / xy_depth[..., 2:3]
            xy_sdepth = jnp.concatenate([xy_depth[..., :2], sdepth], axis=-1)
        inv = Transform3d(matrix=jnp.linalg.inv(to_ndc.get_matrix()))
        return inv.transform_points(xy_sdepth)


class FoVOrthographicCameras(_FoVBase):
    """OpenGL-style FoV orthographic cameras (cameras.py:793)."""

    @staticmethod
    def create(
        znear=1.0, zfar=100.0, max_y=1.0, min_y=-1.0, max_x=1.0, min_x=-1.0,
        scale_xyz=(1.0, 1.0, 1.0),
        r: Optional[jax.Array] = None, t: Optional[jax.Array] = None,
    ) -> "FoVOrthographicCameras":
        k = fov_orthographic_projection(
            znear, zfar, max_y, min_y, max_x, min_x, scale_xyz
        )
        n = k.shape[0]
        r = jnp.broadcast_to(jnp.eye(3), (n, 3, 3)) if r is None else r
        t = jnp.zeros((n, 3)) if t is None else t
        return FoVOrthographicCameras(r=r, t=t, k=k)

    def unproject_points(
        self, xy_depth: jax.Array, world_coordinates: bool = True,
        scaled_depth_input: bool = False,
    ) -> jax.Array:
        """(cameras.py:949-997): scale/mid from the K slots."""
        to_ndc = (
            self.full_projection() if world_coordinates else self.projection()
        )
        if scaled_depth_input:
            xy_sdepth = xy_depth
        else:
            mid_z = self.k[:, 3, 2].reshape(-1, *([1] * (xy_depth.ndim - 1)))
            scale_z = self.k[:, 2, 2].reshape(-1, *([1] * (xy_depth.ndim - 1)))
            sdepth = scale_z * xy_depth[..., 2:3] + mid_z
            xy_sdepth = jnp.concatenate([xy_depth[..., :2], sdepth], axis=-1)
        inv = Transform3d(matrix=jnp.linalg.inv(to_ndc.get_matrix()))
        return inv.transform_points(xy_sdepth)


class OrthographicCameras(_FoVBase):
    """SfM-convention orthographic cameras (cameras.py:1273):
    x_out = fx * x + px (no perspective divide)."""

    @staticmethod
    def create(
        focal_length=1.0, principal_point=((0.0, 0.0),),
        r: Optional[jax.Array] = None, t: Optional[jax.Array] = None,
    ) -> "OrthographicCameras":
        pp = jnp.asarray(principal_point, jnp.float32).reshape(-1, 2)
        n = pp.shape[0]
        focal = jnp.atleast_1d(jnp.asarray(focal_length, jnp.float32))
        if focal.ndim == 1:
            focal = focal[:, None]
        focal = jnp.broadcast_to(focal, (n, 2))
        k = sfm_calibration_matrix(focal, pp, orthographic=True)
        r = jnp.broadcast_to(jnp.eye(3), (n, 3, 3)) if r is None else r
        t = jnp.zeros((n, 3)) if t is None else t
        return OrthographicCameras(r=r, t=t, k=k)

    def unproject_points(
        self, xy_depth: jax.Array, world_coordinates: bool = True
    ) -> jax.Array:
        to_cam = (
            self.full_projection() if world_coordinates else self.projection()
        )
        inv = Transform3d(matrix=jnp.linalg.inv(to_cam.get_matrix()))
        return inv.transform_points(xy_depth)


def ndc_to_screen_transform(
    n: int, image_size: Tuple[int, int], with_xyflip: bool = False
) -> Transform3d:
    """PyTorch3D NDC -> screen (cameras.py:1765-1836), row-vector.

    The smaller image side maps from [-1, 1]; xyflip converts between
    (+X left, +Y up) NDC and (+X right, +Y down) screen."""
    h, w = image_size
    scale = min(h, w) / 2.0
    k = jnp.zeros((4, 4), jnp.float32)
    k = k.at[0, 0].set(scale).at[1, 1].set(scale)
    k = k.at[0, 3].set(-w / 2.0).at[1, 3].set(-h / 2.0)
    k = k.at[2, 2].set(1.0).at[3, 3].set(1.0)
    m = jnp.broadcast_to(k.T, (n, 4, 4))
    if with_xyflip:
        flip = jnp.diag(jnp.asarray([-1.0, -1.0, 1.0, 1.0], jnp.float32))
        m = m @ jnp.broadcast_to(flip, (n, 4, 4))
    return Transform3d(matrix=m)


def screen_to_ndc_transform(
    n: int, image_size: Tuple[int, int], with_xyflip: bool = False
) -> Transform3d:
    """Inverse of ndc_to_screen_transform (cameras.py:1838-1870)."""
    fwd = ndc_to_screen_transform(n, image_size, with_xyflip)
    return Transform3d(matrix=jnp.linalg.inv(fwd.get_matrix()))


def ndc_to_grid_sample_coords(
    xy_ndc: jax.Array, image_size_hw: Tuple[int, int]
) -> jax.Array:
    """PyTorch3D NDC -> grid_sample coords (renderer_utils.py:413-439):
    negate, then shrink the long-side axis by the aspect ratio."""
    h, w = image_size_hw
    aspect = min(h, w) / max(h, w)
    out = -xy_ndc
    if h >= w:
        out = out.at[..., 1].multiply(aspect)
    else:
        out = out.at[..., 0].multiply(aspect)
    return out


def ndc_grid_sample(
    inputs: jax.Array,  # [B, H, W, C] (channel-last, TPU layout)
    grid_ndc: jax.Array,  # [B, ..., 2] PyTorch3D NDC points
    align_corners: bool = False,
) -> jax.Array:
    """Sample feature maps at NDC locations (renderer_utils.py:355-410).

    Returns [B, ..., C]. Uses the repo's bilinear sampler with
    grid_sample "zeros" padding semantics (the torch default)."""
    from ..ops.bilinear import sample_features

    b, h, w, c = inputs.shape
    spatial = grid_ndc.shape[1:-1]
    flat = ndc_to_grid_sample_coords(
        grid_ndc.reshape(b, -1, 2), (h, w)
    )  # [-1, 1] grid_sample coords
    # grid_sample coord -> pixel coord
    if align_corners:
        px = (flat[..., 0] + 1.0) * 0.5 * (w - 1)
        py = (flat[..., 1] + 1.0) * 0.5 * (h - 1)
    else:
        px = ((flat[..., 0] + 1.0) * w - 1.0) * 0.5
        py = ((flat[..., 1] + 1.0) * h - 1.0) * 0.5
    coords = jnp.stack([px, py], axis=-1)
    out = sample_features(inputs, coords, padding_mode="zeros")  # [B, n, C]
    return out.reshape(b, *spatial, c)
