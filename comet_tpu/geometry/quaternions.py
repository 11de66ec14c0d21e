"""Quaternion and rotation-matrix math (wxyz convention), pure jnp.

Capability parity with the reference's vendored PyTorch3D subset
(/root/reference/minipytorch3d/rotation_conversions.py:43,104,418,435) and the
hand-rolled quaternion helpers in comet/models/utils.py. All functions are
shape-polymorphic over leading batch dims and safe under vmap/jit.

Quaternions are stored as (w, x, y, z). Rotation matrices act on column
vectors: ``v' = R @ v``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    """L2-normalize quaternions along the last axis."""
    return q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), eps)


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product a ⊗ b of wxyz quaternions (broadcasts)."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    """Conjugate (w, -x, -y, -z)."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_invert(q: jax.Array) -> jax.Array:
    """Inverse of a unit quaternion (== conjugate).

    Mirrors minipytorch3d ``quaternion_invert`` which assumes unit norm.
    """
    return quat_conjugate(q)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Convert wxyz quaternions [..., 4] to rotation matrices [..., 3, 3]."""
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    row0 = jnp.stack([1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy)], axis=-1)
    row1 = jnp.stack([2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx)], axis=-1)
    row2 = jnp.stack([2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy)], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Convert rotation matrices [..., 3, 3] to wxyz quaternions [..., 4].

    Branchless "largest diagonal candidate" algorithm (same numerics as
    minipytorch3d ``matrix_to_quaternion``): build the four sqrt candidates,
    pick the best-conditioned one per element via where-selects so the
    function is vmap/jit friendly and differentiable a.e.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    def _sqrt_pos(x):
        return jnp.sqrt(jnp.maximum(x, 0.0))

    q_abs = jnp.stack(
        [
            _sqrt_pos(1.0 + m00 + m11 + m22),  # |w|*2
            _sqrt_pos(1.0 + m00 - m11 - m22),  # |x|*2
            _sqrt_pos(1.0 - m00 + m11 - m22),  # |y|*2
            _sqrt_pos(1.0 - m00 - m11 + m22),  # |z|*2
        ],
        axis=-1,
    )

    # Four candidate quaternions, each exact when its pivot is largest.
    quat_by_w = jnp.stack(
        [q_abs[..., 0] ** 2, m21 - m12, m02 - m20, m10 - m01], axis=-1
    )
    quat_by_x = jnp.stack(
        [m21 - m12, q_abs[..., 1] ** 2, m10 + m01, m02 + m20], axis=-1
    )
    quat_by_y = jnp.stack(
        [m02 - m20, m10 + m01, q_abs[..., 2] ** 2, m12 + m21], axis=-1
    )
    quat_by_z = jnp.stack(
        [m10 - m01, m20 + m02, m21 + m12, q_abs[..., 3] ** 2], axis=-1
    )
    candidates = jnp.stack([quat_by_w, quat_by_x, quat_by_y, quat_by_z], axis=-2)

    flr = jnp.asarray(0.1, dtype=m.dtype)
    denom = 2.0 * jnp.maximum(flr, q_abs)[..., None]
    candidates = candidates / denom

    best = jnp.argmax(q_abs, axis=-1)
    q = jnp.take_along_axis(
        candidates, best[..., None, None].astype(jnp.int32), axis=-2
    )[..., 0, :]
    return quat_normalize(q)


def quat_standardize(q: jax.Array) -> jax.Array:
    """Flip sign so w >= 0 (canonical double-cover representative)."""
    return jnp.where(q[..., :1] < 0, -q, q)


def random_quaternions(key: jax.Array, shape=()) -> jax.Array:
    """Uniform random unit quaternions for tests."""
    q = jax.random.normal(key, (*shape, 4))
    return quat_normalize(q)


def geodesic_angle_from_matrices(r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Geodesic angle (radians) between rotation matrices [..., 3, 3].

    theta = arccos((trace(r1 r2^T) - 1) / 2), clipped to valid range —
    the formula used by the reference's metric
    (comet/models/metric.py:326-347 geodesic_distance_from_two_batches).
    """
    m = jnp.einsum("...ij,...kj->...ik", r1, r2)
    cos = (m[..., 0, 0] + m[..., 1, 1] + m[..., 2, 2] - 1.0) / 2.0
    return jnp.arccos(jnp.clip(cos, -1.0, 1.0))


def rotation_angle_from_quats(
    q1: jax.Array, q2: jax.Array, eps: float = 1e-15
) -> jax.Array:
    """Angle (degrees) between unit quaternions, sign-invariant.

    err = arccos(1 - 2 * (1 - (q1·q2)^2)) — the reference's
    ``rotation_angle`` (comet/models/metric.py:645-660).
    """
    loss_q = jnp.clip(1.0 - jnp.sum(q1 * q2, axis=-1) ** 2, eps, None)
    err = jnp.arccos(jnp.clip(1.0 - 2.0 * loss_q, -1.0, 1.0))
    return err * (180.0 / jnp.pi)


def euler_xyz_from_matrix(m: jax.Array) -> jax.Array:
    """Euler angles [..., 3] = (x, y, z) in radians from rotation matrices.

    Same decomposition as the reference's ``rotationMatrixToEulerAngles``
    (comet/models/metric.py:302-324), including the singular branch:
      sy = sqrt(m00^2 + m10^2)
      non-singular: z=atan2(m21,m22), y=atan2(-m20,sy), x=atan2(m10,m00)
      singular:     z=atan2(-m12,m11), y=atan2(-m20,sy), x=0
    Returned order is [x, y, z] as the reference stores it.
    """
    sy = jnp.sqrt(m[..., 0, 0] ** 2 + m[..., 1, 0] ** 2)
    singular = sy < 1e-6
    z = jnp.where(
        singular,
        jnp.arctan2(-m[..., 1, 2], m[..., 1, 1]),
        jnp.arctan2(m[..., 2, 1], m[..., 2, 2]),
    )
    y = jnp.arctan2(-m[..., 2, 0], sy)
    x = jnp.where(singular, 0.0, jnp.arctan2(m[..., 1, 0], m[..., 0, 0]))
    return jnp.stack([x, y, z], axis=-1)


def se3_matrix_row_convention(r: jax.Array, t: jax.Array) -> jax.Array:
    """Build PyTorch3D-style row-vector SE(3) matrices [..., 4, 4].

    X_cam = X_world @ R + T, i.e. M = [[R, 0], [T, 1]] applied as x_h @ M
    (minipytorch3d/cameras.py:1566 get_world_to_view_transform).
    """
    batch = r.shape[:-2]
    m = jnp.zeros((*batch, 4, 4), dtype=r.dtype)
    m = m.at[..., :3, :3].set(r)
    m = m.at[..., 3, :3].set(t)
    m = m.at[..., 3, 3].set(1.0)
    return m


def se3_inverse_row_convention(m: jax.Array) -> jax.Array:
    """Closed-form inverse of row-convention SE(3): [[R^T, 0], [-T R^T, 1]].

    Mirrors the reference's ``closed_form_inverse`` (metric.py:611-642).
    """
    r = m[..., :3, :3]
    t = m[..., 3:4, :3]
    r_t = jnp.swapaxes(r, -1, -2)
    new_t = -jnp.einsum("...ij,...jk->...ik", t, r_t)
    out = jnp.zeros_like(m)
    out = out.at[..., :3, :3].set(r_t)
    out = out.at[..., 3:4, :3].set(new_t)
    out = out.at[..., 3, 3].set(1.0)
    return out
