"""Golden-value tests for geometry: quaternions, embeddings, codecs.

Quaternion math is validated against scipy.spatial.transform.Rotation;
codecs against the formulas of comet/models/utils.py:631-688 / 312-403.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

import jax
import jax.numpy as jnp

from comet_tpu.geometry import (
    quat_multiply,
    quat_invert,
    quat_to_matrix,
    matrix_to_quat,
    quat_normalize,
    random_quaternions,
    se3_matrix_row_convention,
    se3_inverse_row_convention,
    euler_xyz_from_matrix,
    sincos_1d_from_grid,
    sincos_2d_pos_embed,
    embed_2d_coords,
    harmonic_embedding,
    make_camera_set,
    encode_relative_uvz,
    decode_relative_uvz,
    encode_relative_xyz,
    decode_relative_xyz,
    INTRINSICS_TABLE,
)


def _random_unit_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestQuaternions:
    def test_quat_to_matrix_matches_scipy(self, rng):
        q = _random_unit_quats(rng, 32)
        ours = np.asarray(quat_to_matrix(jnp.asarray(q)))
        # scipy wants xyzw
        theirs = R.from_quat(q[:, [1, 2, 3, 0]]).as_matrix()
        np.testing.assert_allclose(ours, theirs, atol=1e-6)

    def test_matrix_to_quat_roundtrip(self, rng):
        q = _random_unit_quats(rng, 64)
        q_rt = np.asarray(matrix_to_quat(quat_to_matrix(jnp.asarray(q))))
        # sign-invariant comparison
        dot = np.abs(np.sum(q_rt * q, axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_multiply_matches_matrix_product(self, rng):
        qa = jnp.asarray(_random_unit_quats(rng, 16))
        qb = jnp.asarray(_random_unit_quats(rng, 16))
        lhs = np.asarray(quat_to_matrix(quat_multiply(qa, qb)))
        rhs = np.asarray(quat_to_matrix(qa) @ quat_to_matrix(qb))
        np.testing.assert_allclose(lhs, rhs, atol=1e-5)

    def test_invert(self, rng):
        q = jnp.asarray(_random_unit_quats(rng, 8))
        ident = np.asarray(quat_multiply(q, quat_invert(q)))
        expected = np.tile([1.0, 0, 0, 0], (8, 1))
        np.testing.assert_allclose(np.abs(ident), np.abs(expected), atol=1e-6)

    def test_se3_row_convention_and_inverse(self, rng):
        q = jnp.asarray(_random_unit_quats(rng, 8))
        t = jnp.asarray(rng.normal(size=(8, 3)))
        m = se3_matrix_row_convention(quat_to_matrix(q), t)
        minv = se3_inverse_row_convention(m)
        ident = np.asarray(jnp.einsum("nij,njk->nik", m, minv))
        np.testing.assert_allclose(ident, np.tile(np.eye(4), (8, 1, 1)), atol=1e-5)
        # row convention: x_cam = x_world @ R + T
        x = rng.normal(size=(8, 3))
        xh = np.concatenate([x, np.ones((8, 1))], axis=1)
        out = np.einsum("ni,nij->nj", xh, np.asarray(m))[:, :3]
        expected = np.einsum("ni,nij->nj", x, np.asarray(quat_to_matrix(q))) + np.asarray(t)
        np.testing.assert_allclose(out, expected, atol=1e-5)

    def test_euler_xyz_formula(self, rng):
        # against the explicit reference formula on random rotations
        q = _random_unit_quats(rng, 32)
        m = np.asarray(quat_to_matrix(jnp.asarray(q)))
        ours = np.asarray(euler_xyz_from_matrix(jnp.asarray(m)))
        for i in range(32):
            mm = m[i]
            sy = np.sqrt(mm[0, 0] ** 2 + mm[1, 0] ** 2)
            assert sy >= 1e-6  # random rotations essentially never singular
            z = np.arctan2(mm[2, 1], mm[2, 2])
            y = np.arctan2(-mm[2, 0], sy)
            x = np.arctan2(mm[1, 0], mm[0, 0])
            np.testing.assert_allclose(ours[i], [x, y, z], atol=1e-6)


class TestEmbeddings:
    def test_sincos_1d_shapes_and_values(self):
        emb = np.asarray(sincos_1d_from_grid(8, jnp.arange(5)))
        assert emb.shape == (5, 8)
        # position 0: sin=0, cos=1
        np.testing.assert_allclose(emb[0, :4], 0.0, atol=1e-7)
        np.testing.assert_allclose(emb[0, 4:], 1.0, atol=1e-7)
        # omega_0 = 1 -> first channel is sin(pos)
        np.testing.assert_allclose(emb[:, 0], np.sin(np.arange(5)), atol=1e-6)

    def test_sincos_2d_layout(self):
        emb = np.asarray(sincos_2d_pos_embed(8, (3, 4)))
        assert emb.shape == (12, 8)
        # first half encodes x (varies fastest along flattened w axis)
        np.testing.assert_allclose(emb[0], emb[4][:8] * 0 + emb[0], atol=0)
        # row 0 and row 1 at same x must share the x-half
        np.testing.assert_allclose(emb[1][:4], emb[1 + 4][:4], atol=1e-7)
        # and differ in the y-half
        assert not np.allclose(emb[1][4:], emb[1 + 4][4:])

    def test_embed_2d_coords(self):
        xy = jnp.asarray([[[1.5, -2.0]]])
        out = np.asarray(embed_2d_coords(xy, 4, cat_coords=True))
        assert out.shape == (1, 1, 10)  # 2 + 2*4
        div = np.arange(0, 4, 2) * (1000.0 / 4)
        expect_x = np.empty(4)
        expect_x[0::2] = np.sin(1.5 * div)
        expect_x[1::2] = np.cos(1.5 * div)
        np.testing.assert_allclose(out[0, 0, 2:6], expect_x, atol=1e-5)

    def test_harmonic_embedding(self):
        x = jnp.asarray([[0.5, 1.0]])
        out = np.asarray(harmonic_embedding(x, n_harmonic_functions=3, append_input=True))
        assert out.shape == (1, 2 * 2 * 3 + 2)
        freqs = 2.0 ** np.arange(3)
        expect_sin = np.sin(np.concatenate([0.5 * freqs, 1.0 * freqs]))
        np.testing.assert_allclose(out[0, :6], expect_sin, atol=1e-6)


class TestCodecs:
    def _cams(self, rng, s=6):
        q = _random_unit_quats(rng, s)
        t_xyz = rng.normal(size=(s, 3))
        t_uvz = rng.normal(size=(s, 3))
        t_uvz[:, 2] = np.abs(t_uvz[:, 2]) + 1.0  # positive depth
        return make_camera_set(
            q=q, t_xyz=t_xyz, t_uvz=t_uvz,
            focal=np.full((s, 2), 2.0), pp=np.zeros((s, 2)), ratio=0.5,
        )

    def test_uvz_roundtrip(self, rng):
        cams = self._cams(rng)
        enc = encode_relative_uvz(cams)
        assert enc.shape == (6, 8)
        np.testing.assert_allclose(np.asarray(enc[0, :7]), [0, 0, 0, 1, 0, 0, 0], atol=1e-6)
        q_abs, t_abs = decode_relative_uvz(enc[None], cams, INTRINSICS_TABLE["AMD"])
        # decode reconstructs u, v, d; with AMD intrinsics t_xyz won't match
        # the random t_xyz, but d (=z) must round-trip exactly
        np.testing.assert_allclose(
            np.asarray(t_abs[0, :, 2]), np.asarray(cams.t_uvz[:, 2]), rtol=1e-5
        )
        # and quaternions must reconstruct the absolute rotation (up to sign)
        dot = np.abs(np.sum(np.asarray(q_abs[0]) * np.asarray(cams.q), axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_uvz_matches_reference_formula(self, rng):
        cams = self._cams(rng)
        enc = np.asarray(encode_relative_uvz(cams))
        t = np.asarray(cams.t_uvz)
        ratio = float(cams.ratio)
        for i in range(1, 6):
            np.testing.assert_allclose(enc[i, 0], (t[i, 0] - t[0, 0]) * ratio / 128.0, rtol=1e-5)
            np.testing.assert_allclose(enc[i, 1], (t[i, 1] - t[0, 1]) * ratio / 128.0, rtol=1e-5)
            np.testing.assert_allclose(enc[i, 2], (t[i, 2] / t[0, 2] - 1.0) * ratio, rtol=1e-4, atol=1e-6)

    def test_uvz_pinhole_consistency(self, rng):
        """If t_uvz is the projection of t_xyz under the dataset intrinsics,
        the decode must reproduce t_xyz exactly."""
        intr = INTRINSICS_TABLE["AMD"]
        s = 5
        q = _random_unit_quats(rng, s)
        t_xyz = rng.normal(size=(s, 3))
        t_xyz[:, 2] = np.abs(t_xyz[:, 2]) + 2.0
        u = (intr.fx * t_xyz[:, 0] + intr.cx * t_xyz[:, 2]) / t_xyz[:, 2]
        v = (intr.fy * t_xyz[:, 1] + intr.cy * t_xyz[:, 2]) / t_xyz[:, 2]
        t_uvz = np.stack([u, v, t_xyz[:, 2]], axis=-1)
        cams = make_camera_set(q=q, t_xyz=t_xyz, t_uvz=t_uvz, ratio=0.7)
        enc = encode_relative_uvz(cams)
        _, t_dec = decode_relative_uvz(enc[None], cams, intr)
        np.testing.assert_allclose(np.asarray(t_dec[0]), t_xyz, rtol=1e-4, atol=1e-5)

    def test_xyz_roundtrip(self, rng):
        cams = self._cams(rng)
        enc = encode_relative_xyz(cams)
        assert enc.shape == (6, 7)
        q_abs, t_abs = decode_relative_xyz(enc[None], cams)
        np.testing.assert_allclose(np.asarray(t_abs[0]), np.asarray(cams.t_xyz), atol=1e-5)
        dot = np.abs(np.sum(np.asarray(q_abs[0]) * np.asarray(cams.q), axis=-1))
        np.testing.assert_allclose(dot, 1.0, atol=1e-5)

    def test_codecs_jit(self, rng):
        cams = self._cams(rng)
        enc = jax.jit(encode_relative_uvz)(cams)
        assert enc.shape == (6, 8)
