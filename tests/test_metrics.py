"""Tests for float64 eval metrics against hand-built golden cases and, where
available, torch-based recomputation of the reference formulas."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as R

from comet_tpu.metrics import (
    pairwise_se3_errors,
    relative_frame_errors,
    auc_histogram,
    auc_from_histogram_prefix,
    all_pairs_indices,
    rotation_angle_deg,
    translation_angle_deg,
    quat_to_matrix_np,
)


def _rand_quats(rng, n):
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


class TestPairwise:
    def test_perfect_prediction_is_zero_error(self, rng):
        q = _rand_quats(rng, 8)
        t = rng.normal(size=(8, 3))
        out = pairwise_se3_errors(q, t, q, t, batch_size=1)
        assert out["rel_rangle_deg"].shape == (28,)
        np.testing.assert_allclose(out["rel_rangle_deg"], 0.0, atol=1e-4)
        np.testing.assert_allclose(out["T_rmse_x1e3"], 0.0, atol=1e-6)

    def test_known_rotation_offset(self, rng):
        # gt: identity everywhere; pred: frame k rotated by k*2 deg about z.
        s = 4
        angles = np.arange(s) * 2.0
        q_pred = R.from_euler("z", angles[:, None], degrees=True).as_quat()[:, [3, 0, 1, 2]]
        q_gt = np.tile([1.0, 0, 0, 0], (s, 1))
        t = rng.normal(size=(s, 3))
        out = pairwise_se3_errors(q_pred, t, q_gt, t, batch_size=1)
        i1, i2 = all_pairs_indices(1, s)
        expected = np.abs(angles[i2] - angles[i1])
        np.testing.assert_allclose(out["rel_rangle_deg"], expected, atol=1e-4)

    def test_t_rmse(self):
        q = np.tile([1.0, 0, 0, 0], (2, 1))
        t_gt = np.zeros((2, 3))
        t_pred = np.array([[0.003, 0.0, 0.0], [0.0, 0.004, 0.0]])
        out = pairwise_se3_errors(q, t_pred, q, t_gt, batch_size=1)
        expected = np.sqrt((0.003**2 + 0.004**2) / 2) * 1e3
        np.testing.assert_allclose(out["T_rmse_x1e3"], expected, rtol=1e-6)
        np.testing.assert_allclose(out["X_rmse_x1e3"], np.sqrt(0.003**2 / 2) * 1e3, rtol=1e-6)


class TestRelativeFrame:
    def test_euler_error_and_acc(self):
        s = 5
        # error rotations: about x by [0, 2, 4, 6, 8] degrees
        angles = np.arange(s) * 2.0
        q_pred = R.from_euler("x", angles[:, None], degrees=True).as_quat()[:, [3, 0, 1, 2]]
        q_gt = np.tile([1.0, 0, 0, 0], (s, 1))
        enc_pred = np.concatenate([np.ones((s, 3)), q_pred], axis=1)
        enc_gt = np.concatenate([np.ones((s, 3)), q_gt], axis=1)
        out = relative_frame_errors(enc_pred, enc_gt)
        np.testing.assert_allclose(out["rel_rangle_deg"], angles, atol=1e-5)
        # error euler x = angle (up to sign conventions of the formula)
        np.testing.assert_allclose(out["error_euler_xyz"][2], angles.mean(), atol=1e-5)
        # acc@5: angles 0,2,4 under 5 deg -> 3/5 on the rotated axis
        assert out["acc_at_5deg_xyz"][2] == pytest.approx(3 / 5)
        assert out["acc_at_5deg_xyz"][0] == pytest.approx(1.0)

    def test_axis_mapping_matches_reference_consumer(self):
        """The harness maps predictions['X_err'] = error_euler[2]
        (train_eval_func_new_cp5.py:644-646) — verify a rotation about the
        x-axis shows up in error_euler[2] with our formula ordering."""
        q_pred = R.from_euler("x", [[3.0]], degrees=True).as_quat()[:, [3, 0, 1, 2]]
        enc_pred = np.concatenate([np.zeros((1, 3)), q_pred], axis=1)
        enc_gt = np.array([[0, 0, 0, 1.0, 0, 0, 0]])
        out = relative_frame_errors(enc_pred, enc_gt)
        # euler order in euler_xyz_from_matrix is [x_formula, y, z_formula]
        # where z_formula=atan2(m21,m22) captures rotation about x.
        np.testing.assert_allclose(out["error_euler_xyz"][2], 3.0, atol=1e-5)


class TestAuc:
    def test_auc_all_zero_errors(self):
        r = np.zeros(100)
        t = np.zeros(100)
        auc, hist = auc_histogram(r, t, 30)
        assert auc == pytest.approx(1.0)
        assert hist[0] == pytest.approx(1.0)

    def test_auc_all_above_threshold(self):
        r = np.full(10, 100.0)
        t = np.full(10, 100.0)
        auc, hist = auc_histogram(r, t, 30)
        assert auc == pytest.approx(0.0)

    def test_auc_prefix(self):
        r = np.array([0.5, 10.5, 40.0])
        t = np.array([0.1, 0.1, 0.1])
        auc, hist = auc_histogram(r, t, 30)
        a10 = auc_from_histogram_prefix(hist, 10)
        assert 0.0 < a10 < 1.0


class TestAngles:
    def test_translation_angle_ambiguity(self):
        a = np.array([[1.0, 0, 0]])
        b = np.array([[-1.0, 0, 0]])
        # antipodal directions count as aligned (ambiguity=True)
        assert translation_angle_deg(a, b)[0] == pytest.approx(0.0, abs=1e-3)

    def test_rotation_angle_deg(self):
        r1 = quat_to_matrix_np(np.array([[1.0, 0, 0, 0]]))
        q = R.from_euler("y", [[7.0]], degrees=True).as_quat()[:, [3, 0, 1, 2]]
        r2 = quat_to_matrix_np(q)
        assert rotation_angle_deg(r1, r2)[0] == pytest.approx(7.0, abs=1e-4)
