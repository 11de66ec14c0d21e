"""absT_quaR_OneFL codec + get_EFP + PoseEmbedding parity vs the
reference's comet/models/utils.py (imported read-only via _torch_ref)."""

import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import _torch_ref

_torch_ref.install()

from comet_tpu.geometry.cameras import make_camera_set
from comet_tpu.geometry.codecs import (
    create_intri_matrix,
    decode_abst_quar_onefl,
    encode_abst_quar_onefl,
    get_efp,
)


def _ref_utils():
    from models import utils as ref

    return ref


def _cams(rng, s=5):
    q = rng.normal(size=(s, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    q *= np.sign(q[:, :1] + 1e-12)  # standardized (w >= 0)
    t = rng.normal(size=(s, 3)).astype(np.float32)
    focal = rng.uniform(0.5, 3.0, (s, 2)).astype(np.float32)
    return q, t, focal


class TestCodec1:
    def test_encode_matches_reference(self, rng):
        ref = _ref_utils()
        q, t, focal = _cams(rng)
        cam = types.SimpleNamespace(
            R=torch.tensor(q), T=torch.tensor(t),
            focal_length=torch.tensor(focal),
        )
        want = ref.camera_to_pose_encoding(cam).numpy()

        cams = make_camera_set(
            q=q, t_xyz=t, t_uvz=t, focal=focal, pp=None, ratio=np.float32(1.0)
        )
        got = np.asarray(encode_abst_quar_onefl(cams))
        np.testing.assert_allclose(got, want, atol=1e-6)

    def test_decode_matches_reference(self, rng):
        ref = _ref_utils()
        q, t, focal = _cams(rng)
        enc = rng.normal(size=(1, 5, 8)).astype(np.float32)
        gt = types.SimpleNamespace(
            R=torch.tensor(q), T=torch.tensor(t),
            focal_length=torch.tensor(focal),
        )
        want = ref.pose_encoding_to_camera(
            torch.tensor(enc), gt_cameras=gt
        )
        cams = make_camera_set(
            q=q, t_xyz=t, t_uvz=t, focal=focal, pp=None, ratio=np.float32(1.0)
        )
        q_abs, t_abs, fl = decode_abst_quar_onefl(jnp.asarray(enc[0]), cams)
        np.testing.assert_allclose(np.asarray(q_abs), want.R.numpy(), atol=1e-6)
        np.testing.assert_allclose(np.asarray(t_abs), want.T.numpy(), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(fl), want.focal_length.numpy(), atol=1e-6
        )

    def test_roundtrip(self, rng):
        q, t, focal = _cams(rng)
        cams = make_camera_set(
            q=q, t_xyz=t, t_uvz=t, focal=focal, pp=None, ratio=np.float32(1.0)
        )
        enc = encode_abst_quar_onefl(cams)
        q_abs, t_abs, fl = decode_abst_quar_onefl(enc, cams)
        np.testing.assert_allclose(np.asarray(q_abs), q, atol=1e-5)
        np.testing.assert_allclose(np.asarray(t_abs), t, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(fl)[:, 0], np.clip(focal[:, 0], 0.1, 30.0), atol=1e-6
        )


class TestGetEFP:
    @pytest.mark.parametrize("default_focal", [False, True])
    def test_matches_reference(self, rng, default_focal):
        ref = _ref_utils()
        b, s = 1, 4
        from scipy.spatial.transform import Rotation

        r = Rotation.random(b * s, rng).as_matrix().astype(np.float32)
        t = rng.normal(size=(b * s, 3)).astype(np.float32)
        focal = rng.uniform(0.1, 8.0, (b * s, 2)).astype(np.float32)
        image_size = torch.tensor([480.0, 640.0])

        pred = types.SimpleNamespace(
            R=torch.tensor(r), T=torch.tensor(t),
            focal_length=torch.tensor(focal),
        )
        want_e, want_i = ref.get_EFP(
            pred, image_size, b, s, default_focal=default_focal
        )
        got_e, got_i = get_efp(
            jnp.asarray(r), jnp.asarray(t), jnp.asarray(focal),
            jnp.asarray(image_size.numpy()), b, s, default_focal=default_focal,
        )
        np.testing.assert_allclose(np.asarray(got_e), want_e.numpy(), atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(got_i), want_i.numpy(), atol=1e-3
        )

    def test_create_intri_matrix(self, rng):
        ref = _ref_utils()
        focal = rng.uniform(10, 100, (2, 3, 2)).astype(np.float32)
        pp = rng.uniform(0, 50, (2, 3, 2)).astype(np.float32)
        want = ref.create_intri_matrix(
            torch.tensor(focal), torch.tensor(pp)
        ).numpy()
        got = np.asarray(create_intri_matrix(jnp.asarray(focal), jnp.asarray(pp)))
        np.testing.assert_allclose(got, want, atol=1e-6)


class TestPoseEmbedding:
    def test_simple_pose_embedding_parity(self, rng):
        ref = _ref_utils()
        from comet_tpu.models.blocks import PoseEmbedding

        t_mod = ref.SimplePoseEmbedding(input_dim=8, output_dim=64).eval()
        x = rng.normal(size=(6, 8)).astype(np.float32)
        with torch.no_grad():
            want = t_mod(torch.tensor(x)).numpy()

        m = PoseEmbedding(target_dim=64)
        params = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
        sd = {k: v.numpy() for k, v in t_mod.state_dict().items()}
        p = params["params"]["emb"]
        p["fc1"]["kernel"] = sd["fc1.weight"].T
        p["fc1"]["bias"] = sd["fc1.bias"]
        p["fc2"]["kernel"] = sd["fc2.weight"].T
        p["fc2"]["bias"] = sd["fc2.bias"]
        p["norm1"]["scale"] = sd["norm1.weight"]
        p["norm1"]["bias"] = sd["norm1.bias"]
        p["norm2"]["scale"] = sd["norm2.weight"]
        p["norm2"]["bias"] = sd["norm2.bias"]
        got = np.asarray(m.apply(params, jnp.asarray(x)))
        np.testing.assert_allclose(got, want, atol=2e-5)

    def test_harmonic_variant(self, rng):
        from comet_tpu.models.blocks import PoseEmbedding

        m = PoseEmbedding(learned=False, n_harmonic_functions=4,
                          append_input=True)
        x = jnp.asarray(rng.normal(size=(3, 8)).astype(np.float32))
        params = m.init(jax.random.PRNGKey(0), x)
        out = m.apply(params, x)
        assert out.shape == (3, 8 * 2 * 4 + 8)
