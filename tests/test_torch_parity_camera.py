"""Full CameraPredictor numerical parity vs the reference
(comet/models/camera_predictor10.py) with random weights converted by
tools/convert_torch_weights.py. Also checks the gt-encoding codec:
camera_to_pose_encoding2 (utils.py:631) vs geometry.codecs.

Slow (ViT-B forward on CPU); run with -m slow.
"""

from __future__ import annotations

import dataclasses
import importlib.util
import os
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax
import jax.numpy as jnp

import _torch_ref

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "convert_torch_weights", os.path.join(_REPO, "tools", "convert_torch_weights.py")
)
cw = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cw)

_torch_ref.install()
torch.manual_seed(0)
torch.set_grad_enabled(False)


class _RefCfg(dict):
    """OmegaConf stand-in: supports both .get(...) and attribute access."""

    def __init__(self, **kw):
        super().__init__(**kw)
        for k, v in kw.items():
            setattr(self, k, v)


def _ref_camera_cfg():
    return _RefCfg(
        weight_trans=1.0,
        weight_rot=2.0,
        train=types.SimpleNamespace(dataset="AMD"),
    )


def _gt_quaternion_cameras(rng, s):
    import train_eval_func  # the QuaternionCameras extracted in _torch_ref

    q = rng.normal(size=(s, 4)).astype(np.float32)
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    t_uvz = rng.normal(size=(s, 3)).astype(np.float32)
    t_uvz[:, 2] = np.abs(t_uvz[:, 2]) + 2.0
    t_xyz = rng.normal(size=(s, 3)).astype(np.float32)
    cams = train_eval_func.QuaternionCamerasCP5(
        R=torch.from_numpy(q),
        T_uvz=torch.from_numpy(t_uvz),
        T=torch.from_numpy(t_xyz),
        focal_length=2.0,
        ratio=torch.tensor(0.5),
    )
    return cams, q, t_uvz, t_xyz


def _run_camera_parity(ref_mod, preset, monkeypatch, rng):
    from comet_tpu.config import get_config
    from comet_tpu.geometry.cameras import make_camera_set
    from comet_tpu.models.camera_predictor import CameraPredictor
    from comet_tpu.models.comet import encode_gt

    down_size, s, n = 112, 3, 8

    dino = _torch_ref.build_torch_dinov2(img_size=down_size, depth=12)
    monkeypatch.setattr(torch.hub, "load", lambda *a, **k: dino)

    t_model = ref_mod.CameraPredictor(
        hidden_size=768, num_heads=8, mlp_ratio=4, down_size=down_size,
        att_depth=2, trunk_depth=2, backbone="dinov2b",
        cfg=_ref_camera_cfg(),
    ).eval()

    images = torch.randn(s, 3, down_size, down_size)  # pre-normalized
    traj = torch.rand(1, s, n, 2) * down_size
    conf = torch.rand(1, s, n)
    cams_t, q, t_uvz, t_xyz = _gt_quaternion_cameras(rng, s)

    out_ref = t_model(
        images, batch_size=1, gt_cameras=cams_t,
        pred_trajectories=traj, track_confidence=conf,
    )
    want_pred = out_ref["pred_pose_enc"].reshape(s, 7).numpy()
    want_gt_enc = out_ref["gt_pose_enc"].numpy()

    # --- JAX side ---
    cfg = get_config(preset)
    cfg = cfg.replace(
        compute_dtype="float32",
        camera=dataclasses.replace(
            cfg.camera, att_depth=2, trunk_depth=2, down_size=down_size,
        ),
    )
    m = CameraPredictor(
        hidden_size=768, num_heads=8, att_depth=2, trunk_depth=2,
        down_size=down_size,
        use_trajectory=cfg.camera.use_trajectory,
        use_time=cfg.camera.use_time,
        use_gapr=cfg.camera.use_gapr,
    )
    imgs_j = jnp.asarray(images.numpy().transpose(0, 2, 3, 1))[None]
    traj_j = jnp.asarray(traj.numpy())
    conf_j = jnp.asarray(conf.numpy())
    params = m.init(jax.random.PRNGKey(0), imgs_j, traj_j, conf_j)

    mapping = {
        k: (tk.lstrip("."), tf)
        for k, (tk, tf) in cw._camera_predictor("x", "", cfg).items()
    }
    mapping = {k[len("x/"):]: v for k, v in mapping.items()}
    sd = {k: v.detach().numpy() for k, v in t_model.state_dict().items()}
    flat = cw.flatten_params(params["params"])
    new = {}
    for path, tmpl in flat.items():
        assert path in mapping, f"no mapping for {path}"
        tk, tf = mapping[path]
        assert tk in sd, f"torch key {tk} missing"
        arr = tf(sd[tk]).astype(np.float32)
        assert arr.shape == tuple(tmpl.shape), (path, arr.shape, tmpl.shape)
        new[path] = arr
    params = {"params": cw.unflatten_params(new)}

    got = m.apply(params, imgs_j, traj_j, conf_j)
    got_pred = np.asarray(got.pred_pose_enc[0])

    np.testing.assert_allclose(got_pred, want_pred, atol=2e-3, rtol=2e-3)

    # gt codec parity: camera_to_pose_encoding2 vs encode_relative_uvz
    cams_j = make_camera_set(
        q=q, t_xyz=t_xyz, t_uvz=t_uvz,
        focal=np.full((s, 2), 2.0, np.float32), pp=None,
        ratio=np.float32(0.5),
    )
    got_gt_enc = np.asarray(encode_gt(cfg, cams_j))
    np.testing.assert_allclose(got_gt_enc, want_gt_enc, atol=1e-5, rtol=1e-5)


def test_camera_predictor_full_parity(monkeypatch, rng):
    from models import camera_predictor10 as ref_mod

    _run_camera_parity(ref_mod, "ours", monkeypatch, rng)


@pytest.mark.parametrize(
    "variant", ["abl_track", "abl_time", "abl_uvz", "abl_all"]
)
def test_camera_predictor_ablation_parity(monkeypatch, rng, variant):
    """Each ablation preset vs ITS OWN reference module
    (comet/models/camera_predictor_abl_{track,time,uvz,all}.py) — the 4
    flag combinations are separate 600+-line file clones in the
    reference; here one flax module must reproduce each numerically."""
    import importlib

    ref_mod = importlib.import_module(f"models.camera_predictor_{variant}")
    _run_camera_parity(ref_mod, variant, monkeypatch, rng)
