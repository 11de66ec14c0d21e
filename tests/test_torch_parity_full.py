"""FULL COMET numerical parity: the reference tracker + refine + camera
predictor chained exactly as E2Epose2.forward_all (E2Epose2.py:151-257)
versus our single jitted COMET module, with the whole 253.6M-param-shaped
module tree converted by tools/convert_torch_weights.build_mapping.

This is the in-environment substitute for "rotation within 0.1 deg of
best.bin": no released checkpoint exists here, so random weights stand in —
if every weight maps correctly and every op matches, ported real weights
must produce the same numbers too.

Slow; run with -m slow.
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
    def __init__(self, **kw):
        super().__init__(**kw)
        for k, v in kw.items():
            setattr(self, k, v)


def test_full_comet_parity(monkeypatch, rng):
    import torch.nn.functional as F
    from models import camera_predictor10 as ref_cam_mod
    from models.refine_track import refine_track as ref_refine_track
    from models.track_modules import base_track_predictor as ref_trk
    from models.track_modules import blocks as ref_blocks
    import train_eval_func

    from comet_tpu.config import CameraConfig, TrackerConfig, get_config
    from comet_tpu.models import COMET

    b, s, h, n = 1, 3, 64, 8
    down_size = 112

    # --- our config (small tracker dims, full-width camera head) ---
    cfg = get_config("ours").replace(
        seqlen=s, img_size=h, track_num=n, compute_dtype="float32",
        tracker=TrackerConfig(
            coarse_stride=4, coarse_down_ratio=2, coarse_corr_levels=2,
            coarse_corr_radius=2, coarse_latent_dim=16, coarse_hidden_size=32,
            coarse_depth=2, coarse_iters=2, fine_corr_levels=3,
            fine_corr_radius=2, fine_latent_dim=8, fine_hidden_size=16,
            # fine_iters=2, not the runtime 6: with RANDOM weights the
            # refinement iteration is expansive (error amplifies ~60x per
            # iteration from f32 round-off: 4e-6 @1 -> 1.3px @6, measured);
            # per-iteration semantics are identical, which is what random
            # weights can certify. Trained weights make the map contractive.
            fine_depth=2, fine_iters=2, fine_pradius=15, fine_sradius=2,
        ),
        camera=CameraConfig(
            hidden_size=768, num_heads=8, att_depth=2, trunk_depth=2,
            down_size=down_size,
        ),
    )
    tc = cfg.tracker

    # --- reference torch model, assembled like E2Epose2.__init__ ---
    ref_cfg = _RefCfg(
        MODEL=types.SimpleNamespace(
            TRACK=types.SimpleNamespace(efficient_corr=False)
        ),
        track_conf=False,
        weight_trans=1.0,
        weight_rot=2.0,
        train=types.SimpleNamespace(dataset="AMD", fix_first_cor=True),
    )

    dino = _torch_ref.build_torch_dinov2(img_size=down_size, depth=12)
    monkeypatch.setattr(torch.hub, "load", lambda *a, **k: dino)

    class TorchComet(torch.nn.Module):
        def __init__(self):
            super().__init__()
            tp = torch.nn.Module()
            tp.coarse_fnet = ref_blocks.BasicEncoder(
                3, tc.coarse_latent_dim, stride=tc.coarse_stride
            )
            tp.coarse_predictor = ref_trk.BaseTrackerPredictor(
                stride=tc.coarse_stride, corr_levels=tc.coarse_corr_levels,
                corr_radius=tc.coarse_corr_radius,
                latent_dim=tc.coarse_latent_dim,
                hidden_size=tc.coarse_hidden_size, use_spaceatt=True,
                depth=tc.coarse_depth, fine=False, cfg=ref_cfg,
            )
            tp.fine_fnet = ref_blocks.ShallowEncoder(
                3, tc.fine_latent_dim, stride=1
            )
            tp.fine_predictor = ref_trk.BaseTrackerPredictor(
                stride=1, corr_levels=tc.fine_corr_levels,
                corr_radius=tc.fine_corr_radius, latent_dim=tc.fine_latent_dim,
                hidden_size=tc.fine_hidden_size, use_spaceatt=False,
                depth=tc.fine_depth, fine=True, cfg=ref_cfg,
            )
            self.track_predictor = tp
            self.camera_predictor = ref_cam_mod.CameraPredictor(
                hidden_size=768, num_heads=8, mlp_ratio=4,
                down_size=down_size, att_depth=2, trunk_depth=2,
                backbone="dinov2b", cfg=ref_cfg,
            )

    t_model = TorchComet().eval()

    # --- inputs ---
    images_t = torch.randn(b, s, 3, h, h)
    queries_t = torch.rand(b, n, 2) * (h - 40) + 20

    qg = rng.normal(size=(s, 4)).astype(np.float32)
    qg /= np.linalg.norm(qg, axis=-1, keepdims=True)
    t_uvz = rng.normal(size=(s, 3)).astype(np.float32)
    t_uvz[:, 2] = np.abs(t_uvz[:, 2]) + 2.0
    gt_cams_t = train_eval_func.QuaternionCamerasCP5(
        R=torch.from_numpy(qg), T_uvz=torch.from_numpy(t_uvz),
        T=torch.zeros(s, 3), focal_length=2.0, ratio=torch.tensor(0.5),
    )

    # --- reference forward_all glue (E2Epose2.py:176-257) ---
    imgs_flat = images_t.reshape(b * s, 3, h, h)
    fmaps = t_model.track_predictor.coarse_fnet(
        F.interpolate(
            imgs_flat, scale_factor=0.5, mode="bilinear", align_corners=True
        )
    )
    fmaps = fmaps.reshape(b, s, -1, fmaps.shape[-2], fmaps.shape[-1])
    coarse_lists, vis_e, _, _, _ = t_model.track_predictor.coarse_predictor(
        query_points=queries_t.clone(), fmaps=fmaps, iters=tc.coarse_iters,
        down_ratio=2, return_feat=True, TRACKorPOSE=False,
    )
    coarse_pred = coarse_lists[-1]

    # the reference hardcodes iters=6 inside refine_track
    # (refine_track.py:136); wrap the fine predictor to run fine_iters
    class _FineWrap(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, query_points=None, fmaps=None, iters=6, **kw):
            return self.inner(
                query_points=query_points, fmaps=fmaps,
                iters=tc.fine_iters, **kw,
            )

    refined_t, score_t = ref_refine_track(
        images_t, t_model.track_predictor.fine_fnet,
        _FineWrap(t_model.track_predictor.fine_predictor), coarse_pred,
        compute_score=True,
    )
    inv = 1.0 / (score_t + 1e-6)
    inv = inv / inv.max(dim=1, keepdim=True)[0]
    out_cam = t_model.camera_predictor(
        images_t.reshape(-1, 3, h, h), batch_size=b, gt_cameras=gt_cams_t,
        pred_trajectories=refined_t, track_confidence=inv,
    )
    want_pose = out_cam["pred_pose_enc"].reshape(s, 7).numpy()
    want_track = refined_t.numpy()
    want_score = inv.numpy()

    # --- our side: one module, converted weights ---
    model = COMET(cfg)
    imgs_j = jnp.asarray(images_t.numpy().transpose(0, 1, 3, 4, 2))
    queries_j = jnp.asarray(queries_t.numpy())
    params = model.init(jax.random.PRNGKey(0), imgs_j, queries_j)

    converted, missing, unmapped = cw.convert(
        t_model.state_dict(), params, cfg, strict=True
    )
    out = model.apply(converted, imgs_j, queries_j)

    np.testing.assert_allclose(
        np.asarray(out["pred_track"][0]), want_track[0], atol=2e-2, rtol=2e-2
    )
    np.testing.assert_allclose(
        np.asarray(out["track_score"][0]), want_score[0], atol=5e-3, rtol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out["pred_pose_enc"][0]), want_pose, atol=5e-3, rtol=5e-3
    )
