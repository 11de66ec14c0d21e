#!/usr/bin/env python
"""Full-paper-scale weight-conversion + forward parity (VERDICT r2 item 1).

Every per-module parity suite shrinks the model for CPU speed
(down_size=112, att_depth=2, ...). This script builds the reference model
at the REAL configuration — DINOv2 ViT-B/14-reg @ 336^2 with registers and
a 37x37-stored pos_embed (the released-checkpoint layout), att_depth=4,
trunk_depth=4, coarse latent 128 / hidden 384 / depth 6, fine tracker per
abl_ours.yaml:395-431 — with random torch weights (~253.6M params,
/root/reference/README.md:211), converts the state_dict with
tools/convert_torch_weights.py, and diffs the full forward
(pred_pose_enc + pred_track + score) on one S=16, 512px, N=512 sequence,
torch vs jitted JAX on CPU. This is exactly the configuration best.bin
would load into; a pass certifies the whole converter chain at real
dimensions (pos-embed 37->24 resample, depth-4 attention key mapping,
full-width packed qkv splits).

fine_iters is run at 2 instead of the runtime 6: with RANDOM weights the
fine refinement map is expansive (~60x f32 round-off amplification per
iteration, measured in tests/test_torch_parity_full.py) so 6-iter diffs of
random weights measure chaos, not conversion. Weight mapping is iteration-
count independent; per-iteration semantics are certified here and in the
per-module suites. Trained weights make the map contractive.

Writes one JSON row to PARITY_FULLSCALE.md (committed) and exits nonzero
on tolerance failure. Runtime: tens of minutes on this 1-core host.

Usage: python tools/full_scale_parity.py [--small]  (--small: smoke-check
the script itself at the shrunken dims first; not the real run)
"""

from __future__ import annotations

import json
import os
import sys
import time
import types

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
sys.path.insert(0, os.path.join(_REPO, "tests"))

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import torch
import torch.nn.functional as F

import _torch_ref

sys.path.insert(0, os.path.join(_REPO, "tools"))
import convert_torch_weights as cw  # noqa: E402

_torch_ref.install()
torch.manual_seed(0)
torch.set_grad_enabled(False)


class _RefCfg(dict):
    def __init__(self, **kw):
        super().__init__(**kw)
        for k, v in kw.items():
            setattr(self, k, v)


def main(small: bool = False):
    from models import camera_predictor10 as ref_cam_mod
    from models.refine_track import refine_track as ref_refine_track
    from models.track_modules import base_track_predictor as ref_trk
    from models.track_modules import blocks as ref_blocks
    import train_eval_func

    from comet_tpu.config import TrackerConfig, get_config
    from comet_tpu.models import COMET

    if small:
        b, s, h, n, down_size = 1, 3, 64, 8, 112
    else:
        b, s, h, n, down_size = 1, 16, 512, 512, 336

    # full paper-scale config: the "ours" preset defaults ARE the
    # abl_ours.yaml dims (att_depth=4, trunk_depth=4, down_size=336,
    # coarse 128/384/6, fine 32/256/4); only fine_iters drops to 2 (see
    # module docstring) and dtype pins to f32 for a deterministic diff.
    cfg = get_config("ours").replace(
        seqlen=s, img_size=h, track_num=n, compute_dtype="float32",
    )
    cfg = cfg.replace(tracker=TrackerConfig(fine_iters=2))
    # COMET_PARITY_ITERS="c,f": override tracker iteration counts (the
    # 1,1 run certifies per-iteration semantics at full dimensions
    # without the random-weight amplification of chained iterations)
    it_env = os.environ.get("COMET_PARITY_ITERS")
    if it_env:
        import dataclasses

        ci, fi = (int(x) for x in it_env.split(","))
        cfg = cfg.replace(tracker=dataclasses.replace(
            cfg.tracker, coarse_iters=ci, fine_iters=fi
        ))
    if small:
        from comet_tpu.config import CameraConfig

        cfg = cfg.replace(
            tracker=TrackerConfig(
                coarse_corr_levels=2, coarse_corr_radius=2,
                coarse_latent_dim=16, coarse_hidden_size=32, coarse_depth=2,
                coarse_iters=2, fine_corr_radius=2, fine_latent_dim=8,
                fine_hidden_size=16, fine_depth=2, fine_iters=2,
                fine_sradius=2,
            ),
            camera=CameraConfig(att_depth=2, trunk_depth=2,
                                down_size=down_size),
        )
    tc = cfg.tracker
    cc = cfg.camera

    ref_cfg = _RefCfg(
        MODEL=types.SimpleNamespace(
            TRACK=types.SimpleNamespace(efficient_corr=False)
        ),
        track_conf=False,
        weight_trans=1.0,
        weight_rot=2.0,
        train=types.SimpleNamespace(dataset="AMD", fix_first_cor=True),
    )

    # real-checkpoint layout: pos_embed stored at 37x37, interpolated to the
    # 24x24 runtime grid in forward (and resampled once by the converter)
    dino = _torch_ref.build_torch_dinov2(
        img_size=down_size, depth=cc.backbone_depth,
        pos_grid=None if small else 37,
    )
    torch.hub.load = lambda *a, **k: dino

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
                corr_radius=tc.fine_corr_radius,
                latent_dim=tc.fine_latent_dim,
                hidden_size=tc.fine_hidden_size, use_spaceatt=False,
                depth=tc.fine_depth, fine=True, cfg=ref_cfg,
            )
            self.track_predictor = tp
            self.camera_predictor = ref_cam_mod.CameraPredictor(
                hidden_size=cc.hidden_size, num_heads=cc.num_heads,
                mlp_ratio=4, down_size=down_size, att_depth=cc.att_depth,
                trunk_depth=cc.trunk_depth, backbone="dinov2b", cfg=ref_cfg,
            )

    t0 = time.time()
    t_model = TorchComet().eval()
    n_params = sum(p.numel() for p in t_model.parameters())
    print(f"[{time.time() - t0:6.1f}s] torch model built: "
          f"{n_params / 1e6:.1f}M params", flush=True)

    images_t = torch.randn(b, s, 3, h, h)
    queries_t = torch.rand(b, n, 2) * (h - 40) + 20

    rng = np.random.default_rng(0)
    qg = rng.normal(size=(s, 4)).astype(np.float32)
    qg /= np.linalg.norm(qg, axis=-1, keepdims=True)
    t_uvz = rng.normal(size=(s, 3)).astype(np.float32)
    t_uvz[:, 2] = np.abs(t_uvz[:, 2]) + 2.0
    gt_cams_t = train_eval_func.QuaternionCamerasCP5(
        R=torch.from_numpy(qg), T_uvz=torch.from_numpy(t_uvz),
        T=torch.zeros(s, 3), focal_length=2.0, ratio=torch.tensor(0.5),
    )

    # --- reference forward_all glue (E2Epose2.py:176-257) ---
    t0 = time.time()
    imgs_flat = images_t.reshape(b * s, 3, h, h)
    fmaps = t_model.track_predictor.coarse_fnet(
        F.interpolate(
            imgs_flat, scale_factor=0.5, mode="bilinear", align_corners=True
        )
    )
    fmaps = fmaps.reshape(b, s, -1, fmaps.shape[-2], fmaps.shape[-1])
    coarse_lists, vis_e, _, _, _ = t_model.track_predictor.coarse_predictor(
        query_points=queries_t.clone(), fmaps=fmaps, iters=tc.coarse_iters,
        down_ratio=tc.coarse_down_ratio, return_feat=True, TRACKorPOSE=False,
    )
    coarse_pred = coarse_lists[-1]
    print(f"[{time.time() - t0:6.1f}s] torch coarse track done", flush=True)

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
    print(f"[{time.time() - t0:6.1f}s] torch fine track done", flush=True)
    out_cam = t_model.camera_predictor(
        images_t.reshape(-1, 3, h, h), batch_size=b, gt_cameras=gt_cams_t,
        pred_trajectories=refined_t, track_confidence=inv,
    )
    torch_fwd_s = time.time() - t0
    print(f"[{torch_fwd_s:6.1f}s] torch camera predictor done", flush=True)
    want_pose = out_cam["pred_pose_enc"].reshape(s, 7).numpy()
    want_track = refined_t.numpy()
    want_score = inv.numpy()

    # --- our side: one jitted module, converted weights ---
    t0 = time.time()
    model = COMET(cfg)
    imgs_j = jnp.asarray(images_t.numpy().transpose(0, 1, 3, 4, 2))
    queries_j = jnp.asarray(queries_t.numpy())
    params = jax.jit(model.init)(jax.random.PRNGKey(0), imgs_j, queries_j)
    print(f"[{time.time() - t0:6.1f}s] jax init done", flush=True)

    converted, missing, unmapped = cw.convert(
        t_model.state_dict(), params, cfg, strict=True
    )
    print(f"[{time.time() - t0:6.1f}s] conversion done "
          f"(missing={len(missing)}, unmapped={len(unmapped)})", flush=True)

    fwd = jax.jit(model.apply)
    out = fwd(converted, imgs_j, queries_j)
    jax.block_until_ready(out)
    jax_fwd_s = time.time() - t0
    print(f"[{jax_fwd_s:6.1f}s] jax forward done (incl. compile)", flush=True)

    d_pose = float(np.max(np.abs(np.asarray(out["pred_pose_enc"][0]) - want_pose)))
    track_err = np.abs(np.asarray(out["pred_track"][0]) - want_track[0])
    score_err = np.abs(np.asarray(out["track_score"][0]) - want_score[0])
    d_track = float(track_err.max())
    d_score = float(score_err.max())
    # Track agreement is reported as a DISTRIBUTION, not only the max:
    # refine_track floors the coarse coordinates to pick each 31x31 patch
    # (refine_track.py:74-111) — an f32-rounding difference that crosses
    # an integer boundary shifts a patch by a full pixel, and with RANDOM
    # (non-contractive) weights that discretization difference amplifies
    # through the remaining iterations for THAT track. The converter is
    # certified by the bulk statistics (median/p99) and by the 1-iteration
    # run; isolated boundary-crossing tracks are expected.
    track_q = {
        "median": float(np.median(track_err)),
        "p99": float(np.quantile(track_err, 0.99)),
        "frac_gt_1px": float((track_err.max(axis=-1) > 1.0).mean()),
    }
    score_q = {
        "median": float(np.median(score_err)),
        "p99": float(np.quantile(score_err, 0.99)),
    }
    tol = {"pose": 2e-2, "track_p99": 5e-2, "score_p99": 2e-2}
    ok = (
        d_pose < tol["pose"]
        and track_q["p99"] < tol["track_p99"]
        and score_q["p99"] < tol["score_p99"]
    )

    row = {
        "date": time.strftime("%Y-%m-%d"),
        "config": "small-smoke" if small else
                  "full: dinov2b@336 pos37, att_depth=4, trunk_depth=4, "
                  f"coarse 128/384/6 it{tc.coarse_iters}, "
                  f"fine 32/256/4 it{tc.fine_iters}, S=16 512px N=512",
        "params_M": round(n_params / 1e6, 1),
        "max_abs_diff": {"pred_pose_enc": d_pose, "pred_track_px": d_track,
                         "track_score": d_score},
        "track_err_px": track_q,
        "score_err": score_q,
        "tol": tol,
        "torch_fwd_s": round(torch_fwd_s, 1),
        "jax_fwd_incl_compile_s": round(jax_fwd_s, 1),
        "ok": ok,
    }
    print(json.dumps(row), flush=True)

    if not small:
        path = os.path.join(_REPO, "PARITY_FULLSCALE.md")
        header = (
            "# Full-paper-scale conversion parity\n\n"
            "One row per recorded run of `tools/full_scale_parity.py` "
            "(see its docstring for the exact configuration and the "
            "fine_iters=2 note).\n\n"
        )
        if not os.path.exists(path):
            with open(path, "w") as f:
                f.write(header)
        with open(path, "a") as f:
            f.write("```json\n" + json.dumps(row) + "\n```\n")

    if not ok:
        print("PARITY FAILURE", file=sys.stderr)
        return 1
    print("PARITY OK")
    return 0


if __name__ == "__main__":
    sys.exit(main(small="--small" in sys.argv))
