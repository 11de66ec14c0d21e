"""COMET end-to-end model: tracker + camera predictor in one jitted graph.

Parity target: comet/models/E2Epose2.py:59-266 (COMET.forward_all) and
comet/models/track_predictor.py:117-151 (process_images_to_fmaps). The whole
forward — CNN feature maps, iterative coarse tracking, patch-based fine
refinement, score computation, ViT aggregation, trajectory fusion, temporal
trunk, GAPR heads, pose codec — compiles into a single XLA program.

The tracker branch runs under stop_gradient (cfg.freeze_track=True in every
shipped experiment; the optimizer additionally only sees camera params).
"""

from __future__ import annotations

from typing import Dict, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..config import CometConfig
from ..geometry.cameras import CameraSet
from ..geometry.codecs import (
    INTRINSICS_TABLE,
    decode_relative_uvz,
    decode_relative_xyz,
    encode_relative_uvz,
    encode_relative_xyz,
)
from ..ops import resize_bilinear_align_corners
from .camera_predictor import CameraPredictor
from .encoders import BasicEncoder, ShallowEncoder
from .refine import refine_track
from .tracker import BaseTracker


class COMET(nn.Module):
    cfg: CometConfig

    @nn.compact
    def __call__(
        self,
        images: jax.Array,  # [B, S, H, W, 3] ImageNet-normalized
        queries: jax.Array,  # [B, N, 2] frame-0 query points (pixels)
    ) -> Dict[str, jax.Array]:
        cfg = self.cfg
        tc = cfg.tracker
        dtype = cfg.dtype
        b, s, h, w, _ = images.shape

        out: Dict[str, jax.Array] = {}
        pred_track = None
        track_confidence = None

        if cfg.enable_track:
            coarse_fnet = BasicEncoder(
                output_dim=tc.coarse_latent_dim, stride=tc.coarse_stride,
                dtype=dtype, name="coarse_fnet",
            )
            coarse_tracker = BaseTracker(
                stride=tc.coarse_stride,
                corr_levels=tc.coarse_corr_levels,
                corr_radius=tc.coarse_corr_radius,
                latent_dim=tc.coarse_latent_dim,
                hidden_size=tc.coarse_hidden_size,
                use_space_attn=True,
                depth=tc.coarse_depth,
                fine=False,
                predict_conf=tc.predict_conf,
                dtype=dtype,
                name="coarse_tracker",
            )
            psize = 2 * tc.fine_pradius + 1
            # the fine fnet returns NATIVE-resolution features; its final
            # upsample to psize is folded into the tracker's correlation
            # volumes via corr_size (see ops/corr.corr_volume_pyramid_sample)
            fine_fnet = ShallowEncoder(
                output_dim=tc.fine_latent_dim, stride=1, dtype=dtype,
                resize_output=False, name="fine_fnet",
            )
            fine_tracker = BaseTracker(
                stride=1,
                corr_levels=tc.fine_corr_levels,
                corr_radius=tc.fine_corr_radius,
                latent_dim=tc.fine_latent_dim,
                hidden_size=tc.fine_hidden_size,
                use_space_attn=False,
                depth=tc.fine_depth,
                fine=True,
                dtype=dtype,
                corr_size=(psize, psize),
                name="fine_tracker",
            )

            # feature maps at 1/(down_ratio*stride) of the input resolution
            imgs_flat = images.reshape(b * s, h, w, 3)
            if tc.coarse_down_ratio > 1:
                imgs_flat = resize_bilinear_align_corners(
                    imgs_flat, h // tc.coarse_down_ratio, w // tc.coarse_down_ratio
                )
            fmaps = coarse_fnet(imgs_flat.astype(dtype))
            fmaps = fmaps.reshape(b, s, *fmaps.shape[1:])

            coarse_out = coarse_tracker(
                queries, fmaps, iters=tc.coarse_iters,
                down_ratio=tc.coarse_down_ratio,
            )
            coarse_pred = coarse_out.coord_preds[-1]  # [B, S, N, 2]

            if cfg.fine_tracker:
                # cast before extraction: extract(cast(x)) == cast(extract(x))
                # and keeps the patch gather + selection einsum in bf16
                refined, score = refine_track(
                    images.astype(dtype),
                    lambda p: fine_fnet(p),
                    lambda q, f, iters: fine_tracker(q, f, iters=iters),
                    coarse_pred,
                    pradius=tc.fine_pradius,
                    sradius=tc.fine_sradius,
                    compute_score=True,
                    iters=tc.fine_iters,
                )
                # confidence = normalized inverse heatmap-std
                # (E2Epose2.py:232-239)
                inv = 1.0 / (score + 1e-6)
                track_confidence = inv / inv.max(axis=1, keepdims=True)
            else:
                refined = coarse_pred
                track_confidence = jnp.ones_like(coarse_out.vis)

            pred_track = refined
            if cfg.freeze_track:
                pred_track = jax.lax.stop_gradient(pred_track)
                track_confidence = jax.lax.stop_gradient(track_confidence)

            out["coarse_track"] = jax.lax.stop_gradient(coarse_pred)
            out["pred_track"] = pred_track
            out["track_score"] = track_confidence
            if coarse_out.vis is not None:
                out["track_vis"] = jax.lax.stop_gradient(coarse_out.vis)

        if cfg.enable_pose:
            camera = CameraPredictor(
                hidden_size=cfg.camera.hidden_size,
                num_heads=cfg.camera.num_heads,
                mlp_ratio=cfg.camera.mlp_ratio,
                att_depth=cfg.camera.att_depth,
                trunk_depth=cfg.camera.trunk_depth,
                down_size=cfg.camera.down_size,
                use_trajectory=cfg.camera.use_trajectory,
                use_time=cfg.camera.use_time,
                use_gapr=cfg.camera.use_gapr,
                backbone_depth=cfg.camera.backbone_depth,
                backbone_dim=cfg.camera.backbone_dim,
                backbone_heads=cfg.camera.backbone_heads,
                dtype=dtype,
                name="camera_predictor",
            )
            preds = camera(images, pred_track, track_confidence)
            out["pred_pose_enc"] = preds.pred_pose_enc  # [B, S, 7]

        return out


def encode_gt(cfg: CometConfig, gt_cams: CameraSet) -> jax.Array:
    """Encode ground-truth cameras with the config's codec.

    Accepts a per-sequence CameraSet (arrays [S, ...] -> [S, 7or8]) or a
    batched one (arrays [B, S, ...] -> [B, S, 7or8], vmapped).
    """
    fn = encode_relative_uvz if cfg.camera.use_gapr else encode_relative_xyz
    if gt_cams.q.ndim == 3:
        return jax.vmap(fn)(gt_cams)
    return fn(gt_cams)


def decode_predictions(cfg: CometConfig, pred_pose_enc: jax.Array, gt_cams: CameraSet):
    """Decode relative predictions to absolute (quat, T_xyz) using the
    frame-0 reference camera (pose_encoding_to_camera2/3). Supports batched
    CameraSets ([B, S, ...]) via vmap."""
    if cfg.camera.use_gapr:
        intr = INTRINSICS_TABLE[cfg.dataset]
        if gt_cams.q.ndim == 3:
            return jax.vmap(lambda e, c: decode_relative_uvz(e, c, intr))(
                pred_pose_enc, gt_cams
            )
        return decode_relative_uvz(pred_pose_enc, gt_cams, intr)
    if gt_cams.q.ndim == 3:
        return jax.vmap(decode_relative_xyz)(pred_pose_enc, gt_cams)
    return decode_relative_xyz(pred_pose_enc, gt_cams)


def pose_loss(
    cfg: CometConfig, pred_pose_enc: jax.Array, gt_enc: jax.Array
) -> Dict[str, jax.Array]:
    """Frame-1..S-1 MSE losses x100 with (w_t, w_r) weighting
    (camera_predictor10.py:420-438)."""
    pred_trans = pred_pose_enc[:, 1:, :3]
    pred_rot = pred_pose_enc[:, 1:, 3:7]
    gt_trans = gt_enc[..., 1:, :3]
    gt_rot = gt_enc[..., 1:, 3:7]
    trans_loss = jnp.mean((pred_trans - gt_trans) ** 2) * 100.0
    rot_loss = jnp.mean((pred_rot - gt_rot) ** 2) * 100.0
    loss = cfg.train.weight_trans * trans_loss + cfg.train.weight_rot * rot_loss
    return {"loss": loss, "loss_trans": trans_loss, "loss_rot": rot_loss}
