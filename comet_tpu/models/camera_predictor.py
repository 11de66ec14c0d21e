"""Camera pose predictor: ViT aggregator + 𝕋_P trajectory fusion + 𝕋_F
temporal reasoning + GAPR heads.

Parity target: comet/models/camera_predictor10.py:90-693 plus its four
ablation clones (camera_predictor_abl_{all,track,time,uvz}.py) — here the
ablations are config flags on ONE module instead of file copies:

- use_trajectory=False  -> drop 𝕋_P (abl_track / abl_all)
- use_time=False        -> drop the 1-D time embedding + trunk (abl_time / abl_all)
- use_gapr=False        -> single 7-dim MLP head + xyz codec (abl_uvz / abl_all)

Reference quirks preserved (they matter for ported weights):
- the input images (already ImageNet-normalized by the data layer) are
  normalized a second time inside the predictor
  (camera_predictor10.py:619-633 _resnet_normalize_image);
- attention blocks re-base the residual stream on normalized activations;
- frame-0 predictions are forced to the identity pose AFTER the loss is
  computed (camera_predictor10.py:420-458).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry.embeddings import sincos_2d_pos_embed, sincos_time_embed
from ..ops import resize_bilinear_align_corners
from .blocks import AttnBlock, CrossAttnBlock, FusedLayerNorm, Mlp
from .vit import DinoViT

_RESNET_MEAN = (0.485, 0.456, 0.406)
_RESNET_STD = (0.229, 0.224, 0.225)


class CameraPredictions(NamedTuple):
    pred_pose_enc: jax.Array  # [B, S, 7] relative (trans(3), quat(4)), frame0 = identity
    pre_head_feat: jax.Array  # [B, S, hidden] aggregated feature (diagnostics)


class TrajectoryEncoder(nn.Module):
    """MLP(2 -> 256 -> 768) with LayerNorms (camera_predictor10.py:75-87)."""

    hidden_dim: int = 256
    out_dim: int = 768
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, traj):
        x = nn.Dense(self.hidden_dim, dtype=self.dtype, name="fc1")(traj)
        x = FusedLayerNorm(dtype=self.dtype, name="ln1")(x)
        x = nn.relu(x)
        x = nn.Dense(self.out_dim, dtype=self.dtype, name="fc2")(x)
        return FusedLayerNorm(dtype=self.dtype, name="ln2")(x)


class ConfidenceAttention(nn.Module):
    """Linear(1->32) ReLU Linear(32->1) Sigmoid (camera_predictor10.py:243-248)."""

    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, conf):
        x = nn.Dense(32, dtype=self.dtype, name="fc1")(conf)
        x = nn.relu(x)
        x = nn.Dense(1, dtype=self.dtype, name="fc2")(x)
        return jax.nn.sigmoid(x)


class CameraPredictor(nn.Module):
    hidden_size: int = 768
    num_heads: int = 8
    mlp_ratio: float = 4.0
    att_depth: int = 4
    trunk_depth: int = 4
    down_size: int = 336
    use_trajectory: bool = True
    use_time: bool = True
    use_gapr: bool = True
    freeze_backbone: bool = True
    backbone_depth: int = 12
    backbone_dim: int = 768
    backbone_heads: int = 12
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        images: jax.Array,  # [B, S, H, W, 3], ImageNet-normalized
        trajectories: Optional[jax.Array] = None,  # [B, S, N, 2]
        track_confidence: Optional[jax.Array] = None,  # [B, S, N]
    ) -> CameraPredictions:
        b, s = images.shape[:2]
        c = self.hidden_size

        rgb_feat = self._get_2d_image_features(images)  # [B, S, C]

        if self.use_trajectory and trajectories is not None:
            n = trajectories.shape[2]
            traj = TrajectoryEncoder(out_dim=c, dtype=self.dtype, name="traj_encoder")(
                trajectories.astype(self.dtype)
            )  # [B, S, N, C]
            conf_w = ConfidenceAttention(dtype=self.dtype, name="confidence_attention")(
                track_confidence[..., None].astype(self.dtype)
            )
            traj_ctx = (traj * conf_w).reshape(b * s, n, c)
            rgb_flat = rgb_feat.reshape(b * s, 1, c)
            for i in range(self.att_depth):
                rgb_flat = CrossAttnBlock(
                    self.num_heads, self.mlp_ratio, dtype=self.dtype,
                    name=f"cross_attn_block_{i}",
                )(rgb_flat, traj_ctx)
            rgb_feat = rgb_feat + rgb_flat.reshape(b, s, c)

        if self.use_time:
            time_emb = sincos_time_embed(c, s).astype(rgb_feat.dtype)  # [1, S, C]
            rgb_feat = rgb_feat + time_emb
            for i in range(self.trunk_depth):
                rgb_feat = AttnBlock(
                    self.num_heads, self.mlp_ratio, dtype=self.dtype,
                    name=f"trunk_{i}",
                )(rgb_feat)

        if self.use_gapr:
            # GAPR: three heads — quaternion, image-plane (u, v), depth
            rot = Mlp(
                hidden_features=c * 2, out_features=4, dtype=self.dtype,
                name="pose_branch",
            )(rgb_feat)
            uv = nn.Dense(2, dtype=self.dtype, name="fc_translation2d")(rgb_feat)
            d = nn.Dense(1, dtype=self.dtype, name="fc_depth")(rgb_feat)
            trans = jnp.concatenate([uv, d], axis=-1)
        else:
            enc = Mlp(
                hidden_features=c * 2, out_features=7, dtype=self.dtype,
                name="pose_branch",
            )(rgb_feat)
            trans = enc[..., :3]
            rot = enc[..., 3:7]

        rot = rot / jnp.maximum(
            jnp.linalg.norm(rot.astype(jnp.float32), axis=-1, keepdims=True), 1e-8
        ).astype(rot.dtype)
        pred = jnp.concatenate([trans, rot], axis=-1).astype(jnp.float32)
        # frame 0 is the reference frame: identity pose
        # (camera_predictor10.py:456-458; the loss only reads frames 1..S-1)
        identity = jnp.asarray([0, 0, 0, 1, 0, 0, 0], jnp.float32)
        pred = pred.at[:, 0].set(identity)
        return CameraPredictions(pred_pose_enc=pred, pre_head_feat=rgb_feat)

    def _get_2d_image_features(self, images: jax.Array) -> jax.Array:
        """Frozen ViT features + pose-token aggregation
        (camera_predictor10.py:622-687)."""
        b, s, h, w, _ = images.shape
        c = self.hidden_size
        x = images.reshape(b * s, h, w, 3)
        if h != self.down_size or w != self.down_size:
            x = resize_bilinear_align_corners(x, self.down_size, self.down_size)

        mean = jnp.asarray(_RESNET_MEAN, x.dtype)
        std = jnp.asarray(_RESNET_STD, x.dtype)
        x = (x - mean) / std  # second normalization, as in the reference

        backbone = DinoViT(
            img_size=self.down_size,
            embed_dim=self.backbone_dim,
            depth=self.backbone_depth,
            num_heads=self.backbone_heads,
            dtype=self.dtype,
            name="backbone",
        )
        tokens = backbone(x.astype(self.dtype))  # [B*S, P, 768]
        if self.freeze_backbone:
            tokens = jax.lax.stop_gradient(tokens)

        tokens = Mlp(dtype=self.dtype, out_features=c, name="input_transform")(tokens)
        tokens = FusedLayerNorm(
            use_bias=False, use_scale=False, epsilon=1e-6, dtype=self.dtype,
            name="norm2",
        )(tokens)

        p = tokens.shape[1]
        grid = int(round(p**0.5))
        pos = sincos_2d_pos_embed(c, (grid, grid)).astype(tokens.dtype)
        tokens = tokens.reshape(b, s, p, c) + pos[None, None]

        pose_token = self.param(
            "pose_token", nn.initializers.normal(1e-6), (1, 1, 1, c)
        ).astype(tokens.dtype)
        tokens = jnp.concatenate(
            [jnp.broadcast_to(pose_token, (b, s, 1, c)), tokens], axis=2
        )
        p1 = p + 1

        for idx in range(self.att_depth):
            # per-frame self attention
            tokens = AttnBlock(
                self.num_heads, self.mlp_ratio, dtype=self.dtype,
                name=f"self_att_{idx}",
            )(tokens.reshape(b * s, p1, c)).reshape(b, s, p1, c)
            # all other frames cross-attend to frame 0
            feat_0 = tokens[:, 0]
            feat_others = tokens[:, 1:].reshape(b, (s - 1) * p1, c)
            feat_others = CrossAttnBlock(
                self.num_heads, self.mlp_ratio, dtype=self.dtype,
                name=f"cross_att_{idx}",
            )(feat_others, feat_0)
            tokens = jnp.concatenate(
                [tokens[:, 0:1], feat_others.reshape(b, s - 1, p1, c)], axis=1
            )

        return tokens[:, :, 0]  # pose-token readout [B, S, C]
