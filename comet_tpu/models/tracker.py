"""Iterative point tracker (CoTracker2-style), TPU-native.

Parity target: BaseTrackerPredictor
(comet/models/track_modules/base_track_predictor.py:15-284) and
TrackerPredictor (comet/models/track_predictor.py:16-151).

Design notes (TPU-first):
- channel-last fmaps; the correlation volume is never materialized — each
  refinement iteration does a fused window-gather + contraction
  (ops/corr.py), mathematically identical to corr-then-bilinear-sample.
- the refinement loop is unrolled statically (4-6 iters) so XLA fuses the
  per-iteration gather/attention pipeline; weights are shared across iters
  by calling the same submodule.
- frame-0 coordinates are pinned to the query points after every iteration
  (base_track_predictor.py:254).
"""

from __future__ import annotations

from typing import List, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..geometry.embeddings import embed_2d_coords, sincos_2d_pos_embed_grid
from ..ops import (
    corr_volume_pyramid_sample,
    resize_bilinear_align_corners,
    sample_features,
)
from .blocks import gelu
from .update_former import EfficientUpdateFormer


def tracker_transformer_dim(corr_levels: int, corr_radius: int, latent_dim: int, fine: bool) -> int:
    """Input width of the update transformer incl. the reference's padding
    rule (base_track_predictor.py:55-66)."""
    dim = corr_levels * (2 * corr_radius + 1) ** 2 + latent_dim * 2
    if fine:
        dim += 4 if dim % 2 == 0 else 5
    else:
        dim += (4 - dim % 4) % 4
    return dim


class TrackerOutput(NamedTuple):
    coord_preds: jax.Array  # [iters, B, S, N, 2] in input-image scale
    vis: Optional[jax.Array]  # [B, S, N] sigmoid visibility (coarse only)
    conf: Optional[jax.Array]  # [B, S, N] sigmoid confidence (if enabled)
    track_feats: jax.Array  # [B, S, N, C]
    query_feats: jax.Array  # [B, N, C]


class BaseTracker(nn.Module):
    stride: int = 4
    corr_levels: int = 5
    corr_radius: int = 4
    latent_dim: int = 128
    hidden_size: int = 384
    use_space_attn: bool = True
    depth: int = 6
    fine: bool = False
    predict_conf: bool = False
    dtype: jnp.dtype = jnp.float32
    # When set (hh, ww), fmaps arrive at a smaller native resolution and the
    # final align-corners upsample to corr_size is folded into the scalar
    # correlation volumes (linearity: <tf, resize(f)> == resize(<tf, f>)),
    # skipping the [B*N, S, P, P, C] upsampled-feature materialization that
    # dominated the fine stage's layout-copy time (jax.profiler, round 2).
    # Coordinates, positional grids and outputs all live in corr_size space.
    corr_size: Optional[tuple] = None

    @nn.compact
    def __call__(
        self,
        query_points: jax.Array,  # [B, N, 2] pixel coords in input images
        fmaps: jax.Array,  # [B, S, HH, WW, C] feature maps
        iters: int = 4,
        down_ratio: int = 1,
    ) -> TrackerOutput:
        b, s, hh, ww, c = fmaps.shape
        if self.corr_size is not None:
            hh, ww = self.corr_size
        n = query_points.shape[1]
        tdim = tracker_transformer_dim(
            self.corr_levels, self.corr_radius, self.latent_dim, self.fine
        )
        flows_emb_dim = self.latent_dim // 2

        # scale queries from image to feature-map resolution
        scale = float(self.stride) * float(down_ratio)
        coords0 = query_points / jnp.asarray(scale, query_points.dtype)
        coords = jnp.broadcast_to(coords0[:, None], (b, s, n, 2))

        # track features initialized from the query-frame features
        if self.corr_size is not None:
            # resize ONLY frame 0 for query sampling (16x cheaper than
            # resizing all frames; bilinear(resize(f), p) must match the
            # reference exactly, so the query path keeps the real resize)
            frame0 = resize_bilinear_align_corners(fmaps[:, 0], hh, ww)
            query_feats = sample_features(frame0, coords0)  # [B, N, C]
        else:
            query_feats = sample_features(fmaps[:, 0], coords0)  # [B, N, C]
        track_feats = jnp.broadcast_to(
            query_feats[:, None], (b, s, n, self.latent_dim)
        )

        # both coarse and fine branches sample VOLUME pyramids through
        # statically-folded pool(+resize) selection matrices — linearity:
        # pool(<tf, f>) == <tf, pool(f)> — so no feature pyramid and no
        # per-iteration pooled volumes materialize (ops/corr.py)

        # positional embedding grid sampled at the query coords — bilinear
        # sampling of the integer-grid sincos embedding, matching the
        # reference (base_track_predictor.py:200-208)
        pos_grid = sincos_2d_pos_embed_grid(tdim, (hh, ww)).astype(self.dtype)
        sampled_pos = sample_features(
            jnp.broadcast_to(pos_grid[None], (b, hh, ww, tdim)), coords0
        )  # [B, N, tdim]

        updateformer = EfficientUpdateFormer(
            space_depth=self.depth if self.use_space_attn else 0,
            time_depth=self.depth,
            hidden_size=self.hidden_size,
            output_dim=self.latent_dim + 2,
            add_space_attn=self.use_space_attn,
            dtype=self.dtype,
            name="updateformer",
        )
        ffeat_norm = nn.GroupNorm(num_groups=1, name="ffeat_norm")
        ffeat_dense = nn.Dense(self.latent_dim, dtype=self.dtype, name="ffeat_updater")

        coord_preds: List[jax.Array] = []
        for _ in range(iters):
            coords = jax.lax.stop_gradient(coords)

            fcorrs = corr_volume_pyramid_sample(
                fmaps, coords, track_feats, self.corr_radius,
                self.corr_levels,
                out_size=(hh, ww) if self.corr_size is not None else None,
            )  # [B, S, N, L*K]

            flows = coords - coords[:, 0:1]  # [B, S, N, 2]
            flows_bn = flows.transpose(0, 2, 1, 3)  # [B, N, S, 2]
            flows_emb = embed_2d_coords(flows_bn, flows_emb_dim, cat_coords=False)
            flows_emb = jnp.concatenate([flows_emb, flows_bn], axis=-1)

            fcorrs_bn = fcorrs.transpose(0, 2, 1, 3)  # [B, N, S, LK]
            tfeats_bn = track_feats.transpose(0, 2, 1, 3)  # [B, N, S, C]

            x = jnp.concatenate([flows_emb, fcorrs_bn, tfeats_bn], axis=-1)
            pad = tdim - x.shape[-1]
            if pad > 0:
                x = jnp.concatenate(
                    [x, jnp.zeros((*x.shape[:-1], pad), x.dtype)], axis=-1
                )
            x = x + sampled_pos[:, :, None, :]

            delta = updateformer(x.astype(self.dtype))  # [B, N, S, C+2]
            delta_coords = delta[..., :2].astype(coords.dtype)
            delta_feats = delta[..., 2:]

            # GroupNorm -> Linear -> GELU residual update of track features
            # (ffeat_updater = Sequential(Linear, GELU) applied to
            # norm(delta), base_track_predictor.py:84-86, 237-239).
            # The reference normalizes [B*N*S, C] rows, i.e. per-sample over
            # C only — flatten before flax GroupNorm (which would otherwise
            # treat N, S as spatial dims and normalize across them).
            normed = ffeat_norm(
                delta_feats.reshape(-1, self.latent_dim)
            ).reshape(delta_feats.shape)
            update = gelu(ffeat_dense(normed))
            track_feats = (tfeats_bn + update).transpose(0, 2, 1, 3)

            coords = coords + delta_coords.transpose(0, 2, 1, 3)
            # pin frame 0 to the query points
            coords = coords.at[:, 0].set(coords0)
            coord_preds.append(coords * scale)

        vis = None
        if not self.fine:
            vis = jax.nn.sigmoid(
                nn.Dense(1, dtype=self.dtype, name="vis_predictor")(track_feats)
            )[..., 0]
        conf = None
        if self.predict_conf:
            conf = jax.nn.sigmoid(
                nn.Dense(1, dtype=self.dtype, name="conf_predictor")(track_feats)
            )[..., 0]

        return TrackerOutput(
            coord_preds=jnp.stack(coord_preds, axis=0),
            vis=vis,
            conf=conf,
            track_feats=track_feats,
            query_feats=query_feats,
        )
