#!/usr/bin/env python
"""Per-stage latency breakdown of the COMET forward on the real device.

Times each pipeline stage (ViT backbone, camera aggregation, coarse fnet,
coarse tracker, patch extraction + fine fnet, fine tracker, score) with the
RTT-corrected harness so we know where to spend Pallas effort.
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

from comet_tpu.config import get_config
from comet_tpu.models import (
    BaseTracker,
    BasicEncoder,
    COMET,
    CameraPredictor,
    DinoViT,
    ShallowEncoder,
)
from comet_tpu.models.refine import refine_track
from comet_tpu.ops import resize_bilinear_align_corners, extract_patches
from comet_tpu.utils.profiling import benchmark_fn

cfg = get_config("ours")
tc = cfg.tracker
dtype = cfg.dtype
key = jax.random.PRNGKey(0)
B, S, H, N = 1, cfg.seqlen, cfg.img_size, cfg.track_num

images = jax.random.normal(key, (B, S, H, H, 3), jnp.float32)
queries = (jax.random.uniform(key, (B, N, 2)) * (H - 64) + 32).astype(jnp.float32)


def report(name, stats):
    print(f"{name:30s} {stats['ms_per_call']:8.2f} ms  ({stats['calls_per_sec']:.2f}/s)")


# 1. ViT backbone on 16 frames @ 336
vit = DinoViT(img_size=336, dtype=dtype)
imgs336 = jax.random.normal(key, (S, 336, 336, 3), jnp.float32).astype(dtype)
vit_params = jax.jit(vit.init)(key, imgs336)
report("ViT backbone (16 frames)", benchmark_fn(lambda p, x: vit.apply(p, x), vit_params, imgs336, reps=8))

# 2. full camera predictor
cam = CameraPredictor(dtype=dtype)
traj = (jax.random.uniform(key, (B, S, N, 2)) * H).astype(jnp.float32)
conf = jax.random.uniform(key, (B, S, N))
cam_params = jax.jit(cam.init)(key, images, traj, conf)
report("camera predictor (full)", benchmark_fn(lambda p, im, tr, cf: cam.apply(p, im, tr, cf), cam_params, images, traj, conf, reps=8))

# 3. coarse fnet
enc = BasicEncoder(output_dim=tc.coarse_latent_dim, stride=tc.coarse_stride, dtype=dtype)
imgs_half = jax.random.normal(key, (B * S, H // 2, H // 2, 3), jnp.float32).astype(dtype)
enc_params = jax.jit(enc.init)(key, imgs_half)
report("coarse fnet (BasicEncoder)", benchmark_fn(lambda p, x: enc.apply(p, x), enc_params, imgs_half, reps=8))

# 4. coarse tracker (4 iters)
fmaps = jax.random.normal(key, (B, S, H // 8, H // 8, tc.coarse_latent_dim), dtype)
trk = BaseTracker(
    stride=tc.coarse_stride, corr_levels=tc.coarse_corr_levels,
    corr_radius=tc.coarse_corr_radius, latent_dim=tc.coarse_latent_dim,
    hidden_size=tc.coarse_hidden_size, depth=tc.coarse_depth, dtype=dtype,
)
trk_params = jax.jit(lambda k, q, f: trk.init(k, q, f, iters=tc.coarse_iters))(key, queries, fmaps)
report(
    "coarse tracker (4 iters)",
    benchmark_fn(
        lambda p, q, f: trk.apply(p, q, f, iters=tc.coarse_iters, down_ratio=2).coord_preds,
        trk_params, queries, fmaps, reps=8,
    ),
)

# 5. patch extraction alone
coarse_pred = (jax.random.uniform(key, (B, S, N, 2)) * (H - 40) + 20).astype(jnp.float32)
tl = jnp.clip(jnp.floor(coarse_pred).astype(jnp.int32) - 15, 0, H - 31)
report(
    "patch extraction (8192x31x31)",
    benchmark_fn(
        lambda im, t: extract_patches(im, t, 31),
        images.reshape(B * S, H, H, 3), tl.reshape(B * S, N, 2),
        reps=8,
    ),
)

# 6. fine fnet on all patches
fine_enc = ShallowEncoder(output_dim=tc.fine_latent_dim, stride=1, dtype=dtype)
patches = jax.random.normal(key, (B * S * N, 31, 31, 3), jnp.float32).astype(dtype)
fine_params = jax.jit(fine_enc.init)(key, patches[:8])
report("fine fnet (8192 patches)", benchmark_fn(lambda p, x: fine_enc.apply(p, x), fine_params, patches, reps=8))

# 7. fine tracker (6 iters, 512 x S=16 x 31x31)
patch_feat = jax.random.normal(key, (B * N, S, 31, 31, tc.fine_latent_dim), dtype)
pq = (jax.random.uniform(key, (B * N, 1, 2)) * 20 + 5).astype(jnp.float32)
ftrk = BaseTracker(
    stride=1, corr_levels=tc.fine_corr_levels, corr_radius=tc.fine_corr_radius,
    latent_dim=tc.fine_latent_dim, hidden_size=tc.fine_hidden_size,
    depth=tc.fine_depth, fine=True, use_space_attn=False, dtype=dtype,
)
ftrk_params = jax.jit(lambda k, q, f: ftrk.init(k, q, f, iters=tc.fine_iters))(key, pq, patch_feat)
report(
    "fine tracker (6 iters)",
    benchmark_fn(
        lambda p, q, f: ftrk.apply(p, q, f, iters=tc.fine_iters).coord_preds,
        ftrk_params, pq, patch_feat, reps=8,
    ),
)

# 8. resize 512 -> 336 for 16 frames
report(
    "resize 512->336 (16 frames)",
    benchmark_fn(
        lambda im: resize_bilinear_align_corners(im, 336, 336),
        images.reshape(B * S, H, H, 3),
        reps=8,
    ),
)
