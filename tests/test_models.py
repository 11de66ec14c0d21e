"""Shape/jit/behavior tests for the model stack (tiny shapes, CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from comet_tpu.config import get_config
from comet_tpu.models import (
    AttnBlock,
    BaseTracker,
    BasicEncoder,
    COMET,
    CameraPredictor,
    CrossAttnBlock,
    DinoViT,
    EfficientUpdateFormer,
    Mlp,
    ResidualBlock,
    ShallowEncoder,
    decode_predictions,
    encode_gt,
    pose_loss,
    tracker_transformer_dim,
)
from comet_tpu.geometry import make_camera_set


KEY = jax.random.PRNGKey(0)


def tiny_config():
    """Scaled-down config so tests run fast on one CPU core."""
    cfg = get_config("ours")
    cfg = cfg.replace(
        seqlen=3,
        img_size=64,
        track_num=8,
        compute_dtype="float32",
        tracker=cfg.tracker.__class__(
            coarse_stride=4,
            coarse_down_ratio=2,
            coarse_corr_levels=2,
            coarse_corr_radius=2,
            coarse_latent_dim=16,
            coarse_hidden_size=32,
            coarse_depth=2,
            coarse_iters=2,
            fine_corr_levels=3,
            fine_corr_radius=2,
            fine_latent_dim=8,
            fine_hidden_size=16,
            fine_depth=2,
            fine_iters=2,
            fine_pradius=7,
            fine_sradius=2,
        ),
        camera=cfg.camera.__class__(
            hidden_size=32,
            num_heads=2,
            att_depth=1,
            trunk_depth=1,
            down_size=28,
        ),
    )
    return cfg


def tiny_vit_kwargs():
    return dict(img_size=28, patch_size=14, embed_dim=32, depth=2, num_heads=2)


class TestBlocks:
    def test_mlp_gelu_matches_torch(self, rng):
        import torch

        x = rng.normal(size=(2, 5)).astype(np.float32)
        model = Mlp(hidden_features=7, out_features=3)
        params = model.init(KEY, jnp.asarray(x))
        ours = model.apply(params, jnp.asarray(x))
        # rebuild in torch with the same weights: exact GELU
        w1 = np.asarray(params["params"]["fc1"]["kernel"])
        b1 = np.asarray(params["params"]["fc1"]["bias"])
        w2 = np.asarray(params["params"]["fc2"]["kernel"])
        b2 = np.asarray(params["params"]["fc2"]["bias"])
        t = torch.from_numpy(x)
        h = torch.nn.functional.gelu(t @ torch.from_numpy(w1) + torch.from_numpy(b1))
        expect = (h @ torch.from_numpy(w2) + torch.from_numpy(b2)).numpy()
        np.testing.assert_allclose(np.asarray(ours), expect, atol=1e-5)

    def test_attn_block_shapes(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 7, 16)).astype(np.float32))
        model = AttnBlock(num_heads=4)
        params = model.init(KEY, x)
        y = model.apply(params, x)
        assert y.shape == x.shape

    def test_cross_attn_block_shapes(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 5, 16)).astype(np.float32))
        ctx = jnp.asarray(rng.normal(size=(2, 9, 16)).astype(np.float32))
        model = CrossAttnBlock(num_heads=2)
        params = model.init(KEY, x, ctx)
        y = model.apply(params, x, ctx)
        assert y.shape == x.shape

    def test_residual_block_downsample(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 8, 8, 4)).astype(np.float32))
        model = ResidualBlock(planes=6, stride=2)
        params = model.init(KEY, x)
        y = model.apply(params, x)
        assert y.shape == (1, 4, 4, 6)


class TestEncoders:
    def test_basic_encoder_output_size(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32))
        model = BasicEncoder(output_dim=16, stride=4)
        params = model.init(KEY, x)
        y = model.apply(params, x)
        assert y.shape == (2, 8, 8, 16)

    def test_shallow_encoder_output_size(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 15, 15, 3)).astype(np.float32))
        model = ShallowEncoder(output_dim=8, stride=1)
        params = model.init(KEY, x)
        y = model.apply(params, x)
        assert y.shape == (2, 15, 15, 8)


class TestUpdateFormer:
    def test_shapes_with_space_attn(self, rng):
        x = jnp.asarray(rng.normal(size=(1, 6, 4, 20)).astype(np.float32))
        model = EfficientUpdateFormer(
            space_depth=2, time_depth=2, hidden_size=16, num_heads=2,
            output_dim=10, num_virtual_tracks=3,
        )
        params = model.init(KEY, x)
        y = model.apply(params, x)
        assert y.shape == (1, 6, 4, 10)

    def test_shapes_time_only(self, rng):
        x = jnp.asarray(rng.normal(size=(2, 3, 4, 12)).astype(np.float32))
        model = EfficientUpdateFormer(
            space_depth=0, time_depth=2, hidden_size=16, num_heads=2,
            output_dim=6, add_space_attn=False,
        )
        params = model.init(KEY, x)
        assert model.apply(params, x).shape == (2, 3, 4, 6)


class TestTracker:
    def test_transformer_dim_rule(self):
        # coarse: 5*(9^2) + 256 = 661 -> 664; fine: 3*49+64=211 -> 216
        assert tracker_transformer_dim(5, 4, 128, False) == 664
        assert tracker_transformer_dim(3, 3, 32, True) == 216

    def test_tracker_pins_frame0_and_shapes(self, rng):
        b, s, n, c, hh = 1, 3, 5, 16, 16
        fmaps = jnp.asarray(rng.normal(size=(b, s, hh, hh, c)).astype(np.float32))
        queries = jnp.asarray((rng.random((b, n, 2)) * 40 + 10).astype(np.float32))
        model = BaseTracker(
            stride=4, corr_levels=2, corr_radius=2, latent_dim=c,
            hidden_size=32, depth=2, use_space_attn=True,
        )
        params = model.init(KEY, queries, fmaps, iters=2)
        out = model.apply(params, queries, fmaps, iters=2, down_ratio=1)
        assert out.coord_preds.shape == (2, b, s, n, 2)
        assert out.vis.shape == (b, s, n)
        # frame 0 pinned to queries in the original scale
        np.testing.assert_allclose(
            np.asarray(out.coord_preds[-1][:, 0]), np.asarray(queries), atol=1e-4
        )

    def test_tracker_translation_recovery(self, rng):
        """A feature map translated by a constant offset: after iterations
        the tracked points should move toward the offset (sanity on the
        correlation + update machinery, not exactness)."""
        b, s, n, c, hh = 1, 2, 4, 8, 24
        base = rng.normal(size=(hh + 4, hh + 4, c)).astype(np.float32)
        f0 = base[:hh, :hh]
        f1 = base[2 : hh + 2, 2 : hh + 2]  # frame 1 = frame 0 shifted by (2, 2)
        fmaps = jnp.asarray(np.stack([f0, f1])[None])
        queries = jnp.asarray((rng.random((b, n, 2)) * 30 + 20).astype(np.float32))
        model = BaseTracker(
            stride=4, corr_levels=2, corr_radius=3, latent_dim=c,
            hidden_size=32, depth=2, use_space_attn=False,
        )
        params = model.init(KEY, queries, fmaps, iters=2)
        out = model.apply(params, queries, fmaps, iters=2, down_ratio=1)
        assert np.isfinite(np.asarray(out.coord_preds)).all()


class TestViT:
    def test_patch_tokens_shape(self, rng):
        model = DinoViT(**tiny_vit_kwargs())
        x = jnp.asarray(rng.normal(size=(2, 28, 28, 3)).astype(np.float32))
        params = model.init(KEY, x)
        y = model.apply(params, x)
        assert y.shape == (2, 4, 32)  # 2x2 grid of 14px patches


@pytest.mark.slow  # ViT forwards, ~2 min total
class TestCameraPredictor:
    def _build(self, use_trajectory=True, use_time=True, use_gapr=True):
        return CameraPredictor(
            hidden_size=32, num_heads=2, att_depth=1, trunk_depth=1,
            down_size=28, use_trajectory=use_trajectory, use_time=use_time,
            use_gapr=use_gapr,
        )

    def test_full_model_output(self, rng):
        b, s, n = 1, 3, 6
        imgs = jnp.asarray(rng.normal(size=(b, s, 32, 32, 3)).astype(np.float32))
        traj = jnp.asarray((rng.random((b, s, n, 2)) * 30).astype(np.float32))
        conf = jnp.asarray(rng.random((b, s, n)).astype(np.float32))
        model = self._build()
        params = model.init(KEY, imgs, traj, conf)
        preds = model.apply(params, imgs, traj, conf)
        assert preds.pred_pose_enc.shape == (b, s, 7)
        # frame 0 forced to identity
        np.testing.assert_allclose(
            np.asarray(preds.pred_pose_enc[:, 0]), [[0, 0, 0, 1, 0, 0, 0]], atol=1e-6
        )
        # quaternions normalized
        norms = np.linalg.norm(np.asarray(preds.pred_pose_enc[..., 3:7]), axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-5)

    @pytest.mark.parametrize(
        "flags",
        [
            dict(use_trajectory=False, use_time=False, use_gapr=False),
            dict(use_trajectory=False),
            dict(use_time=False),
            dict(use_gapr=False),
        ],
    )
    def test_ablations(self, rng, flags):
        b, s, n = 1, 2, 4
        imgs = jnp.asarray(rng.normal(size=(b, s, 28, 28, 3)).astype(np.float32))
        traj = jnp.asarray((rng.random((b, s, n, 2)) * 20).astype(np.float32))
        conf = jnp.asarray(rng.random((b, s, n)).astype(np.float32))
        model = self._build(**flags)
        params = model.init(KEY, imgs, traj, conf)
        preds = model.apply(params, imgs, traj, conf)
        assert preds.pred_pose_enc.shape == (b, s, 7)


@pytest.mark.slow  # full-model forward, ~90 s
class TestCOMET:
    def test_end_to_end_forward_and_loss(self, rng):
        cfg = tiny_config()
        b, s, n = 1, cfg.seqlen, cfg.track_num
        imgs = jnp.asarray(rng.normal(size=(b, s, cfg.img_size, cfg.img_size, 3)).astype(np.float32))
        queries = jnp.asarray((rng.random((b, n, 2)) * (cfg.img_size - 20) + 10).astype(np.float32))

        model = COMET(cfg)
        params = model.init(KEY, imgs, queries)
        out = model.apply(params, imgs, queries)

        assert out["pred_pose_enc"].shape == (b, s, 7)
        assert out["pred_track"].shape == (b, s, n, 2)
        assert out["track_score"].shape == (b, s, n)
        assert np.isfinite(np.asarray(out["pred_pose_enc"])).all()

        # gt cameras + loss + decode
        q = rng.normal(size=(s, 4))
        q /= np.linalg.norm(q, axis=-1, keepdims=True)
        t_xyz = rng.normal(size=(s, 3))
        t_uvz = rng.normal(size=(s, 3))
        t_uvz[:, 2] = np.abs(t_uvz[:, 2]) + 2
        cams = make_camera_set(q=q, t_xyz=t_xyz, t_uvz=t_uvz, ratio=0.6)
        gt_enc = encode_gt(cfg, cams)
        losses = pose_loss(cfg, out["pred_pose_enc"], gt_enc[None])
        assert np.isfinite(float(losses["loss"]))
        q_abs, t_abs = decode_predictions(cfg, out["pred_pose_enc"], cams)
        assert q_abs.shape == (b, s, 4)
        assert t_abs.shape == (b, s, 3)
