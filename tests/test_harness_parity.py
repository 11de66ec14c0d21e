"""HARNESS-vs-HARNESS parity: the reference's OWN eval loop
(`train_or_eval_fn(training=False)`, train_eval_func_new_cp5.py:514-823)
runs end-to-end — reference YTDataset on an on-disk fixture, reference
E2Epose2.COMET model, reference metric.py float-autocast block — and its
full per-epoch metric row is diffed against `comet_tpu.evaluate()` on the
same fixture with the same converted weights and the same query points.

This closes the last unproven link of the BASELINE "rotation error within
0.1°" chain (VERDICT round-2 item 1): module parity was already proven
(test_torch_parity*.py); this proves the whole data -> keypoints -> model
-> codec -> metric -> stats chain. No released best.bin exists in this
offline environment, so random reference weights stand in — if the two
harnesses agree on every metric for random weights, they agree for ported
real weights too.

Determinism pins:
- fixture n_frames == seq_len so the reference's np.random-driven
  `sample_with_max_gap` degenerates to [0..S-1] (start=randint(0,1)=0);
- both harnesses consume IDENTICAL integer-coordinate mask-interior query
  points (fake lightglue extractor on the reference side, callable
  keypoint backend on ours), exactly track_num of them, so the
  reference's `filter_and_pad` keeps everything without random padding
  (train_eval_func_new_cp5.py:261-314);
- fine tracker runs 2 iterations on both sides (the reference hardcodes
  6 inside refine_track; with RANDOM weights the refinement map is
  expansive — see test_torch_parity_full.py — so the per-iteration
  semantics are what random weights can certify).

Slow; run with -m slow.
"""

from __future__ import annotations

import importlib.util
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax

import _torch_ref

pytestmark = pytest.mark.slow

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_spec = importlib.util.spec_from_file_location(
    "convert_torch_weights", os.path.join(_REPO, "tools", "convert_torch_weights.py")
)
cw = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(cw)


class NS(dict):
    """Attribute + .get() access — the OmegaConf surface the harness uses."""

    def __init__(self, **kw):
        super().__init__(**kw)
        self.__dict__.update(kw)


S, IMG, N_TRACKS, DOWN = 3, 64, 256, 112


def _ref_cfg():
    return NS(
        enable_track=True,
        enable_pose=True,
        window_len=S,
        freeze_track=True,
        fine_tracker=True,
        softmax_refine=False,
        track_trainit=2,
        camera_iter=4,
        track_conf=False,
        weight_trans=1.0,
        weight_rot=2.0,
        track_by_spsg=True,
        labor_input_traj=False,
        visual_track=False,
        visual_pose=False,
        default_focal_length=1745,
        MODEL=NS(TRACK=NS(efficient_corr=False)),
        train=NS(
            dataset="AMD", fix_first_cor=True, track_num=N_TRACKS,
            print_interval=10_000, eval_print_interval=10_000, clip_grad=0,
        ),
    )


def _our_cfg():
    from comet_tpu.config import CameraConfig, TrackerConfig, get_config

    return get_config("ours").replace(
        seqlen=S, img_size=IMG, track_num=N_TRACKS, min_track_num=N_TRACKS,
        compute_dtype="float32", dataset="AMD",
        tracker=TrackerConfig(
            coarse_stride=4, coarse_down_ratio=2, coarse_corr_levels=2,
            coarse_corr_radius=2, coarse_latent_dim=16, coarse_hidden_size=32,
            coarse_depth=2, coarse_iters=2, fine_corr_levels=3,
            fine_corr_radius=2, fine_latent_dim=8, fine_hidden_size=16,
            fine_depth=2, fine_iters=2, fine_pradius=15, fine_sradius=2,
        ),
        camera=CameraConfig(
            hidden_size=768, num_heads=8, att_depth=2, trunk_depth=2,
            down_size=DOWN,
        ),
    )


def _interior_points(mask: np.ndarray, n: int) -> np.ndarray:
    """n integer-coordinate (x, y) points strictly inside the mask,
    deterministic (evenly strided over the interior)."""
    ys, xs = np.nonzero(mask)
    assert len(ys) >= n, f"fixture mask too small: {len(ys)} < {n}"
    idx = np.linspace(0, len(ys) - 1, n).round().astype(int)
    return np.stack([xs[idx], ys[idx]], axis=1).astype(np.float32)


def _scalars(d) -> dict:
    out = {}
    for k, v in d.items():
        if isinstance(v, (int, float)):
            out[k] = float(v)
        elif torch.is_tensor(v) and v.numel() == 1:
            out[k] = float(v)
    return out


def test_reference_eval_harness_row_parity(monkeypatch, tmp_path):
    _torch_ref.install_harness()
    torch.manual_seed(0)
    torch.set_grad_enabled(False)
    # the reference metric block hardcodes .cuda() (metric.py:337-338);
    # make it a no-op so the harness runs on CPU
    monkeypatch.setattr(torch.Tensor, "cuda", lambda self, *a, **k: self)
    monkeypatch.setattr(
        torch.nn.Module, "cuda", lambda self, *a, **k: self
    )

    import train_eval_func_new_cp5 as tef
    import kubric_movif_SFM_dataset_YT as ref_ds_mod
    import E2Epose2 as ref_e2e
    import lightglue

    from comet_tpu.data.datasets import AMDDataset
    from comet_tpu.data.fixtures import generate_amd_fixture
    from comet_tpu.models import COMET
    from comet_tpu.training.loop import evaluate

    root = str(tmp_path / "AMD_eval")
    generate_amd_fixture(root, n_seqs=2, n_frames=S)

    # ---- our dataset first: query points per sequence from the mask ----
    cfg = _our_cfg()
    our_ds = AMDDataset(root, crop_size=IMG, seq_len=S, use_augs=False)
    assert len(our_ds) == 2
    pts_by_seq = {}
    for i in range(len(our_ds)):
        s = our_ds[i]
        pts_by_seq[s.seq_name] = _interior_points(
            np.asarray(s.first_mask), N_TRACKS
        )

    # ---- reference model (random weights), assembled via the REAL
    # hydra-instantiate path E2Epose2 uses ----
    refcfg = _ref_cfg()
    tc = cfg.tracker
    coarse = NS(
        stride=tc.coarse_stride, down_ratio=tc.coarse_down_ratio,
        FEATURENET={
            "_target_": "models.track_modules.blocks.BasicEncoder",
            "input_dim": 3, "output_dim": tc.coarse_latent_dim,
        },
        PREDICTOR={
            "_target_": "models.track_modules.base_track_predictor.BaseTrackerPredictor",
            "corr_levels": tc.coarse_corr_levels,
            "corr_radius": tc.coarse_corr_radius,
            "latent_dim": tc.coarse_latent_dim,
            "hidden_size": tc.coarse_hidden_size,
            "use_spaceatt": True, "depth": tc.coarse_depth, "fine": False,
        },
    )
    fine = NS(
        stride=1,
        FEATURENET={
            "_target_": "models.track_modules.blocks.ShallowEncoder",
            "input_dim": 3, "output_dim": tc.fine_latent_dim,
        },
        PREDICTOR={
            "_target_": "models.track_modules.base_track_predictor.BaseTrackerPredictor",
            "corr_levels": tc.fine_corr_levels,
            "corr_radius": tc.fine_corr_radius,
            "latent_dim": tc.fine_latent_dim,
            "hidden_size": tc.fine_hidden_size,
            "use_spaceatt": False, "depth": tc.fine_depth, "fine": True,
        },
    )
    track_conf = {
        "_target_": "models.track_predictor.TrackerPredictor",
        "COARSE": coarse, "FINE": fine,
    }
    camera_conf = {
        "_target_": "models.camera_predictor10.CameraPredictor",
        "hidden_size": 768, "num_heads": 8, "mlp_ratio": 4,
        "down_size": DOWN, "att_depth": cfg.camera.att_depth,
        "trunk_depth": cfg.camera.trunk_depth, "backbone": "dinov2b",
    }

    dino = _torch_ref.build_torch_dinov2(img_size=DOWN, depth=12)
    monkeypatch.setattr(torch.hub, "load", lambda *a, **k: dino)
    t_model = ref_e2e.COMET(TRACK=track_conf, CAMERA=camera_conf, cfg=refcfg)
    t_model.eval()

    # ---- convert the SAME weights for our model (before any wrapping) ----
    import jax.numpy as jnp

    model = COMET(cfg)
    dummy_imgs = jnp.zeros((1, S, IMG, IMG, 3), jnp.float32)
    dummy_q = jnp.full((1, N_TRACKS, 2), IMG / 2.0, jnp.float32)
    params = model.init(jax.random.PRNGKey(0), dummy_imgs, dummy_q)
    converted, missing, unmapped = cw.convert(
        t_model.state_dict(), params, cfg, strict=True
    )

    # the reference hardcodes 6 fine iterations inside refine_track
    # (refine_track.py:136); pin both sides to cfg.tracker.fine_iters
    class _FineWrap(torch.nn.Module):
        def __init__(self, inner):
            super().__init__()
            self.inner = inner

        def forward(self, query_points=None, fmaps=None, iters=6, **kw):
            return self.inner(
                query_points=query_points, fmaps=fmaps,
                iters=tc.fine_iters, **kw,
            )

    t_model.track_predictor.fine_predictor = _FineWrap(
        t_model.track_predictor.fine_predictor
    )

    # ---- reference harness run (its own dataset + dataloader + stats) ----
    ref_ds = ref_ds_mod.YTDataset(
        data_root=root, crop_size=(IMG, IMG), seq_len=S, use_augs=False,
        split="valid",
    )
    assert ref_ds.seq_names == [s.replace("\\", "/") for s in our_ds.seq_names]
    loader = torch.utils.data.DataLoader(ref_ds, batch_size=1, shuffle=False)

    # inject the identical query points, in dataset order
    queue = [torch.from_numpy(pts_by_seq[name]) for name in ref_ds.seq_names]

    def sp_extract(self, img):
        return {"keypoints": queue[sp_extract.calls.__next__()][None]}

    sp_extract.calls = iter(range(len(queue)))
    monkeypatch.setattr(lightglue.SuperPoint, "extract", sp_extract)

    class FakeStats:
        def __init__(self):
            self.rows = []

        def update(self, predictions, time_start=None, stat_set=None):
            self.rows.append(_scalars(predictions))

        def get_status_string(self, **kw):
            return ""

    class FakeAccel:
        device = torch.device("cpu")

        @staticmethod
        def print(*a, **k):
            pass

    stats = FakeStats()
    tef.train_or_eval_fn(
        t_model, loader, refcfg, None, stats, FakeAccel(), None,
        training=False,
    )
    assert len(stats.rows) == 2
    ref_row = {
        k: float(np.mean([r[k] for r in stats.rows if k in r]))
        for k in set().union(*stats.rows)
    }

    # ---- our harness on the same fixture/weights/queries ----
    ours = evaluate(
        model, converted, our_ds, cfg,
        keypoint_backend=lambda smp: pts_by_seq[smp.seq_name],
        print_fn=lambda *a: None,
    )

    # ---- diff the full metric row ----
    compare = [
        "loss", "loss_trans", "loss_rot",
        "R_avg", "T_avg", "Tx_mse", "Ty_mse", "Tz_mse",
        "X_err", "Y_err", "Z_err",
        "acc@5deg_x", "acc@5deg_y", "acc@5deg_z",
        "Racc_him_5", "Racc_him_10", "Racc_him_15",
        "Tacc_him_5", "Tacc_him_10", "Tacc_him_15",
        "Auc_30", "Auc_10", "Auc_5", "Auc_3",
    ] + [f"Auc_scene_{n}" for n in ref_ds.seq_names]
    mismatches = []
    for key in compare:
        assert key in ref_row, f"reference harness row missing {key}"
        assert key in ours, f"our evaluate() row missing {key}"
        a, b = ref_row[key], ours[key]
        if not np.isclose(a, b, rtol=5e-3, atol=5e-3):
            mismatches.append(f"{key}: ref={a:.6f} ours={b:.6f}")
    assert not mismatches, "metric row mismatch:\n" + "\n".join(mismatches)
