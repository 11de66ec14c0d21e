"""Keypoint-seeding sensitivity (VERDICT round-2 item 10).

The reference seeds tracks from SuperPoint+SIFT detections
(train_eval_func_new_cp5.py:527-592); this repo's default backend is a
Shi-Tomasi+DoG stand-in because pretrained SuperPoint weights are
unreachable offline. The untested claim from round 1 was that the pose
metrics are insensitive to the seeding backend — the camera predictor
consumes trajectories through confidence-weighted attention, not exact
keypoint identities. This test quantifies it: the SAME fixture and the
SAME weights are evaluated under all three backends (corners / grid /
weightless-superpoint) and the resulting metric rows are recorded and
bounded against each other.
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow

BACKENDS = ("corners", "grid", "superpoint")
# metrics whose backend-to-backend spread we bound: rotation metrics are
# in degrees, Auc/acc in [0, 1]
DEG_KEYS = ("R_avg", "X_err", "Y_err", "Z_err")
FRAC_KEYS = ("Auc_30", "acc@5deg_x", "acc@5deg_y", "acc@5deg_z")


def test_pose_metrics_insensitive_to_seeding_backend(tmp_path, capsys):
    from comet_tpu.config import get_config, TrackerConfig, CameraConfig
    from comet_tpu.data.datasets import AMDDataset
    from comet_tpu.data.fixtures import generate_amd_fixture
    from comet_tpu.models import COMET
    from comet_tpu.training.loop import evaluate

    s, img, n_tracks = 4, 64, 128
    cfg = get_config("ours").replace(
        seqlen=s, img_size=img, track_num=n_tracks, min_track_num=64,
        compute_dtype="float32",
        tracker=TrackerConfig(
            coarse_stride=4, coarse_down_ratio=2, coarse_corr_levels=2,
            coarse_corr_radius=2, coarse_latent_dim=16, coarse_hidden_size=32,
            coarse_depth=2, coarse_iters=2, fine_corr_levels=3,
            fine_corr_radius=2, fine_latent_dim=8, fine_hidden_size=16,
            fine_depth=2, fine_iters=2, fine_pradius=15, fine_sradius=2,
        ),
        camera=CameraConfig(
            hidden_size=128, num_heads=4, att_depth=2, trunk_depth=2,
            down_size=112,
        ),
    )
    root = str(tmp_path / "AMD_eval")
    generate_amd_fixture(root, n_seqs=2, n_frames=s + 2)
    ds = AMDDataset(root, crop_size=img, seq_len=s, use_augs=False)

    import jax.numpy as jnp

    model = COMET(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, s, img, img, 3), jnp.float32),
        jnp.full((1, n_tracks, 2), img / 2.0, jnp.float32),
    )

    rows = {}
    for backend in BACKENDS:
        rows[backend] = evaluate(
            model, params, ds, cfg, keypoint_backend=backend,
            print_fn=lambda *a: None,
        )

    # record the actual deltas so the suite output documents them
    # (VERDICT: "or record the actual deltas")
    report = ["keypoint-backend sensitivity (random weights, 2-seq fixture):"]
    for key in DEG_KEYS + FRAC_KEYS:
        vals = {b: rows[b][key] for b in BACKENDS}
        spread = max(vals.values()) - min(vals.values())
        report.append(f"  {key}: " + "  ".join(
            f"{b}={v:.4f}" for b, v in vals.items()
        ) + f"  spread={spread:.4f}")
    print("\n".join(report))

    # every backend produced a complete, finite metric row
    for b in BACKENDS:
        for key in DEG_KEYS + FRAC_KEYS:
            assert np.isfinite(rows[b][key]), (b, key)

    # bounded spread: with shared weights the backend choice must not move
    # rotation metrics by more than a few degrees nor the AUC/accuracy
    # fractions grossly (random weights make the predictions themselves
    # poor, but they are a deterministic function of images + seeds; the
    # trajectory-attention pathway is where seeds can matter).
    for key in DEG_KEYS:
        vals = [rows[b][key] for b in BACKENDS]
        spread = max(vals) - min(vals)
        assert spread < 15.0, (key, vals)
    for key in FRAC_KEYS:
        vals = [rows[b][key] for b in BACKENDS]
        spread = max(vals) - min(vals)
        assert spread < 0.35, (key, vals)
