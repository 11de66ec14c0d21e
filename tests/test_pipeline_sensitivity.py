"""Input-pipeline sensitivity: host PIL LANCZOS vs device sampling-matrix
LANCZOS vs device bilinear, through the full evaluate() chain.

Companion to test_keypoint_sensitivity (same recipe, different knob): the
SAME fixture and the SAME weights are evaluated under all three input
pipelines, the metric deltas are printed, and the device-LANCZOS row must
track the host row tightly (it is the parity filter; bilinear is the
serving fast path and may drift slightly more).
"""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.slow

DEG_KEYS = ("R_avg", "X_err", "Y_err", "Z_err")
FRAC_KEYS = ("Auc_30", "acc@5deg_x", "acc@5deg_y", "acc@5deg_z")


def test_metrics_under_input_pipelines(tmp_path, capsys):
    from comet_tpu.config import CameraConfig, TrackerConfig, get_config
    from comet_tpu.data.datasets import AMDDataset
    from comet_tpu.data.device_pipeline import DevicePreprocessDataset
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
    host_ds = AMDDataset(root, crop_size=img, seq_len=s, use_augs=False)
    datasets = {
        "host-lanczos": host_ds,
        "device-lanczos": DevicePreprocessDataset(host_ds, resample="lanczos"),
        "device-bilinear": DevicePreprocessDataset(host_ds, resample="bilinear"),
    }

    import jax.numpy as jnp

    model = COMET(cfg)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0),
        jnp.zeros((1, s, img, img, 3), jnp.float32),
        jnp.full((1, n_tracks, 2), img / 2.0, jnp.float32),
    )

    rows = {}
    for name, ds in datasets.items():
        rows[name] = evaluate(
            model, params, ds, cfg, keypoint_backend="grid",
            print_fn=lambda *a: None,
        )

    report = ["input-pipeline sensitivity (random weights, 2-seq fixture):"]
    for key in DEG_KEYS + FRAC_KEYS:
        vals = {n: rows[n][key] for n in datasets}
        report.append(f"  {key}: " + "  ".join(
            f"{n}={v:.4f}" for n, v in vals.items()
        ))
    print("\n".join(report))

    for n in datasets:
        for key in DEG_KEYS + FRAC_KEYS:
            assert np.isfinite(rows[n][key]), (n, key)

    # device LANCZOS is the parity filter: its metric row must track the
    # host row tightly (sub-degree rotation deltas; the only difference is
    # PIL's per-pass uint8 rounding)
    for key in DEG_KEYS:
        d = abs(rows["device-lanczos"][key] - rows["host-lanczos"][key])
        assert d < 1.0, (key, d, rows["device-lanczos"][key],
                         rows["host-lanczos"][key])
    for key in FRAC_KEYS:
        d = abs(rows["device-lanczos"][key] - rows["host-lanczos"][key])
        assert d < 0.15, (key, d)
