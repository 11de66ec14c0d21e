"""End-to-end demo CLI on the DCA fixture (slow).

Locks in the whole `cli demo` surface the reference's test_e2epose2.py
provides (train_eval_func_new_cp5.py:679-767): per-sequence results.json
(schema of :719-746), pose-axes renders, GLB + HTML scene export, and the
COLMAP text model added by this round. Runs in-process on the CPU test
backend with a tiny config.
"""

import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow


class TestDemoEndToEnd:
    def test_demo_writes_all_artifacts(self, tmp_path):
        from comet_tpu.data.fixtures import generate_dca_fixture
        from comet_tpu import cli

        data_root = generate_dca_fixture(
            str(tmp_path / "dca"), n_seqs=1, n_frames=4
        )
        out_dir = str(tmp_path / "out")
        cli.main([
            "demo", "--data-root", data_root, "--output-dir", out_dir,
            "--seqlen", "4", "--img-size", "256", "--track-num", "64",
            "--max-sequences", "1",
        ])

        seqs = [d for d in os.listdir(out_dir) if os.path.isdir(
            os.path.join(out_dir, d)) and not d.endswith("_colmap")]
        assert seqs, os.listdir(out_dir)
        seq = seqs[0]

        # 1. results.json with the reference schema
        jp = os.path.join(out_dir, seq, "metrics", "results.json")
        with open(jp) as f:
            data = json.load(f)
        assert set(data) == {"sequence_name", "metrics", "trajectory"}
        assert len(data["trajectory"]) == 4
        frame0 = data["trajectory"][0]
        assert set(frame0) == {"frame_idx", "pred", "gt"}
        assert set(frame0["pred"]) == {"R_quat", "T"}
        m = data["metrics"]
        for key in ("R_avg", "T_avg", "Euler_Error_XYZ", "Acc_5deg_XYZ",
                    "MSE_T_XYZ", "AUC", "Accuracy_Him"):
            assert key in m, key
        assert set(m["AUC"]) == {"Auc_30", "Auc_10", "Auc_5", "Auc_3"}
        assert np.isfinite(m["R_avg"])

        # 2. scene exports
        glb = os.path.join(out_dir, f"{seq}_scene.glb")
        html = os.path.join(out_dir, f"{seq}_scene.html")
        assert os.path.exists(glb) and os.path.getsize(glb) > 100
        assert os.path.exists(html)
        from comet_tpu.utils.scene_export import parse_glb

        parsed = parse_glb(glb)
        assert parsed is not None

        # 3. COLMAP text model parses and reprojects finitely
        cdir = os.path.join(out_dir, f"{seq}_scene_colmap")
        from comet_tpu.utils.colmap_io import colmap_to_batch, read_model_text

        model = read_model_text(cdir)
        assert len(model.images) == 4
        assert len(model.cameras) == 1  # shared camera
        pts, ext, intr, _ = colmap_to_batch(model)
        assert ext.shape == (4, 3, 4) and np.isfinite(ext).all()
        # every observation id resolves
        for im in model.images.values():
            for pid in im.point3d_ids:
                assert int(pid) in model.points3d
