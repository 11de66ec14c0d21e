"""Patch utilities, DINOv2 backbone registry model, stdout capture.

Reference surfaces: gluefactory/utils/patches.py (torch-parity-tested by
loading the reference file itself), gluefactory/models/backbones/dinov2.py
(shape/contract tests — the reference downloads torch.hub weights, absent
here), gluefactory/utils/stdout_capturing.py (terminal-semantics parity).
"""

import importlib.util

import numpy as np
import pytest

from comet_tpu.matching.patches import (
    batch_extract_patches,
    build_heatmap,
    draw_image_patches,
    extract_patches,
)
from comet_tpu.matching.capture import (
    apply_backspaces_and_linefeeds,
    capture_outputs,
)


def _load_ref(name, path):
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


class TestExtractPatches:
    def test_interior_patch_values(self):
        img = np.arange(3 * 12 * 16, dtype=np.float32).reshape(3, 12, 16)
        corners = np.array([[4.0, 2.0], [0.0, 0.0]])
        patches, out_corners = extract_patches(img, corners, ps=5)
        assert patches.shape == (2, 3, 5, 5)
        np.testing.assert_array_equal(
            np.asarray(patches[0]), img[:, 2:7, 4:9]
        )
        np.testing.assert_array_equal(np.asarray(out_corners[0]), [4.0, 2.0])

    def test_clamp_uses_reference_bound(self):
        # reference clamps to dim - 1 - ps (utils/patches.py:10-12)
        img = np.zeros((1, 10, 10), np.float32)
        _, corners = extract_patches(
            img, np.array([[99.0, -5.0]]), ps=3
        )
        assert corners[0, 0] == 10 - 1 - 3
        assert corners[0, 1] == 0

    @pytest.mark.slow
    def test_parity_vs_reference(self):
        import torch

        ref = _load_ref(
            "gf_patches", "/root/reference/gluefactory/utils/patches.py"
        )
        rng = np.random.RandomState(3)
        img = rng.randn(2, 3, 24, 30).astype(np.float32)
        kpts = rng.uniform(0, 24, size=(2, 6, 2)).astype(np.float32)

        ours_p, ours_c = batch_extract_patches(img, kpts, ps=7)
        ref_p, ref_c = ref.batch_extract_patches(
            torch.from_numpy(img), torch.from_numpy(kpts), ps=7
        )
        np.testing.assert_allclose(np.asarray(ours_p), ref_p.numpy())
        np.testing.assert_allclose(np.asarray(ours_c), ref_c.numpy())

        # heatmap composition parity (single-channel input)
        img1 = rng.randn(2, 1, 24, 30).astype(np.float32)
        p1, c1 = batch_extract_patches(img1, kpts, ps=7)
        h_ours, m_ours = build_heatmap(img1, np.asarray(p1), np.asarray(c1))
        rp, rc = ref.batch_extract_patches(
            torch.from_numpy(img1), torch.from_numpy(kpts), ps=7
        )
        h_ref, m_ref = ref.build_heatmap(torch.from_numpy(img1), rp, rc)
        np.testing.assert_allclose(h_ours, h_ref.numpy())
        np.testing.assert_allclose(m_ours, m_ref.numpy())

    def test_draw_roundtrip(self):
        img = np.random.RandomState(0).rand(1, 2, 16, 16).astype(np.float32)
        patches, corners = batch_extract_patches(
            img, np.array([[[8.0, 8.0]]], np.float32), ps=4
        )
        canvas = np.zeros_like(img)
        draw_image_patches(canvas, np.asarray(patches), np.asarray(corners))
        x, y = int(corners[0, 0, 0]), int(corners[0, 0, 1])
        np.testing.assert_array_equal(
            canvas[0, :, y : y + 4, x : x + 4], img[0, :, y : y + 4, x : x + 4]
        )


class TestDinoV2Backbone:
    @pytest.mark.slow
    def test_output_contract(self):
        from comet_tpu.matching.registry import get_model

        bb = get_model(
            "backbone_dinov2", size=56, embed_dim=32, depth=1, num_heads=2
        )
        img = np.random.RandomState(0).rand(56, 56, 3).astype(np.float32)
        out = bb(img)
        # gluefactory/models/backbones/dinov2.py:22-28 output dict
        assert out["features"].shape == (1, 32, 4, 4)
        assert out["global_descriptor"].shape == (1, 32)
        assert out["descriptors"].shape == (1, 16, 32)
        np.testing.assert_allclose(
            np.asarray(out["features"]).reshape(1, 32, 16).transpose(0, 2, 1),
            np.asarray(out["descriptors"]),
            rtol=1e-6,
            atol=1e-6,
        )

    @pytest.mark.slow
    def test_torch_layout_and_resize(self):
        from comet_tpu.matching.registry import get_model

        bb = get_model(
            "backbone_dinov2",
            size=56,
            embed_dim=32,
            depth=1,
            num_heads=2,
            allow_resize=True,
        )
        img = np.random.RandomState(1).rand(2, 3, 61, 49).astype(np.float32)
        out = bb(img)  # [B, C, H, W] reference layout, resized on device
        # reference dinov2.py:18 semantics: each dim shrinks to the nearest
        # lower multiple of 14 (61x49 -> 56x42 -> 4x3 grid), aspect kept
        assert out["features"].shape == (2, 32, 4, 3)

        strict = get_model(
            "backbone_dinov2", size=56, embed_dim=32, depth=1, num_heads=2
        )
        with pytest.raises(ValueError):
            strict(np.zeros((2, 3, 61, 49), np.float32))


class TestCapture:
    def test_backspaces_parity_vs_reference(self):
        ref = _load_ref(
            "gf_stdout",
            "/root/reference/gluefactory/utils/stdout_capturing.py",
        )
        cases = [
            "plain\nlines\n",
            "progress 1\rprogress 2\rprogress 3\ndone\n",
            "abc\b\bXY\n",
            "tail carriage\r",
            "",
        ]
        for text in cases:
            assert apply_backspaces_and_linefeeds(text) == (
                ref.apply_backspaces_and_linefeeds(text)
            )

    def test_capture_outputs_tees_and_cooks(self, tmp_path, capsys):
        log = tmp_path / "log.txt"
        with capture_outputs(log):
            print("step 1\rstep 2\rstep 3")
            import sys

            print("on stderr", file=sys.stderr)
        cooked = log.read_text()
        assert "step 3" in cooked and "step 1" not in cooked
        assert "on stderr" in cooked
        # still reached the real streams (tee, not redirect); capsys
        # normalizes \r so only check the content survived
        captured = capsys.readouterr()
        assert "step 1" in captured.out and "step 3" in captured.out
        assert "on stderr" in captured.err
