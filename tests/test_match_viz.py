"""Two-view match visualization (matching/viz.py — viz2d equivalent)."""

import os

import numpy as np

from comet_tpu.matching.viz import (
    cm_RdGn,
    draw_epipolar_lines,
    draw_keypoints,
    draw_line_matches,
    draw_lines,
    draw_matches,
    heatmap_overlay,
    plot_cumulative_errors,
    side_by_side,
)

H, W = 48, 64


def _img(seed=0):
    return np.random.default_rng(seed).integers(0, 255, (H, W, 3), np.uint8)


class TestPrimitives:
    def test_cm_rdgn_endpoints(self):
        np.testing.assert_allclose(cm_RdGn(0.0), [1, 0, 0])
        np.testing.assert_allclose(cm_RdGn(1.0), [0, 1, 0])
        np.testing.assert_allclose(cm_RdGn([0.5]), [[0.5, 0.5, 0]])

    def test_side_by_side_offsets(self):
        canvas, off = side_by_side(_img(0), _img(1))
        assert off == W + 4
        assert canvas.shape == (H, 2 * W + 4, 3)
        np.testing.assert_array_equal(canvas[:, :W], _img(0))
        np.testing.assert_array_equal(canvas[:, off:], _img(1))

    def test_side_by_side_float_and_gray(self):
        canvas, _ = side_by_side(np.zeros((H, W)), np.ones((H, W, 3)) * 0.5)
        assert canvas.dtype == np.uint8
        assert (canvas[:, :W] == 0).all()


class TestDrawing:
    def test_keypoints_mark_pixels(self):
        img = np.zeros((H, W, 3), np.uint8)
        kpts = np.array([[10.0, 10.0], [30.0, 20.0]])
        out = draw_keypoints(img, kpts)
        assert (out[10, 10] == [0, 255, 0]).all()
        assert (out[20, 30] == [0, 255, 0]).all()
        # score coloring: 0 -> red, 1 -> green
        out2 = draw_keypoints(img, kpts, scores=np.array([0.0, 1.0]))
        assert out2[10, 10, 0] > 200 and out2[10, 10, 1] == 0
        assert out2[20, 30, 1] > 200 and out2[20, 30, 0] == 0

    def test_matches_draw_on_both_sides(self):
        kp0 = np.array([[5.0, 5.0], [20.0, 30.0]])
        kp1 = np.array([[8.0, 6.0], [22.0, 28.0]])
        out = draw_matches(
            np.zeros((H, W, 3), np.uint8), np.zeros((H, W, 3), np.uint8),
            kp0, kp1, correct=np.array([1.0, 0.0]),
        )
        off = W + 4
        assert (out[5, 5] == [0, 255, 0]).all()  # correct -> green
        assert (out[6, 8 + off] == [0, 255, 0]).all()
        assert (out[30, 20] == [255, 0, 0]).all()  # wrong -> red

    def test_lines_and_line_matches(self):
        lines = np.array([[[5.0, 5.0], [40.0, 5.0]]])
        out = draw_lines(np.zeros((H, W, 3), np.uint8), lines)
        assert out[5, 20].sum() > 0  # midpoint of the segment is drawn
        out2 = draw_line_matches(
            np.zeros((H, W, 3), np.uint8), np.zeros((H, W, 3), np.uint8),
            lines, lines, correct=np.array([1.0]),
        )
        off = W + 4
        assert (out2[5, 20] == [0, 255, 0]).all()
        assert (out2[5, 20 + off] == [0, 255, 0]).all()

    def test_epipolar_lines_pass_near_correspondence(self):
        # pure horizontal translation -> F = [e]_x maps points to the
        # horizontal epipolar line through the same y
        f = np.array([[0.0, 0.0, 0.0], [0.0, 0.0, -1.0], [0.0, 1.0, 0.0]])
        kp0 = np.array([[15.0, 25.0]])
        out = draw_epipolar_lines(
            np.zeros((H, W, 3), np.uint8), np.zeros((H, W, 3), np.uint8), f, kp0
        )
        off = W + 4
        # the drawn line is y = 25 across image 1
        row = out[25, off:]
        assert (row.sum(-1) > 0).mean() > 0.9

    def test_heatmap_overlay(self):
        heat = np.zeros((H, W))
        heat[10, 10] = 1.0
        out = heatmap_overlay(np.zeros((H, W, 3), np.uint8), heat, alpha=1.0)
        assert out[10, 10, 0] > 200  # hot -> red
        assert out[0, 0].sum() == 0  # cold, zero-alpha -> untouched

    def test_cumulative_plot_saves(self, tmp_path):
        path = os.path.join(tmp_path, "cum.png")
        fig = plot_cumulative_errors(
            {"a": np.array([1.0, 2.0, 10.0]), "b": np.array([5.0])}, path=path
        )
        assert fig is not None and os.path.exists(path)


class TestZeroMatches:
    def test_draw_matches_empty(self):
        # regression: zero predicted matches must still render the canvas
        out = draw_matches(
            np.zeros((H, W, 3), np.uint8), np.zeros((H, W, 3), np.uint8),
            np.zeros((0, 2)), np.zeros((0, 2)),
        )
        assert out.shape == (H, 2 * W + 4, 3)

    def test_draw_line_matches_empty(self):
        out = draw_line_matches(
            np.zeros((H, W, 3), np.uint8), np.zeros((H, W, 3), np.uint8),
            np.zeros((0, 2, 2)), np.zeros((0, 2, 2)),
        )
        assert out.shape == (H, 2 * W + 4, 3)


class TestMakeMatchFigures:
    """make_match_figures (visualize_batch.py:7-58 headless parity)."""

    def test_renders_batch(self):
        from comet_tpu.matching.viz import make_match_figures

        rng = np.random.default_rng(0)
        b, n, h, w = 3, 12, 32, 40
        pred = {
            "keypoints0": rng.uniform(0, w - 1, size=(b, n, 2)),
            "keypoints1": rng.uniform(0, w - 1, size=(b, n, 2)),
            "matches0": rng.integers(-1, n, size=(b, n)),
            "gt_matches0": rng.integers(-2, n, size=(b, n)),
        }
        data = {
            "image0": rng.uniform(size=(b, h, w, 3)).astype(np.float32),
            "image1": rng.uniform(size=(b, h, w, 3)).astype(np.float32),
        }
        out = make_match_figures(pred, data, n_pairs=2)
        assert list(out) == ["matching"]
        assert len(out["matching"]) == 2
        img = out["matching"][0]
        assert img.dtype == np.uint8 and img.shape[0] == h
        assert img.shape[1] >= 2 * w  # side-by-side

    def test_ignores_gt_ignore_labels(self):
        from comet_tpu.matching.viz import make_match_figures

        # one valid match, one IGNORE(-2) — only the valid one drawn; the
        # call must not crash on the -2 row
        pred = {
            "keypoints0": np.array([[[2.0, 2.0], [5.0, 5.0]]]),
            "keypoints1": np.array([[[3.0, 2.0], [6.0, 5.0]]]),
            "matches0": np.array([[0, 1]]),
            "gt_matches0": np.array([[0, -2]]),
        }
        data = {
            "image0": np.zeros((1, 16, 16, 3), np.float32),
            "image1": np.zeros((1, 16, 16, 3), np.float32),
        }
        out = make_match_figures(pred, data, n_pairs=1)
        assert len(out["matching"]) == 1
