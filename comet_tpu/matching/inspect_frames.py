"""Prediction-inspection frames: per-pair plot registry + cross-experiment
metric scatter.

Role models: gluefactory/visualization/two_view_frame.py (TwoViewFrame:20,
plot registry selection by `required_keys`:51-54), global_frame.py
(GlobalFrame:16 — metric x/y scatter across experiments, diff mode,
click-a-point-to-open-the-pair), and visualization/tools.py (the
__plot_dict__ of KeypointPlot/MatchesPlot/HeatmapPlot/... classes).

TPU-era redesign: the reference's frames are matplotlib-artist GUIs that
require an interactive backend. Here each plot is a pure function
`data, pred -> rendered numpy image` (reusing matching/viz.py's cv2
renderers), so every surface works headlessly — `save()` writes PNGs under
Agg — and the same objects become interactive when a GUI backend is live
(`show(block=True)` wires pick events and the r/t key cycling the reference
bound to RadioHideTool/ToggleTool). Numbers never leave the host; this is
pure post-hoc visualization of cached predictions.
"""

from __future__ import annotations

import os
from typing import Callable, Dict, List, Optional, Sequence

import numpy as np

from . import viz


# --------------------------------------------------------------------------
# plot registry (visualization/tools.py __plot_dict__ equivalent)
# --------------------------------------------------------------------------


class PairPlot:
    """A named two-view rendering. Subclasses declare `required_keys`
    (met by data ∪ pred, two_view_frame.py:49-54) and implement render."""

    name: str = "?"
    required_keys: Sequence[str] = ()

    @classmethod
    def available(cls, keys) -> bool:
        return set(cls.required_keys).issubset(keys)

    def render(self, data: dict, pred: dict) -> np.ndarray:
        raise NotImplementedError


def _imgs(data):
    return np.asarray(data["image0"]), np.asarray(data["image1"])


def _valid_matches(pred):
    kp0 = np.asarray(pred["keypoints0"])
    kp1 = np.asarray(pred["keypoints1"])
    m0 = np.asarray(pred["matches0"]).astype(np.int64)
    valid = m0 >= 0
    tgt = np.clip(m0[valid], 0, max(len(kp1) - 1, 0))
    return kp0[valid], kp1[tgt] if len(kp1) else kp1, valid


class ImagePlot(PairPlot):
    name = "image"
    required_keys = ()

    def render(self, data, pred):
        canvas, _ = viz.side_by_side(*_imgs(data))
        return canvas


class KeypointPlot(PairPlot):
    name = "keypoints"
    required_keys = ("keypoints0", "keypoints1")

    def render(self, data, pred):
        i0, i1 = _imgs(data)
        s0 = pred.get("keypoint_scores0")
        s1 = pred.get("keypoint_scores1")

        def norm(s):
            if s is None:
                return None
            s = np.asarray(s, np.float64)
            return s / max(float(s.max()), 1e-12)

        a = viz.draw_keypoints(i0, np.asarray(pred["keypoints0"]), scores=norm(s0))
        b = viz.draw_keypoints(i1, np.asarray(pred["keypoints1"]), scores=norm(s1))
        canvas, _ = viz.side_by_side(a, b)
        return canvas


class KeypointRankingPlot(PairPlot):
    """Rank-colored keypoints (tools.py KeypointRankingPlot:137): the
    strongest detection is green, the weakest red."""

    name = "keypoint_ranking"
    required_keys = ("keypoints0", "keypoints1",
                     "keypoint_scores0", "keypoint_scores1")

    def render(self, data, pred):
        i0, i1 = _imgs(data)

        def ranked(img, kpts, scores):
            scores = np.asarray(scores, np.float64)
            order = np.argsort(np.argsort(scores))  # rank in [0, n)
            frac = order / max(len(order) - 1, 1)
            return viz.draw_keypoints(img, np.asarray(kpts), scores=frac)

        a = ranked(i0, pred["keypoints0"], pred["keypoint_scores0"])
        b = ranked(i1, pred["keypoints1"], pred["keypoint_scores1"])
        canvas, _ = viz.side_by_side(a, b)
        return canvas


class MatchesPlot(PairPlot):
    name = "matches"
    required_keys = ("keypoints0", "keypoints1", "matches0")

    def render(self, data, pred):
        i0, i1 = _imgs(data)
        kp0, kp1, valid = _valid_matches(pred)
        correct = None
        if "matching_scores0" in pred:
            correct = np.asarray(pred["matching_scores0"], np.float64)[valid]
        return viz.draw_matches(i0, i1, kp0, kp1, correct=correct)


class GtMatchesPlot(PairPlot):
    """Predictions colored by agreement with the GT assignment
    (tools.py GtMatchesPlot:248)."""

    name = "gt_matches"
    required_keys = ("keypoints0", "keypoints1", "matches0", "gt_matches0")

    def render(self, data, pred):
        i0, i1 = _imgs(data)
        kp0all = np.asarray(pred["keypoints0"])
        kp1all = np.asarray(pred["keypoints1"])
        m0 = np.asarray(pred["matches0"]).astype(np.int64)
        gt = np.asarray(pred["gt_matches0"]).astype(np.int64)
        valid = m0 >= 0
        correct = (m0 == gt)[valid].astype(np.float64)
        tgt = np.clip(m0[valid], 0, max(len(kp1all) - 1, 0))
        return viz.draw_matches(i0, i1, kp0all[valid], kp1all[tgt],
                                correct=correct)


class EpipolarMatchesPlot(PairPlot):
    """Matches + epipolar lines of the image-0 keypoints in image 1
    (tools.py EpipolarMatchesPlot:366); needs a fundamental matrix in the
    loader item (``F_0to1``)."""

    name = "epipolar_matches"
    required_keys = ("keypoints0", "keypoints1", "matches0", "F_0to1")

    def render(self, data, pred):
        i0, i1 = _imgs(data)
        kp0, kp1, _ = _valid_matches(pred)
        canvas = viz.draw_epipolar_lines(
            i0, i1, np.asarray(data["F_0to1"]), kp0
        )
        # overlay the matched points in image 1 (offset by image-0 width)
        off = canvas.shape[1] - np.asarray(viz._as_u8(i1)).shape[1]
        shifted = np.asarray(kp1, np.float64).copy()
        if len(shifted):
            shifted[:, 0] += off
        return viz.draw_keypoints(canvas, shifted, color=(0, 255, 0))


class HeatmapPlot(PairPlot):
    name = "heatmap"
    required_keys = ("heatmap0", "heatmap1")

    def render(self, data, pred):
        i0, i1 = _imgs(data)
        h0 = np.asarray(pred["heatmap0"], np.float64)
        h1 = np.asarray(pred["heatmap1"], np.float64)
        if h0.ndim == 3:  # [1, H, W] channel-first
            h0, h1 = h0[0], h1[0]
        a = viz.heatmap_overlay(i0, h0)
        b = viz.heatmap_overlay(i1, h1)
        canvas, _ = viz.side_by_side(a, b)
        return canvas


class LinePlot(PairPlot):
    name = "lines"
    required_keys = ("lines0", "lines1")

    def render(self, data, pred):
        i0, i1 = _imgs(data)
        a = viz.draw_lines(i0, np.asarray(pred["lines0"]))
        b = viz.draw_lines(i1, np.asarray(pred["lines1"]))
        canvas, _ = viz.side_by_side(a, b)
        return canvas


class LineMatchesPlot(PairPlot):
    name = "line_matches"
    required_keys = ("lines0", "lines1", "line_matches0")

    def render(self, data, pred):
        i0, i1 = _imgs(data)
        l0 = np.asarray(pred["lines0"])
        l1 = np.asarray(pred["lines1"])
        m0 = np.asarray(pred["line_matches0"]).astype(np.int64)
        valid = m0 >= 0
        tgt = np.clip(m0[valid], 0, max(len(l1) - 1, 0))
        return viz.draw_line_matches(i0, i1, l0[valid],
                                     l1[tgt] if len(l1) else l1)


PLOT_REGISTRY: Dict[str, type] = {
    p.name: p
    for p in (
        ImagePlot, KeypointPlot, KeypointRankingPlot, MatchesPlot,
        GtMatchesPlot, EpipolarMatchesPlot, HeatmapPlot, LinePlot,
        LineMatchesPlot,
    )
}


# --------------------------------------------------------------------------
# frames
# --------------------------------------------------------------------------


class TwoViewFrame:
    """One pair, one row of renderings per experiment
    (two_view_frame.py:20-158).

    data: loader item with image0/image1 (+ optional H_0to1/F_0to1/...).
    preds: {experiment_name: prediction dict}.
    """

    def __init__(self, data: dict, preds: Dict[str, dict],
                 default: str = "matches", title: Optional[str] = None):
        self.data = data
        self.preds = dict(preds)
        self.names = list(preds)
        self.title = title
        keys = None
        for pred in preds.values():
            keys = set(pred) if keys is None else keys & set(pred)
        keys = (keys or set()) | set(data)
        self.options = [
            n for n, p in PLOT_REGISTRY.items() if p.available(keys)
        ]
        self.current = default if default in self.options else "image"

    def draw(self, plot: Optional[str] = None) -> Dict[str, np.ndarray]:
        """Render the selected plot for every experiment."""
        if plot is not None:
            if plot not in self.options:
                raise KeyError(
                    f"plot {plot!r} not available; options: {self.options}"
                )
            self.current = plot
        renderer = PLOT_REGISTRY[self.current]()
        return {n: renderer.render(self.data, self.preds[n])
                for n in self.names}

    def cycle(self) -> str:
        """Advance to the next available plot (the reference's 'R' radio
        cycling, two_view_frame.py:56-63)."""
        i = self.options.index(self.current)
        self.current = self.options[(i + 1) % len(self.options)]
        return self.current

    def save(self, out_dir: str, plots: Optional[Sequence[str]] = None
             ) -> List[str]:
        """Headless export: one PNG per (plot, experiment)."""
        import cv2

        os.makedirs(out_dir, exist_ok=True)
        written = []
        for plot in (plots or [self.current]):
            for name, img in self.draw(plot).items():
                path = os.path.join(out_dir, f"{plot}_{name}.png")
                cv2.imwrite(path, img[..., ::-1])
                written.append(path)
        return written

    def show(self, block: bool = True):  # pragma: no cover - GUI only
        """Interactive figure: 'r' cycles plots, 't' toggles the title."""
        import matplotlib.pyplot as plt

        fig, axes = plt.subplots(
            len(self.names), 1, squeeze=False, figsize=(10, 5 * len(self.names))
        )
        ims = {}
        for ax, (name, img) in zip(axes[:, 0], self.draw().items()):
            ims[name] = ax.imshow(img)
            ax.set_ylabel(name)
            ax.set_xticks([])
            ax.set_yticks([])
        if self.title:
            fig.suptitle(f"{self.title} [{self.current}]")

        def on_key(event):
            if event.key == "r":
                self.cycle()
                for name, img in self.draw().items():
                    ims[name].set_data(img)
                if self.title:
                    fig.suptitle(f"{self.title} [{self.current}]")
                fig.canvas.draw_idle()

        fig.canvas.mpl_connect("key_press_event", on_key)
        plt.show(block=block)
        return fig


class GlobalFrame:
    """Cross-experiment per-pair metric scatter (global_frame.py:16-289).

    results: {experiment_name: {metric_name: [per-pair values]}} — the
    summarize() output of the eval pipeline.
    pair_opener: optional callable(pair_index) -> (data, preds) used to
    build the child TwoViewFrame (the reference wires loader + cached
    predictions the same way).
    """

    def __init__(self, results: Dict[str, Dict[str, Sequence[float]]],
                 x: Optional[str] = None, y: Optional[str] = None,
                 diff: bool = False,
                 pair_opener: Optional[Callable] = None):
        self.results = {
            name: {m: np.asarray(v, np.float64) for m, v in metrics.items()}
            for name, metrics in results.items()
        }
        self.names = list(self.results)
        metrics = set()
        for v in self.results.values():
            metrics |= set(v)
        self.metrics = sorted(metrics)
        if len(self.metrics) < 2:
            raise ValueError("need at least two per-pair metrics to scatter")
        self.x = x or self.metrics[0]
        self.y = y or self.metrics[1]
        for m in (self.x, self.y):
            if m not in self.metrics:
                raise KeyError(f"unknown metric {m!r}; have {self.metrics}")
        self.diff = diff and len(self.names) > 1
        self.pair_opener = pair_opener

    def _xy(self, name):
        xs = self.results[name][self.x]
        ys = self.results[name][self.y]
        if self.diff:
            base = self.names[0]
            xs = xs - self.results[base][self.x]
            ys = ys - self.results[base][self.y]
        return xs, ys

    def worst_pairs(self, metric: Optional[str] = None, k: int = 4,
                    experiment: Optional[str] = None,
                    largest: bool = True) -> List[int]:
        """Pair indices ranked by a metric — the headless stand-in for
        clicking outlier points in the scatter."""
        name = experiment or self.names[0]
        vals = self.results[name][metric or self.y]
        order = np.argsort(vals)
        if largest:
            order = order[::-1]
        return [int(i) for i in order[:k]]

    def open_pair(self, index: int, **kwargs) -> TwoViewFrame:
        if self.pair_opener is None:
            raise RuntimeError("no pair_opener wired")
        data, preds = self.pair_opener(index)
        return TwoViewFrame(data, preds,
                            title=f"pair {index}", **kwargs)

    def figure(self):
        """Build the scatter figure (Agg-safe)."""
        import matplotlib

        if not os.environ.get("DISPLAY"):
            matplotlib.use("Agg", force=False)
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(7, 6))
        art_to_pair = {}
        for name in self.names:
            xs, ys = self._xy(name)
            sc = ax.scatter(xs, ys, s=14, alpha=0.7, label=name, picker=True)
            art_to_pair[sc] = np.arange(len(xs))
        prefix = "Δ" if self.diff else ""
        ax.set_xlabel(prefix + self.x)
        ax.set_ylabel(prefix + self.y)
        ax.legend()
        ax.grid(True, alpha=0.3)
        fig.tight_layout()
        return fig, art_to_pair

    def save(self, path: str) -> str:
        fig, _ = self.figure()
        fig.savefig(path, dpi=110)
        import matplotlib.pyplot as plt

        plt.close(fig)
        return path

    def show(self, block: bool = True):  # pragma: no cover - GUI only
        """Interactive scatter: picking a point opens its TwoViewFrame."""
        import matplotlib.pyplot as plt

        fig, art_to_pair = self.figure()

        def on_pick(event):
            pairs = art_to_pair.get(event.artist)
            if pairs is None or self.pair_opener is None:
                return
            idx = int(pairs[event.ind[0]])
            self.open_pair(idx).show(block=False)

        fig.canvas.mpl_connect("pick_event", on_pick)
        plt.show(block=block)
        return fig
