"""Experiment-harness utilities: metric accumulators, timing, RNG forking.

Role model: gluefactory/utils/tools.py (AverageMetric:17, FAverageMetric:36,
MedianMetric:56, PRMetric:71, QuantileMetric:98, RecallMetric:114,
cal_error_auc:137, AUCMetric:152, Timer:170, get_class:193,
set_num_threads:209, set_seed:228, fork_rng:262). The accumulators keep the
reference's semantics (NaN-skipping means, nan-median/quantile, recall as
fraction-below-threshold, exact-AUC via trapezoid over the sorted error
curve) but accept anything `np.asarray` understands — JAX arrays included —
instead of torch tensors; values are fetched to host once per update, which
is the natural TPU pattern (accumulate on host while the device runs ahead
asynchronously).

JAX note on RNG: `fork_rng`/`set_seed` manage the *host-side* generators
(python `random`, numpy) that drive data sampling and fixture generation.
Device-side randomness in JAX is explicit (`jax.random.key`), so there is no
device generator state to save/restore — pass keys instead.
"""

from __future__ import annotations

import os
import random
import time
from collections.abc import Iterable
from contextlib import contextmanager

import numpy as np

from .eval_pipeline import cal_error_auc, AUCMetric  # noqa: F401  (re-export)


def _to_1d(values) -> np.ndarray:
    arr = np.asarray(values, dtype=np.float64)
    if arr.ndim == 0:
        arr = arr[None]
    if arr.ndim != 1:
        raise ValueError(f"expected a 1-D batch of values, got shape {arr.shape}")
    return arr


class AverageMetric:
    """Streaming mean that skips NaNs (gluefactory tools.py:17-32)."""

    def __init__(self):
        self._sum = 0.0
        self._num_examples = 0

    def update(self, values):
        arr = _to_1d(values)
        arr = arr[~np.isnan(arr)]
        self._sum += float(arr.sum())
        self._num_examples += arr.size

    def compute(self):
        if self._num_examples == 0:
            return np.nan
        return self._sum / self._num_examples


class FAverageMetric(AverageMetric):
    """AverageMetric that also keeps every element (tools.py:36-52)."""

    def __init__(self):
        super().__init__()
        self._elements = []

    def update(self, values):
        arr = _to_1d(values)
        self._elements += arr.tolist()
        arr = arr[~np.isnan(arr)]
        self._sum += float(arr.sum())
        self._num_examples += arr.size

    @property
    def elements(self):
        return list(self._elements)


class MedianMetric:
    """nanmedian over all seen elements (tools.py:56-67)."""

    def __init__(self):
        self._elements = []

    def update(self, values):
        self._elements += _to_1d(values).tolist()

    def compute(self):
        if not self._elements:
            return np.nan
        return np.nanmedian(self._elements)


class QuantileMetric:
    """nanquantile(q) over all seen elements (tools.py:98-110)."""

    def __init__(self, q: float = 0.05):
        self._elements = []
        self.q = q

    def update(self, values):
        self._elements += _to_1d(values).tolist()

    def compute(self):
        if not self._elements:
            return np.nan
        return np.nanquantile(self._elements, self.q)


class RecallMetric:
    """Fraction of elements strictly below threshold(s) (tools.py:114-134)."""

    def __init__(self, ths, elements=None):
        self._elements = list(elements) if elements is not None else []
        self.ths = ths

    def update(self, values):
        self._elements += _to_1d(values).tolist()

    def compute(self):
        if isinstance(self.ths, Iterable):
            return [self._compute_one(th) for th in self.ths]
        return self._compute_one(self.ths)

    def _compute_one(self, th):
        if not self._elements:
            return np.nan
        arr = np.asarray(self._elements)
        return float((arr < th).sum() / arr.size)


class PRMetric:
    """Accumulates (label, prediction) pairs for PR analysis
    (tools.py:71-95); compute() returns the two stacked arrays."""

    def __init__(self):
        self.labels = []
        self.predictions = []

    def update(self, labels, predictions, mask=None):
        labels = np.asarray(labels)
        predictions = np.asarray(predictions)
        if labels.shape != predictions.shape:
            raise ValueError(
                f"labels {labels.shape} != predictions {predictions.shape}"
            )
        if mask is not None:
            mask = np.asarray(mask).astype(bool)
            labels, predictions = labels[mask], predictions[mask]
        self.labels += labels.reshape(-1).tolist()
        self.predictions += predictions.reshape(-1).tolist()

    def compute(self):
        return np.array(self.labels), np.array(self.predictions)

    def reset(self):
        self.labels = []
        self.predictions = []


class Timer:
    """Context timer: `with Timer('x'): ...` prints "[x] Elapsed: s"
    (tools.py:170-190). `duration` holds the wall seconds afterwards."""

    def __init__(self, name=None):
        self.name = name
        self.duration = None

    def __enter__(self):
        self.tstart = time.perf_counter()
        return self

    def __exit__(self, exc_type, exc, tb):
        self.duration = time.perf_counter() - self.tstart
        if self.name is not None:
            print(f"[{self.name}] Elapsed: {self.duration}")


def benchmark_model(fn, data, r: int = 100, warmup: int = 10) -> dict:
    """Model-timing micro-benchmark: {"mean": ms, "std": ms} over ``r``
    timed calls of ``fn(data)`` (gluefactory/utils/benchmark.py:7-33).

    The reference brackets each call with CUDA events + a sync; the TPU
    equivalent of "sync" is blocking on the output pytree, so each rep
    times dispatch + device execution + the readiness round-trip. The
    ``warmup`` calls absorb jit compilation (the reference's 10 warmup
    calls play the same role for cudnn autotuning).
    """
    import jax

    for _ in range(warmup):
        jax.block_until_ready(fn(data))
    timings = np.zeros((r,))
    for rep in range(r):
        start = time.perf_counter()
        jax.block_until_ready(fn(data))
        timings[rep] = (time.perf_counter() - start) * 1e3
    return {"mean": float(timings.sum() / r), "std": float(np.std(timings))}


def get_class(mod_path: str, base_class):
    """The single subclass of `base_class` defined in module `mod_path`
    (tools.py:193-206); used by registry-style plugin loading."""
    import inspect

    mod = __import__(mod_path, fromlist=[""])
    classes = [
        c
        for _, c in inspect.getmembers(mod, inspect.isclass)
        if c.__module__ == mod_path and issubclass(c, base_class)
    ]
    if len(classes) != 1:
        raise ValueError(f"{mod_path} defines {len(classes)} {base_class} classes")
    return classes[0]


def set_num_threads(nt: int):
    """Cap host BLAS/OMP thread pools (tools.py:209-225). On TPU the host
    threads only feed the input pipeline, so this bounds loader CPU use."""
    for var in (
        "OPENBLAS_NUM_THREADS",
        "NUMEXPR_NUM_THREADS",
        "OMP_NUM_THREADS",
        "MKL_NUM_THREADS",
    ):
        os.environ[var] = str(nt)


def set_seed(seed: int):
    """Seed the host-side generators (python random + numpy). Device
    randomness in JAX is explicit-key; derive keys from the same seed."""
    random.seed(seed)
    np.random.seed(seed)


def get_random_state():
    return np.random.get_state(), random.getstate()


def set_random_state(state):
    np_state, py_state = state
    np.random.set_state(np_state)
    random.setstate(py_state)


@contextmanager
def fork_rng(seed=None):
    """Run a block under an isolated host RNG state (tools.py:262-269)."""
    state = get_random_state()
    if seed is not None:
        set_seed(seed)
    try:
        yield
    finally:
        set_random_state(state)
