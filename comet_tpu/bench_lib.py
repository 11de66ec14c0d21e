"""Throughput benchmark: end-to-end COMET inference, sequences/sec/chip.

Methodology mirrors the reference's CUDA-event harness
(gluefactory/utils/benchmark.py:7-33): warmup iterations, then timed reps
with device synchronization (block_until_ready), mean over reps.

Baseline to beat: the PyTorch reference runs 41.53 FPS at seqlen=16 on an
RTX 4090 (README.md:211) = ~2.6 sequences/sec.
"""

from __future__ import annotations

import time
from typing import Dict

import jax
import jax.numpy as jnp

from .config import CometConfig, get_config
from .models import COMET

REFERENCE_SEQ_PER_SEC = 41.53 / 16.0  # RTX 4090 baseline at seqlen=16


def run_benchmark(
    cfg: CometConfig = None, warmup: int = 3, reps: int = 10, seed: int = 0
) -> Dict:
    cfg = cfg or get_config("ours")
    model = COMET(cfg)

    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    images = jax.random.normal(
        k1, (1, cfg.seqlen, cfg.img_size, cfg.img_size, 3), jnp.float32
    )
    queries = (
        jax.random.uniform(k2, (1, cfg.track_num, 2)) * (cfg.img_size - 64) + 32
    ).astype(jnp.float32)

    params = jax.jit(model.init)(k3, images, queries)
    fwd = jax.jit(model.apply)

    # warmup (includes compile)
    for _ in range(warmup):
        out = fwd(params, images, queries)
    jax.block_until_ready(out)

    t0 = time.perf_counter()
    for _ in range(reps):
        out = fwd(params, images, queries)
    jax.block_until_ready(out)
    elapsed = time.perf_counter() - t0

    seq_per_sec = reps / elapsed
    return {
        "metric": f"sequences/sec/chip (seqlen={cfg.seqlen}, {cfg.img_size}px, N={cfg.track_num})",
        "value": round(seq_per_sec, 4),
        "unit": "seq/s",
        "vs_baseline": round(seq_per_sec / REFERENCE_SEQ_PER_SEC, 3),
        "fps": round(seq_per_sec * cfg.seqlen, 2),
        "ms_per_sequence": round(1000.0 * elapsed / reps, 2),
        "device": str(jax.devices()[0]),
    }
