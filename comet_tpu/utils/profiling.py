"""Profiling and latency benchmarking utilities.

Replaces the reference's scattered instrumentation (log_memory_status
train_e2epose2.py:30-43, profile_dataloader train_util.py:1596, the CUDA-
event harness gluefactory/utils/benchmark.py:7-33) with first-class JAX
tools: jax.profiler traces for XLA-level inspection and a latency harness
that is correct under this environment's asynchronous device tunnel
(checksum-fetch synchronization + round-trip subtraction).
"""

from __future__ import annotations

import contextlib
import os
import time
from typing import Callable, Dict

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    """Capture a jax.profiler trace around a code block (view in
    tensorboard/xprof)."""
    os.makedirs(log_dir, exist_ok=True)
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def measure_host_rtt(reps: int = 5) -> float:
    """Host<->device round-trip seconds for a trivial dispatch+fetch."""
    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for _ in range(reps):
        float(trivial(jnp.float32(0.0)))
    return (time.perf_counter() - t0) / reps


def benchmark_fn(
    fn: Callable,
    *args,
    warmup: int = 2,
    reps: int = 16,
    checksum: Callable = None,
) -> Dict[str, float]:
    """Latency of a jittable fn, amortizing reps inside one jit call.

    fn(*args) must return a pytree; checksum reduces it to a scalar
    (default: sum of the first leaf). Returns mean ms per call with the
    measured host round-trip subtracted — the analog of the reference's
    10-warmup/100-rep CUDA-event methodology, adapted to an async tunnel.

    Two defenses against XLA optimizing the measurement away:
    - pass tensors via *args, never closures — a closed-over array is baked
      into the program as a literal (slow/oversized compiles);
    - each iteration multiplies the smallest float input by a loop-carried
      (1 + acc*0^~) factor, so the body is NOT loop-invariant and cannot be
      hoisted out of the scan (which previously measured 0.00 ms).
    """
    if checksum is None:
        # sum EVERY leaf: a single-leaf checksum lets XLA dead-code-
        # eliminate whole model branches that leaf doesn't depend on
        # (measured: a first-leaf checksum reported the full COMET forward
        # at 31 ms vs its true 75 ms device time)
        def checksum(out):
            return sum(
                jnp.sum(leaf.astype(jnp.float32))
                for leaf in jax.tree_util.tree_leaves(out)
                if hasattr(leaf, "astype")
            )

    def run_many(n, *a):
        leaves, treedef = jax.tree_util.tree_flatten(a)

        def body(acc, _):
            # Additive, not multiplicative: a scalar factor can be pulled out
            # of matmuls ((sx)@(sw) = s²(x@w)) and is invisible to
            # scale-invariant ops (LayerNorm), letting XLA hoist the "work"
            # out of the loop anyway. An additive runtime-zero cannot.
            delta = acc * 1e-30
            lv = [
                leaf + delta.astype(leaf.dtype)
                if hasattr(leaf, "dtype")
                and jnp.issubdtype(leaf.dtype, jnp.floating)
                else leaf
                for leaf in leaves
            ]
            a2 = jax.tree_util.tree_unflatten(treedef, lv)
            return acc + checksum(fn(*a2)), None

        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return acc

    jitted = jax.jit(run_many, static_argnums=0)
    rtt = measure_host_rtt()
    for _ in range(warmup):
        float(jitted(reps, *args))
    t0 = time.perf_counter()
    float(jitted(reps, *args))
    elapsed = max(time.perf_counter() - t0 - rtt, 1e-9)
    return {
        "ms_per_call": 1000.0 * elapsed / reps,
        "calls_per_sec": reps / elapsed,
        "host_rtt_ms": rtt * 1000.0,
        "reps": reps,
    }


def log_memory_status(prefix: str = "") -> Dict[str, float]:
    """Host RSS + per-device memory stats (log_memory_status equivalent)."""
    out: Dict[str, float] = {}
    try:
        import resource

        out["host_rss_gb"] = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    except Exception:
        pass
    for i, d in enumerate(jax.devices()):
        stats = getattr(d, "memory_stats", lambda: None)()
        if stats:
            out[f"dev{i}_bytes_in_use_gb"] = stats.get("bytes_in_use", 0) / 1e9
            out[f"dev{i}_peak_gb"] = stats.get("peak_bytes_in_use", 0) / 1e9
    if prefix:
        print(prefix, {k: round(v, 3) for k, v in out.items()})
    return out
