#!/usr/bin/env python
"""Host-loop vs in-graph (lax.scan) windowed inference A/B (VERDICT r2
item 6: the scan must show the dispatch win at --demo-seq-len 64).

Runs the full 'ours' model over a T-frame sequence (default 64) in
sliding windows of seqlen=16 both ways on the attached chip and reports
wall-clock per sequence. The host loop re-dispatches one jitted call per
window plus python stitching between them; the scan dispatches once.

Usage: python tools/micro_windowed.py [T] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp


def main():
    t_total = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    from comet_tpu.config import get_config
    from comet_tpu.models import COMET
    from comet_tpu.models.windowed import (
        windowed_forward,
        windowed_forward_scan,
    )
    from comet_tpu.utils import cast_params_for_inference

    cfg = get_config("ours")
    model = COMET(cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(
        size=(1, t_total, cfg.img_size, cfg.img_size, 3)
    ).astype(np.float32))
    queries = jnp.asarray(
        (rng.random((1, cfg.track_num, 2)) * (cfg.img_size - 64) + 32)
        .astype(np.float32)
    )
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), images[:, : cfg.seqlen], queries
    )
    params = cast_params_for_inference(params, cfg.dtype)
    ratio = jnp.float32(0.5)

    # params must be jit ARGUMENTS, not closed-over constants: embedding
    # 253M weights as literals makes the serialized program ~500 MB
    apply_jit_ = jax.jit(lambda p, im, q: model.apply(p, im, q))

    def apply_jit(im, q):
        return apply_jit_(params, im, q)

    def host(im, q):
        return windowed_forward(apply_jit, im, q, cfg.seqlen, ratio)

    scan_ = jax.jit(
        lambda p, im, q: windowed_forward_scan(
            lambda wi, wq: model.apply(p, wi, wq),
            im, q, cfg.seqlen, ratio,
        )
    )

    def scan(im, q):
        return scan_(params, im, q)

    def sync(out):
        # scalar FETCH, not block_until_ready: the tunneled axon backend
        # returns from block_until_ready before device completion (same
        # reason bench_lib synchronizes with float() fetches)
        return float(jnp.sum(out[0])) + float(jnp.sum(out[1]))

    results = {}
    for name, fn in (("host-loop", host), ("lax.scan", scan)):
        t0 = time.time()
        out = fn(images, queries)
        sync(out)
        compile_s = time.time() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = fn(images, queries)
            sync(out)
            times.append(time.perf_counter() - t0)
        times.sort()
        med = times[len(times) // 2]
        results[name] = (med, out)
        print(f"{name}: {med * 1000:.1f} ms/seq (T={t_total}, "
              f"first call {compile_s:.1f}s incl. compile)", flush=True)

    d_enc = float(jnp.max(jnp.abs(
        results["host-loop"][1][0] - results["lax.scan"][1][0]
    )))
    speedup = results["host-loop"][0] / results["lax.scan"][0]
    print(f"parity max|enc diff| = {d_enc:.2e}; scan speedup = "
          f"{speedup:.2f}x")


if __name__ == "__main__":
    main()
