#!/usr/bin/env python
"""A/B: end-to-end inference throughput vs batch size.

The attribute_trace breakdown puts ~8 ms/fwd in sliver two-hot window
dots whose cost is per-batch-element overhead bound (PROFILE.md), and the
updateformer fused kernels at ~55% MFU; batching B sequences per forward
is the standard TPU way to amortize both. This tool measures seq/s at
B in {1, 2, 4} with the bench_lib methodology (scan-of-reps, checksum
fetch, RTT subtraction) so the numbers are directly comparable to
bench.py.

Usage: python tools/micro_batch.py [preset] [reps]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def measure(cfg, batch, reps=8, warmup=2):
    from comet_tpu.models import COMET
    from comet_tpu.utils import cast_params_for_inference

    model = COMET(cfg)
    key = jax.random.PRNGKey(0)
    k1, k2, k3 = jax.random.split(key, 3)
    images = jax.random.normal(
        k1, (batch, cfg.seqlen, cfg.img_size, cfg.img_size, 3), jnp.float32
    )
    queries = (
        jax.random.uniform(k2, (batch, cfg.track_num, 2)) * (cfg.img_size - 64)
        + 32
    ).astype(jnp.float32)
    params = jax.jit(model.init)(k3, images[:1], queries[:1])
    params = cast_params_for_inference(params, cfg.dtype)

    def run_many(params, key, n_reps):
        def body(acc, k):
            ki, kq = jax.random.split(k)
            imgs = jax.random.normal(ki, images.shape, jnp.float32)
            qs = (
                jax.random.uniform(kq, queries.shape) * (cfg.img_size - 64) + 32
            ).astype(jnp.float32)
            out = model.apply(params, imgs, qs)
            return acc + out["pred_pose_enc"].sum(), None

        keys = jax.random.split(key, n_reps)
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), keys)
        return acc

    fwd = jax.jit(run_many, static_argnums=2)
    trivial = jax.jit(lambda x: x + 1.0)
    float(trivial(jnp.float32(0.0)))
    t0 = time.perf_counter()
    for _ in range(3):
        float(trivial(jnp.float32(0.0)))
    rtt = (time.perf_counter() - t0) / 3

    for _ in range(warmup):
        float(fwd(params, key, reps))
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(fwd(params, key, reps))
        times.append(max(time.perf_counter() - t0 - rtt, 1e-9))
    times.sort()
    return batch * reps / times[1]


def main():
    from comet_tpu.config import get_config

    preset = sys.argv[1] if len(sys.argv) > 1 else "ours"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    # reference-throughput baseline for the ratio column; measured only for
    # the "ours" preset (BASELINE.md) — omit the ratio for other presets
    # unless one is passed explicitly as argv[3]
    baseline = (
        float(sys.argv[3]) if len(sys.argv) > 3
        else (2.5956 if preset == "ours" else None)
    )
    cfg = get_config(preset)
    for b in (1, 2, 4):
        try:
            sps = measure(cfg, b, reps=reps)
            ratio = f" ({sps / baseline:.2f}x ref)" if baseline else ""
            print(
                f"B={b}: {sps:.3f} seq/s{ratio}, "
                f"{1000.0 * b / sps:.1f} ms/fwd",
                flush=True,
            )
        except Exception as e:  # OOM at large B is an answer, not a crash
            print(f"B={b}: failed ({type(e).__name__}: {str(e)[:200]})")
            break


if __name__ == "__main__":
    main()
