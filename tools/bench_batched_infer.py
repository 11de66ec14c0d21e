"""Batched-inference throughput probe: seq/s/chip as a function of batch.

The headline bench (bench.py / bench_lib.run_benchmark) measures the
reference's workload — ONE sequence per forward (batch=1), matching the
41.53 FPS RTX-4090 row in the reference README (comet reference
README.md:211). A serving deployment would batch independent sequences
per step; this probe measures how much extra throughput the chip has
when latency is traded for batching, using the same one-scan /
checksum-forced / RTT-subtracted methodology as run_benchmark.

Run on a QUIET host: python tools/bench_batched_infer.py [--batches 1 2 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def measure(batch: int, reps: int = 8, warmup: int = 2, seed: int = 0):
    from comet_tpu.config import get_config
    from comet_tpu.models.comet import COMET
    from comet_tpu.utils import cast_params_for_inference

    cfg = get_config("ours")
    model = COMET(cfg)
    key = jax.random.PRNGKey(seed)
    k1, k2, k3 = jax.random.split(key, 3)
    ishape = (batch, cfg.seqlen, cfg.img_size, cfg.img_size, 3)
    qshape = (batch, cfg.track_num, 2)
    images = jax.random.normal(k1, (1,) + ishape[1:], jnp.float32)
    queries = (
        jax.random.uniform(k2, (1,) + qshape[1:]) * (cfg.img_size - 64) + 32
    ).astype(jnp.float32)
    params = jax.jit(model.init)(k3, images, queries)
    params = cast_params_for_inference(params, cfg.dtype)

    def run_many(params, key, n_reps):
        def body(acc, k):
            imgs = jax.random.normal(k, ishape, jnp.float32)
            qs = (
                jax.random.uniform(k, qshape) * (cfg.img_size - 64) + 32
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
    elapsed = times[1]
    seqs = reps * batch
    return {
        "batch": batch,
        "seq_per_sec": round(seqs / elapsed, 3),
        "ms_per_step": round(1000.0 * elapsed / reps, 2),
        "ms_per_seq": round(1000.0 * elapsed / seqs, 2),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()
    for b in args.batches:
        r = measure(b, reps=args.reps)
        print(r)


if __name__ == "__main__":
    main()
