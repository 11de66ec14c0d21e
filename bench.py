#!/usr/bin/env python
"""Driver benchmark hook: prints ONE JSON line with the headline metric.

Runs end-to-end COMET inference (full 'ours' config: tracker + fine refine +
ViT camera predictor) at seqlen=16 on the available chip and reports
sequences/sec/chip vs. the PyTorch reference baseline (2.6 seq/s on a 4090,
BASELINE.md)."""

import json
import sys
import threading


def _require_device(timeout_s: float = 180.0):
    """Fail fast (finite, non-zero exit) when the device backend is
    unreachable: jax.devices() on a down axon tunnel blocks forever, which
    would hang the whole benchmark run instead of reporting an error."""
    result = {}

    def probe():
        import jax

        result["devices"] = jax.devices()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    t.join(timeout_s)
    if "devices" not in result:
        print(
            f"bench.py: device backend did not initialize within "
            f"{timeout_s:.0f}s (TPU tunnel down?) — aborting",
            file=sys.stderr,
        )
        sys.exit(2)


def main():
    _require_device()

    from comet_tpu.bench_lib import run_benchmark
    from comet_tpu.config import get_config

    cfg = get_config("ours")
    result = run_benchmark(cfg, warmup=3, reps=10)
    print(
        json.dumps(
            {
                "metric": result["metric"],
                "value": result["value"],
                "unit": result["unit"],
                "vs_baseline": result["vs_baseline"],
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
