#!/usr/bin/env python
"""Driver benchmark hook: prints ONE JSON line with the headline metric.

Runs end-to-end COMET inference (full 'ours' config: tracker + fine refine +
ViT camera predictor) at seqlen=16 on the available chip and reports
sequences/sec/chip vs. the PyTorch reference baseline (2.6 seq/s on a 4090,
BASELINE.md)."""

import json
import sys


def main():
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
