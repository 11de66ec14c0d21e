#!/usr/bin/env python
"""Capture a jax.profiler trace of one COMET forward and print the
per-HLO-op device-time breakdown (the table PROFILE.md is built from).

Usage:
  python tools/trace_report.py              # trace + report
  python tools/trace_report.py <logdir>     # report an existing trace

The xplane.pb is converted with xprof's raw_to_tool_data ("hlo_stats"
tool), which yields one row per HLO instruction with occurrences and
self-time; we aggregate by op category and by fusion name prefix.
"""

import glob
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def capture(logdir: str) -> None:
    import jax
    import jax.numpy as jnp

    from comet_tpu.bench_lib import run_benchmark  # noqa: F401  (warm import)
    from comet_tpu.config import get_config
    from comet_tpu.models import COMET
    from comet_tpu.utils import cast_params_for_inference

    cfg = get_config("ours")
    model = COMET(cfg)
    key = jax.random.PRNGKey(0)
    images = jax.random.normal(
        key, (1, cfg.seqlen, cfg.img_size, cfg.img_size, 3), jnp.float32
    )
    queries = (
        jax.random.uniform(key, (1, cfg.track_num, 2)) * (cfg.img_size - 64) + 32
    ).astype(jnp.float32)
    params = jax.jit(model.init)(key, images, queries)
    params = cast_params_for_inference(params, cfg.dtype)

    fwd = jax.jit(lambda p, im, q: model.apply(p, im, q)["pred_pose_enc"].sum())
    # compile + warm
    float(fwd(params, images, queries))
    float(fwd(params, images, queries))

    jax.profiler.start_trace(logdir)
    for _ in range(2):
        float(fwd(params, images, queries))
    jax.profiler.stop_trace()


def report(logdir: str, top: int = 40) -> None:
    paths = sorted(
        glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    )
    if not paths:
        raise SystemExit(f"no xplane.pb under {logdir}")
    path = paths[-1]
    from xprof.convert import raw_to_tool_data as convert

    data, _ = convert.xspace_to_tool_data([path], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    rows = _parse_hlo_stats(data)
    if not rows:
        print(data[:2000])
        raise SystemExit("could not parse hlo_stats output")

    total = sum(r["self_us"] for r in rows)
    by_cat = {}
    for r in rows:
        by_cat.setdefault(r["category"], [0.0, 0])
        by_cat[r["category"]][0] += r["self_us"]
        by_cat[r["category"]][1] += r["occ"]
    print(f"== total device self-time: {total/1e3:.2f} ms ==")
    print("\n-- by category --")
    for cat, (us, occ) in sorted(by_cat.items(), key=lambda kv: -kv[1][0]):
        print(f"{us/1e3:9.3f} ms  {occ:6d}x  {cat}")
    print(f"\n-- top {top} ops --")
    for r in sorted(rows, key=lambda r: -r["self_us"])[:top]:
        name = r["name"][:110]
        print(f"{r['self_us']/1e3:9.3f} ms  {r['occ']:5d}x  [{r['category']}] {name}")


def _parse_hlo_stats(data):
    """hlo_stats arrives as a JSON object with 'data' rows (gviz-style) or
    as CSV; handle both."""
    rows = []
    try:
        obj = json.loads(data)
    except (ValueError, TypeError):
        obj = None
    if obj is not None:
        # gviz DataTable: {"cols": [...], "rows": [{"c": [{"v": ...}, ...]}]}
        cols = [c.get("label") or c.get("id") for c in obj.get("cols", [])]
        idx = {label: i for i, label in enumerate(cols)}

        def find(*cands):
            for c in cands:
                for label, i in idx.items():
                    if label and c in label.lower():
                        return i
            return None

        i_name = find("hlo op name", "op name", "name")
        i_cat = find("hlo op category", "category")
        i_self = find("total self time (us)", "self time (us)", "self-time")
        i_occ = find("occurrences", "#occurrences", "count")
        for row in obj.get("rows", []):
            c = row["c"]

            def val(i, default=None):
                if i is None or c[i] is None:
                    return default
                return c[i].get("v", default)

            self_us = val(i_self, 0.0) or 0.0
            rows.append(
                {
                    "name": str(val(i_name, "?")),
                    "category": str(val(i_cat, "?")),
                    "self_us": float(self_us),
                    "occ": int(val(i_occ, 1) or 1),
                }
            )
        return [r for r in rows if r["self_us"] > 0]
    # CSV fallback
    lines = data.strip().splitlines()
    if len(lines) < 2:
        return []
    header = [h.strip().lower() for h in lines[0].split(",")]

    def col(*cands):
        for c in cands:
            for i, h in enumerate(header):
                if c in h:
                    return i
        return None

    i_name = col("hlo_op_name", "op_name", "name")
    i_cat = col("category")
    i_self = col("total_self_time_us", "self_time_us", "self_time")
    i_occ = col("occurrences", "count")
    for line in lines[1:]:
        parts = line.split(",")
        if len(parts) < len(header):
            continue
        try:
            self_us = float(parts[i_self])
        except (ValueError, IndexError):
            continue
        rows.append(
            {
                "name": parts[i_name] if i_name is not None else "?",
                "category": parts[i_cat] if i_cat is not None else "?",
                "self_us": self_us,
                "occ": int(float(parts[i_occ])) if i_occ is not None else 1,
            }
        )
    return [r for r in rows if r["self_us"] > 0]


if __name__ == "__main__":
    if len(sys.argv) > 1 and os.path.isdir(sys.argv[1]):
        report(sys.argv[1])
    else:
        logdir = "/tmp/jax-trace-comet"
        os.system(f"rm -rf {logdir}")
        capture(logdir)
        report(logdir)
