#!/usr/bin/env python
"""Join the trace's per-HLO-op self-times with the compiled HLO's op_name
metadata to attribute device time to model scopes and source lines.

Usage: python tools/attribute_trace.py [tracedir] [hlo.txt]
(defaults: /tmp/jax-trace-comet /tmp/comet_hlo.txt — produced by
tools/trace_report.py and tools/dump_hlo.py)
"""

import os
import re
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from trace_report import _parse_hlo_stats  # noqa: E402


def load_hlo_meta(path):
    """Map HLO instruction name -> (op_name scope, source file:line)."""
    meta = {}
    pat = re.compile(
        r"%([\w.\-]+) = .*?metadata=\{[^}]*?op_name=\"([^\"]*)\""
        r"(?:[^}]*?source_file=\"([^\"]*)\")?(?:[^}]*?source_line=(\d+))?"
    )
    with open(path) as f:
        for line in f:
            m = pat.search(line)
            if m:
                name, op, sf, sl = m.groups()
                src = f"{os.path.basename(sf)}:{sl}" if sf else ""
                meta[name] = (op, src)
    return meta


def scope_of(op_name, depth=2):
    parts = [p for p in op_name.split("/") if p and not p.startswith("jit(")]
    # drop leading COMET
    if parts and parts[0] == "COMET":
        parts = parts[1:]
    return "/".join(parts[:depth]) if parts else "(toplevel)"


def main():
    tracedir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jax-trace-comet"
    hlopath = sys.argv[2] if len(sys.argv) > 2 else "/tmp/comet_hlo.txt"
    import glob

    paths = sorted(glob.glob(os.path.join(tracedir, "**", "*.xplane.pb"), recursive=True))
    from xprof.convert import raw_to_tool_data as convert

    data, _ = convert.xspace_to_tool_data([paths[-1]], "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", errors="replace")
    rows = _parse_hlo_stats(data)
    meta = load_hlo_meta(hlopath)

    n_fwd = 2  # trace_report runs 2 forwards
    agg, agg_src = {}, {}
    unmatched = 0.0
    for r in rows:
        m = meta.get(r["name"])
        if m is None:
            unmatched += r["self_us"]
            continue
        op, src = m
        sc = scope_of(op)
        agg[sc] = agg.get(sc, 0.0) + r["self_us"]
        key = (sc, src or op.split("/")[-1])
        agg_src[key] = agg_src.get(key, 0.0) + r["self_us"]

    total = sum(r["self_us"] for r in rows)
    print(f"total {total/1e3/n_fwd:.2f} ms/fwd; unattributed {unmatched/1e3/n_fwd:.2f} ms/fwd")
    print("\n-- by scope (ms per forward) --")
    for sc, us in sorted(agg.items(), key=lambda kv: -kv[1]):
        if us / 1e3 / n_fwd < 0.15:
            continue
        print(f"{us/1e3/n_fwd:8.2f}  {sc}")
    print("\n-- by scope + source (ms per forward, top 45) --")
    for (sc, src), us in sorted(agg_src.items(), key=lambda kv: -kv[1])[:45]:
        print(f"{us/1e3/n_fwd:8.2f}  {sc:55s} {src}")

    # Pallas custom-call time per MODULE instance (which kernel costs what:
    # per-ViT-block attention, per-updateformer-block fused kernels, ...)
    import re as _re

    kern = {}
    pat = _re.compile(
        r"(backbone/blocks_\d+|self_att_\d+|cross_att_\d+|time_blocks_\d+|"
        r"space_\w+?_blocks_\d+|cross_attn_block_\d+|trunk_\d+|"
        r"fine_tracker|coarse_tracker)"
    )
    ktotal = 0.0
    for r in rows:
        if r["category"] != "custom-call":
            continue
        m = meta.get(r["name"])
        op = m[0] if m else "?"
        g = pat.search(str(op))
        key = g.group(1) if g else (str(op)[:60] or r["name"][:40])
        kern[key] = kern.get(key, 0.0) + r["self_us"]
        ktotal += r["self_us"]
    print(f"\n-- Pallas custom-calls by module instance "
          f"({ktotal/1e3/n_fwd:.2f} ms/fwd total) --")
    for key, us in sorted(kern.items(), key=lambda kv: -kv[1])[:30]:
        print(f"{us/1e3/n_fwd:8.3f}  {key}")


if __name__ == "__main__":
    main()
