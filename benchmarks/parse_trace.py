"""Parse an existing jax profiler trace dir and print ALL TPU ops grouped.

Usage: python benchmarks/parse_trace.py /tmp/jaxtrace_sep [n_iters]
"""
import glob
import gzip
import json
import re
import sys
from collections import defaultdict


def main():
    d = sys.argv[1]
    per = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
    tj = sorted(glob.glob(d + "/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(tj[-1], "rt") as f:
        trace = json.load(f)
    tpu_pids = set()
    for ev in trace["traceEvents"]:
        if ev.get("ph") == "M" and ev.get("name") == "process_name":
            if "tpu" in ev["args"].get("name", "").lower():
                tpu_pids.add(ev["pid"])
    ops = defaultdict(float)
    counts = defaultdict(int)
    for ev in trace["traceEvents"]:
        if ev.get("ph") != "X" or ev.get("pid") not in tpu_pids:
            continue
        name = ev.get("name", "")
        if name.startswith(("$", "process_", "jit_")):
            continue
        ops[name] += ev.get("dur", 0) / 1000.0
        counts[name] += 1
    # group by op prefix (strip trailing .N id)
    groups = defaultdict(float)
    for name, t in ops.items():
        groups[re.sub(r"\.\d+$", "", name)] += t
    print("== by op family (ms/scene) ==")
    for g, t in sorted(groups.items(), key=lambda kv: -kv[1]):
        if t / per > 0.5:
            print(f"  {t / per:8.2f}  {g}")
    print("\n== every op >0.5 ms (ms/scene, count) ==")
    for name, t in sorted(ops.items(), key=lambda kv: -kv[1]):
        if t / per > 0.5:
            print(f"  {t / per:8.2f}  x{counts[name]:<4} {name[:100]}")


if __name__ == "__main__":
    main()
