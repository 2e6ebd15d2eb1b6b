"""Aggregate per-op device time from a jax.profiler trace.json.gz.

The tensorboard_plugin_profile converter is broken in this image
(protobuf/pywrap mismatch — see BENCH_NOTES), so this parses the
perfetto-style trace events directly: pid = TPU device, thread
'XLA Ops' carries one complete event per HLO op execution.

Usage: python tools/parse_trace_json.py <trace_dir_or_file> [top_n]
Prints total device time and the top-N ops grouped by a normalized
name (fusion instance ids stripped), with count and % of total.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys


def load_events(path):
    if os.path.isdir(path):
        cands = glob.glob(os.path.join(path, "**", "*.trace.json.gz"),
                          recursive=True)
        if not cands:
            raise SystemExit(f"no trace.json.gz under {path}")
        path = max(cands, key=os.path.getmtime)
    with gzip.open(path) as f:
        return json.load(f)["traceEvents"], path


_ID = re.compile(r"\.\d+$")


def norm(name: str) -> str:
    """fusion.123 -> fusion; keep the framework op path in args if present."""
    return _ID.sub("", name)


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tb_train"
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    ev, src = load_events(path)

    tpu_pids = {e["pid"] for e in ev
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in (e["args"].get("name") or "")}
    op_tids = {(e["pid"], e["tid"]) for e in ev
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in tpu_pids
               and e["args"].get("name") == "XLA Ops"}
    step_tids = {(e["pid"], e["tid"]) for e in ev
                 if e.get("ph") == "M" and e.get("name") == "thread_name"
                 and e["pid"] in tpu_pids
                 and e["args"].get("name") in ("Steps", "XLA Modules")}

    steps = [e for e in ev if e.get("ph") == "X"
             and (e["pid"], e["tid"]) in step_tids]
    mods = collections.Counter()
    for e in steps:
        if "(" in e["name"]:  # XLA Modules row: jit_<fn>(fingerprint)
            mods[e["name"].split("(")[0]] += e["dur"]
    if mods:
        print("device time by jitted module (us):")
        for k, v in mods.most_common(10):
            print(f"  {v:12.0f}  {k}")

    # group ops: prefer the source framework annotation when present
    agg = collections.defaultdict(lambda: [0.0, 0])
    tot = 0.0
    for e in ev:
        if e.get("ph") != "X" or (e["pid"], e["tid"]) not in op_tids:
            continue
        args = e.get("args") or {}
        key = norm(e["name"])
        scope = args.get("tf_op") or args.get("name") or ""
        if scope and scope != e["name"]:
            key = f"{key} [{norm(scope)}]"
        agg[key][0] += e["dur"]
        agg[key][1] += 1
        tot += e["dur"]
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])
    print(f"\n{src}\ntotal XLA-op device time: {tot / 1e3:.1f} ms "
          f"({len(rows)} distinct op groups)")
    for k, (t, n) in rows[:top_n]:
        print(f"{t / 1e3:9.2f} ms {100 * t / tot:5.1f}% x{n:<5d} {k[:120]}")


if __name__ == "__main__":
    main()
