"""Parse a jax.profiler trace dir into a framework-op-stats CSV + summary.

Usage: python tools/parse_xplane.py /tmp/tb_train [out.csv]

Standalone so trace capture (TPU-bound, tunnel-sensitive) and parsing
(host-only) can run at different times. Prints the top-25 ops by total
self time with their category and FLOP rate when available.
"""
import csv
import glob
import io
import os
import sys


def main():
    log = sys.argv[1] if len(sys.argv) > 1 else "/tmp/tb_train"
    out_path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/op_stats.csv"
    planes = glob.glob(os.path.join(log, "**", "*.xplane.pb"), recursive=True)
    if not planes:
        print("no xplane files under", log)
        return 1
    from tensorboard_plugin_profile.convert import raw_to_tool_data as r2t

    data, _ = r2t.xspace_to_tool_data(planes, "framework_op_stats", {})
    if isinstance(data, bytes):
        data = data.decode("utf-8", "ignore")
    with open(out_path, "w") as f:
        f.write(data)
    print("wrote", out_path)

    rows = list(csv.DictReader(io.StringIO(data)))
    if not rows:
        return 0
    key_time = next((k for k in rows[0] if "total_self_time" in k.lower()
                     or "self_time" in k.lower()), None)
    if key_time is None:
        print("columns:", list(rows[0]))
        return 0
    rows.sort(key=lambda r: -float(r.get(key_time, 0) or 0))
    tot = sum(float(r.get(key_time, 0) or 0) for r in rows)
    print(f"total self time: {tot:.1f} (column {key_time})")
    for r in rows[:25]:
        t = float(r.get(key_time, 0) or 0)
        name = (r.get("operation") or r.get("op_name")
                or r.get("Operation") or "?")
        cat = r.get("category") or r.get("type") or ""
        print(f"{t:12.1f} {100 * t / tot:5.1f}% {cat:22s} {name[:90]}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
