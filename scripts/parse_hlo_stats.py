"""Offline xprof hlo_stats report from a jax.profiler trace dir.

Usage: python scripts/parse_hlo_stats.py [logdir] [top] [--cat]
Prints top HLO ops by total self device time (per traced window), and with
--cat a per-category rollup.  The tool output is a gviz DataTable JSON.
"""
import glob
import json
import sys

from xprof.convert import raw_to_tool_data as conv

logdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/leccr_trace"
top = int(sys.argv[2]) if len(sys.argv) > 2 else 40


def load(logdir):
    paths = glob.glob(logdir + "/**/*.xplane.pb", recursive=True)
    data, _ = conv.xspace_to_tool_data(paths, "hlo_stats", {})
    if isinstance(data, bytes):
        data = data.decode()
    tbl = json.loads(data)
    cols = [c["id"] for c in tbl["cols"]]
    rows = [dict(zip(cols, [c["v"] if c else None for c in r["c"]]))
            for r in tbl["rows"]]
    return rows


def main():
    rows = load(logdir)
    total = sum(r.get("total_self_time") or 0 for r in rows)
    print(f"device self-time total: {total/1e3:.1f} ms (whole traced window)")
    if "--cat" in sys.argv:
        cats = {}
        for r in rows:
            c = r.get("category") or "?"
            e = cats.setdefault(c, [0.0, 0])
            e[0] += r.get("total_self_time") or 0
            e[1] += int(r.get("occurrences") or 0)
        for c, (t, n) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
            print(f"{t/1e3:9.2f} ms {100*t/total:5.1f}%  x{n:<5d} {c}")
        return
    rows.sort(key=lambda r: -(r.get("total_self_time") or 0))
    for r in rows[:top]:
        t = (r.get("total_self_time") or 0) / 1e3
        bw = r.get("measured_memory_bw") or 0
        gf = r.get("model_flop_rate") or 0
        name = (r.get("hlo_op_expression") or r.get("hlo_op_name") or "")[:120]
        print(f"{t:8.2f} ms x{int(r.get('occurrences') or 0):<4d} "
              f"{(r.get('category') or '')[:22]:22s} "
              f"{gf:7.0f} GF/s {bw:6.0f} GiB/s  {name}")


if __name__ == "__main__":
    main()
