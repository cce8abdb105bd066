"""Aggregate a jax.profiler chrome trace: device-op time by name prefix.

Usage: python experiments/parse_trace.py /tmp/rtrace [top_n]
"""
import gzip
import json
import re
import sys
from collections import defaultdict
from pathlib import Path


def main():
    root = Path(sys.argv[1] if len(sys.argv) > 1 else "/tmp/rtrace")
    top_n = int(sys.argv[2]) if len(sys.argv) > 2 else 40
    paths = sorted(root.rglob("*.trace.json.gz")) or sorted(
        root.rglob("trace.json.gz"))
    if not paths:
        raise SystemExit(f"no trace.json.gz under {root}")
    path = paths[-1]
    print(f"# {path}")
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data["traceEvents"]

    # Map pid/tid -> track name to keep only device compute tracks.
    names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            names[e["pid"]] = e["args"].get("name", "")
    dev_pids = {pid for pid, n in names.items()
                if "TPU" in n or "Device" in n or "device" in n}
    print("# tracks:", {pid: names[pid] for pid in sorted(names)})

    agg = defaultdict(lambda: [0.0, 0])
    total = 0.0
    spans = []
    for e in events:
        if e.get("ph") != "X" or e.get("pid") not in dev_pids:
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        spans.append((e.get("ts", 0) / 1e3, dur))
        # strip trailing numeric suffixes: fusion.123 -> fusion
        base = re.sub(r"[.\d]+$", "", name)
        agg[base][0] += dur
        agg[base][1] += 1
        total += dur
    print(f"# total device op time: {total:.1f} ms over "
          f"{sum(c for _, c in agg.values())} events")
    # Device-busy fraction: union of op intervals / span. Nested events
    # (while bodies re-reported inside their parents) double-count in the
    # per-name sums above; the interval union is immune, so busy/span is
    # the honest host-gap metric (VERDICT r2 #5: want >= 95%).
    if spans:
        spans.sort()
        busy = 0.0
        cur_s, cur_e = spans[0][0], spans[0][0] + spans[0][1]
        for s, d in spans[1:]:
            if s > cur_e:
                busy += cur_e - cur_s
                cur_s, cur_e = s, s + d
            else:
                cur_e = max(cur_e, s + d)
        busy += cur_e - cur_s
        span = cur_e - spans[0][0]
        print(f"# device busy: {busy:.1f} ms over {span:.1f} ms span "
              f"= {100.0 * busy / max(span, 1e-9):.1f}%")
    for name, (ms, cnt) in sorted(agg.items(), key=lambda kv: -kv[1][0])[
            :top_n]:
        print(f"{ms:9.2f} ms  x{cnt:5d}  {name}")

    # --exact: also rank individual op instances (exact hlo names, numeric
    # suffix kept) so an expensive fusion can be pinned to its HLO.
    if "--exact" in sys.argv:
        exact = defaultdict(lambda: [0.0, 0])
        for e in events:
            if e.get("ph") != "X" or e.get("pid") not in dev_pids:
                continue
            exact[e.get("name", "?")][0] += e.get("dur", 0) / 1e3
            exact[e.get("name", "?")][1] += 1
        print("# exact op names:")
        for name, (ms, cnt) in sorted(exact.items(),
                                      key=lambda kv: -kv[1][0])[:top_n]:
            print(f"{ms:9.2f} ms  x{cnt:5d}  {name}")


if __name__ == "__main__":
    main()
