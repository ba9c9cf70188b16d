"""Round-over-round per-query bench diff (r17, r16 verdict #6).

The driver times only the queries in its own window, so ~half the
registry is invisible in BENCH_r{N}.json round over round; the idle-box
BENCH_LOCAL_r{N}.json files time EVERYTHING. This makes their diff one
command instead of an archaeology session:

    python tools/bench_diff.py BENCH_LOCAL_r16.json BENCH_LOCAL_r17.json

Consolidation-aware (registry.MERGED_FROM): a merged panel's previous
time is its own old time plus its absorbed names' (absent from the new
run), so a union panel is not mis-flagged as a regression against one
member. Output is one line per query — grep-able — plus a trailer with
the shared-total ratio and the calibration ratio when both files carry
probe data (a cal ratio ~= the total ratio means the BOX changed speed,
not the code).
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "parsed" in d:  # driver wrapper
        d = d["parsed"] or {}
    return d


def main(prev_path: str, cur_path: str) -> int:
    try:
        from homelogging_spark.plans.registry import MERGED_FROM
    except Exception:
        MERGED_FROM = {}
    prev, cur = load(prev_path), load(cur_path)
    prev_q, cur_q = prev.get("queries", {}), cur.get("queries", {})
    rows = []
    for name, now in cur_q.items():
        t, found, via = 0.0, False, []
        if name in prev_q:
            t, found = float(prev_q[name]), True
        for absorbed in MERGED_FROM.get(name, []):
            if absorbed in prev_q and absorbed not in cur_q:
                t += float(prev_q[absorbed])
                found = True
                via.append(absorbed)
        rows.append(
            (
                (float(now) / t) if found and t > 0 else None,
                name,
                t if found else None,
                float(now),
                "+".join(via),
            )
        )
    rows.sort(key=lambda r: (-(r[0] or 0.0), r[1]))
    for ratio, name, t, now, via in rows:
        tag = f" (prev incl {via})" if via else ""
        if ratio is None:
            print(f"{name:36s} prev      - now {now:7.3f}  NEW{tag}")
        else:
            print(f"{name:36s} prev {t:7.3f} now {now:7.3f}  x{ratio:5.2f}{tag}")
    gone = sorted(
        k
        for k in prev_q
        if k not in cur_q
        and not any(k in v and m in cur_q for m, v in MERGED_FROM.items())
    )
    for name in gone:
        print(f"{name:36s} prev {float(prev_q[name]):7.3f} now       -  RETIRED")
    shared = [(t, now) for _, __, t, now, ___ in rows if t]
    if shared:
        pt, ct = sum(t for t, _ in shared), sum(n for _, n in shared)
        line = f"shared-total prev {pt:.1f}s now {ct:.1f}s x{ct / pt:.3f}"
        pc, cc = prev.get("calibration") or {}, cur.get("calibration") or {}
        ratios = sorted(
            cc[k] / pc[k] for k in cc if isinstance(pc.get(k), (int, float)) and pc[k]
        )
        if ratios:
            line += f"  cal x{ratios[len(ratios) // 2]:.3f}"
        print(line)
    return 0


if __name__ == "__main__":
    if len(sys.argv) != 3:
        print(__doc__)
        sys.exit(2)
    sys.exit(main(sys.argv[1], sys.argv[2]))
