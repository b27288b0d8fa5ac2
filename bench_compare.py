"""Noise-aware round-over-round bench comparison.

Round-to-round TOTALS on this sandbox are not signal: three runs of
near-identical code spanned 97-125 s (round-6 verdict, Performance) —
the machine's ambient load moves every query uniformly by more than a
typical real regression. What IS signal is a single query whose timing
moves far outside that band while its neighbours hold still. This tool
encodes that judgement as an explicit threshold:

    flagged  <=>  cur/base > NOISE_RATIO  AND  cur-base > ABS_FLOOR_SEC

NOISE_RATIO = 1.5 is the measured envelope (the uniform ambient drift
observed between rounds 5 and 6 was ~1.10x, and min-of-N already strips
most of it); ABS_FLOOR_SEC keeps 20 ms -> 40 ms jitter on sub-100 ms
queries from counting as a 2x "regression".

Usage:
    python bench_compare.py [BASE_DETAIL] [CUR_DETAIL] [--json=OUT]

Defaults compare the freshest run (BENCH_DETAIL.json, overwritten by
every bench.py invocation) against the committed prior-round snapshot
(BENCH_DETAIL_r06.json — snapshot the current detail to
BENCH_DETAIL_r{N}.json when a round ends, so the next round has a
stable base). Exit code 1 iff any query is flagged, so the comparison
can gate a round the way the oracle gate does.
"""

from __future__ import annotations

import json
import os
import re
import sys

NOISE_RATIO = 1.5
ABS_FLOOR_SEC = 0.25

#: minimum common queries before the median ratio is trusted as the
#: common-mode drift term — on a handful of queries the median IS one
#: query's own change, not the machine's; at a registry-sized ~150 the
#: median is ambient state by construction (a real regression moves
#: ONE query, not the 78th percentile)
MIN_DRIFT_QUERIES = 20

_HERE = os.path.dirname(os.path.abspath(__file__))
DEFAULT_CUR = os.path.join(_HERE, "BENCH_DETAIL.json")


def _default_base() -> str:
    """Newest committed snapshot: BENCH_BASE_r{N}.json (a round-START
    run recorded on the CURRENT boot at the prior round's final HEAD)
    preferred over BENCH_DETAIL_r{N}.json at the same round number.

    Three consecutive rounds spent a commit proving cross-boot flags
    were boot variance (Python-worker spawn and JIT timing differ by
    up to 4x on sub-second queries across VM restarts); the round-10
    verdict's structural fix is the same-boot base — while a round is
    OPEN, only its BASE exists and flags against it are same-boot by
    construction. Once the round CLOSES (its DETAIL lands, reflecting
    the round's final code), the DETAIL outranks the round-start BASE:
    defaulting back to the BASE would re-flag every perf change the
    closed round deliberately made, against a snapshot of the PRIOR
    round's code.

    Newest = largest PARSED round number, not lexicographic filename —
    "r100" sorts before "r99" as a string, and an unpadded "r9" would
    sort after "r10", either of which silently picks a stale base.
    """
    snaps = []
    for f in os.listdir(_HERE):
        m = re.fullmatch(r"BENCH_(BASE|DETAIL)_r(\d+)\.json", f)
        if m:
            # (round, is_detail) sort key: DETAIL wins ties within a
            # round (it only exists once the round has closed)
            snaps.append((int(m.group(2)), m.group(1) == "DETAIL", f))
    if not snaps:
        raise SystemExit("no BENCH_BASE_r*/BENCH_DETAIL_r*.json "
                         "snapshot to compare against — pass the base "
                         "file explicitly")
    return os.path.join(_HERE, max(snaps)[2])


def _timings(detail: dict) -> dict[str, float]:
    """Numeric per-query timings; error entries ({'err': ...}) excluded."""
    return {n: v for n, v in detail.get("queries", {}).items()
            if not isinstance(v, dict)}


def compare(base: dict, cur: dict,
            noise_ratio: float = NOISE_RATIO,
            abs_floor_sec: float = ABS_FLOOR_SEC) -> dict:
    """Pure comparison of two bench detail dicts -> artifact dict.

    Drift normalization (round-11 verdict, Next round #3): ambient
    machine state moves EVERY query together — round 11 measured a
    uniform 1.09-1.25x shift between a round-start idle run and a
    round-end post-suite run with ~150 queries' code untouched. The
    median common-query ratio IS that common-mode term, so the gate
    applies to drift-NORMALIZED ratios (raw numbers stay in every
    entry; totals are reported raw). With fewer than MIN_DRIFT_QUERIES
    common queries the median would just be some query's own change —
    drift pins to 1.0 and the gate is the raw one."""
    bt, ct = _timings(base), _timings(cur)
    both = sorted(set(bt) & set(ct))
    ratios = sorted(ct[n] / bt[n] for n in both if bt[n] > 0)
    drift = (ratios[len(ratios) // 2]
             if len(ratios) >= MIN_DRIFT_QUERIES else 1.0)
    flagged, improved = {}, {}
    for n in both:
        b, c = bt[n], ct[n]
        ratio = round(c / b, 3) if b > 0 else float("inf")
        adj = round(ratio / drift, 3) if b > 0 else float("inf")
        entry = {"base": b, "cur": c, "ratio": ratio, "ratio_adj": adj}
        if adj > noise_ratio and (c / drift - b) > abs_floor_sec:
            flagged[n] = entry
        elif adj < 1 / noise_ratio and (b - c / drift) > abs_floor_sec:
            improved[n] = entry
    # every flag carries its machine-state context automatically (the
    # round-11 verdict's ask): the loadavg observed right after that
    # query in each run, when the details recorded it
    bq = base.get("query_loadavg") or {}
    cq = cur.get("query_loadavg") or {}
    for n, e in list(flagged.items()) + list(improved.items()):
        if n in bq or n in cq:
            e["loadavg_after_query"] = {"base": bq.get(n),
                                        "cur": cq.get(n)}
    return {
        "noise_ratio": noise_ratio,
        "abs_floor_sec": abs_floor_sec,
        "drift_median_ratio": round(drift, 3),
        "base_loadavg": base.get("loadavg"),
        "cur_loadavg": cur.get("loadavg"),
        "base_total_sec": round(sum(bt[n] for n in both), 3),
        "cur_total_sec": round(sum(ct[n] for n in both), 3),
        "n_compared": len(both),
        "flagged": flagged,            # regressions OUTSIDE the noise band
        "improved": improved,          # informational, same band applied
        "new_queries": sorted(set(ct) - set(bt)),
        "removed_queries": sorted(set(bt) - set(ct)),
        "errors_base": sorted(n for n, v in base.get("queries", {}).items()
                              if isinstance(v, dict)),
        "errors_cur": sorted(n for n, v in cur.get("queries", {}).items()
                             if isinstance(v, dict)),
    }


def main(argv: list[str]) -> int:
    json_path = None
    paths = []
    for a in argv:
        if a.startswith("--json="):
            json_path = a.split("=", 1)[1]
        else:
            paths.append(a)
    base_path = paths[0] if len(paths) > 0 else _default_base()
    cur_path = paths[1] if len(paths) > 1 else DEFAULT_CUR
    with open(base_path) as fh:
        base = json.load(fh)
    with open(cur_path) as fh:
        cur = json.load(fh)
    out = compare(base, cur)
    out["base_file"] = os.path.basename(base_path)
    out["cur_file"] = os.path.basename(cur_path)
    rendered = json.dumps(out, indent=1, sort_keys=True)
    print(rendered)
    if json_path:
        with open(json_path, "w") as fh:
            fh.write(rendered + "\n")
    return 1 if out["flagged"] or out["errors_cur"] else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
