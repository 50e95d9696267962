"""Strict full-catalog oracle sweep at sf0.01 — the builder-side mirror of
the driver's CORRECTNESS gate, run every round regardless of which ~50
queries the driver's staleness rotation happens to sample.

For every registered query with an oracle: run the Spark plan and the
DuckDB oracle on the same sf dir, compare with tests.oracle_compare
.assert_match (row count + column names + dtype-KIND + exact values —
dtype-kind strictness mirrors the driver's type-sensitive value hash).
Rows-only queries (no oracle) are executed and counted.

Writes a JSON log (default SWEEP_r{N}.json next to the repo root is the
caller's choice via --out) with one entry per query: ok / error message /
wall seconds.

Usage:
    python tools/strict_sweep.py [--sf-dir /root/testdata/sf0.01] \
        [--out SWEEP_r08.json] [--only t13,m09]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--out", default="SWEEP.json")
    ap.add_argument("--only", default="", help="comma-separated name prefixes")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "16")

    from pm25ml_spark.plans.registry import ORACLES, QUERIES, load_all_plans
    from pm25ml_spark.session import get_spark
    from tests.oracle_compare import assert_match, run_oracle

    load_all_plans()
    spark = get_spark("strict-sweep")

    prefixes = [p for p in args.only.split(",") if p]
    names = sorted(QUERIES)
    if prefixes:
        names = [n for n in names if any(n.startswith(p) for p in prefixes)]

    results: dict[str, dict] = {}
    n_ok = n_fail = 0
    for name in names:
        t0 = time.time()
        entry: dict = {"oracle": name in ORACLES}
        try:
            sdf = QUERIES[name](spark, args.sf_dir)
            if name in ORACLES:
                odf = run_oracle(ORACLES[name], args.sf_dir)
                assert_match(sdf, odf, name)
                entry["ok"] = True
            else:
                n = sdf.count()
                entry["ok"] = n >= 0 and len(sdf.schema.fields) > 0
                entry["rows"] = n
            n_ok += 1
        except Exception as exc:  # noqa: BLE001 — sweep must not abort
            entry["ok"] = False
            entry["err"] = f"{type(exc).__name__}: {exc}"[:2000]
            entry["trace"] = traceback.format_exc()[-2000:]
            n_fail += 1
            print(f"FAIL {name}: {entry['err'][:200]}", file=sys.stderr)
        entry["sec"] = round(time.time() - t0, 2)
        results[name] = entry
        status = "ok" if entry["ok"] else "FAIL"
        print(f"[{len(results)}/{len(names)}] {name}: {status} ({entry['sec']}s)")

    summary = {
        "sf_dir": args.sf_dir,
        "total": len(names),
        "ok": n_ok,
        "fail": n_fail,
        "strict_dtype_kind": True,
        "queries": results,
    }
    with open(args.out, "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True)
    print(f"\n{n_ok}/{len(names)} ok -> {args.out}")
    spark.stop()
    return 0 if n_fail == 0 else 1


if __name__ == "__main__":
    raise SystemExit(main())
