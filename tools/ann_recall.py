"""Measured ANN recall-vs-cost curves for the catalog's index-backed
vector-search plans (round-11 ask #3).

The catalog queries (ss04/ss09/ss10/ss13/ss14) are hash-exact against
their DuckDB oracles — that proves the ENGINE computes the declared
approximation correctly, not that the approximation finds the true
neighbors. A 100 TB deployment tunes nprobe / probe radius / table
count against MEASURED recall; this tool runs the REAL Spark operators
(the same staged-index + broadcast-probe plans the catalog serves)
against the ss01 brute-force ground truth and records recall@k and
wall seconds for a knob sweep, writing RECALL.md + RECALL.json.

Unlike tools/ann_recall_sweep.py (a numpy mirror used to choose the
defaults quickly), everything here is the Spark path end-to-end —
staged index builds included, itemized separately so query-time cost
is not laundered into build cost or vice versa.

Usage:
    python tools/ann_recall.py [--sf-dir /root/testdata/sf0.1] \
        [--out RECALL.md] [--json RECALL.json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 3  # recall@3 unless the variant's catalog k is smaller


def truth_topk(spark, sf_dir: str, k: int):
    """Brute-force cosine top-k per query (the ss01 operator) — the
    ground truth every approximate variant is scored against."""
    from pm25ml_spark.operators import similarity as S
    from pm25ml_spark.plans.similarity import _qc

    _, q, c = _qc(spark, sf_dir)
    rows = S.cosine_topk(q, c, k=k).collect()
    out: dict[int, list[int]] = {}
    for r in sorted(rows, key=lambda r: (r["qid"], r["rk"])):
        out.setdefault(r["qid"], []).append(r["cid"])
    return out


def recall_at(pred_rows, truth: dict[int, list[int]], k: int) -> float:
    """Mean over queries of |pred∩truth_k| / k. Queries the variant
    returned nothing for count as 0 — an index that loses a query in
    an empty probe set must pay for it in the metric."""
    pred: dict[int, set[int]] = {}
    for r in pred_rows:
        if r["rk"] <= k:
            pred.setdefault(r["qid"], set()).add(r["cid"])
    if not truth:
        return 0.0
    total = 0.0
    for qid, tk in truth.items():
        total += len(pred.get(qid, set()) & set(tk[:k])) / min(k, len(tk))
    return total / len(truth)


def timed(df):
    t0 = time.perf_counter()
    rows = df.collect()
    return rows, time.perf_counter() - t0


def run(spark, sf_dir: str) -> dict:
    import pyspark.sql.functions as F

    from pm25ml_spark.operators import similarity as S
    from pm25ml_spark.plans import similarity as P
    from pm25ml_spark.plans.artifacts import BUILD_SECONDS
    from pm25ml_spark.plans.similarity import _qc

    _, q, _ = _qc(spark, sf_dir)
    results: dict[str, list[dict]] = {}

    truth3 = truth_topk(spark, sf_dir, K)

    def record(family, cfg, rows, secs, k, truth, default=False):
        results.setdefault(family, []).append(
            {
                "config": cfg,
                "k": k,
                "recall": round(recall_at(rows, truth, k), 4),
                "sec": round(secs, 3),
                "default": default,
            }
        )

    # --- IVF (ss04 plan shape): staged inverted lists, nprobe sweep
    lists = P._ivf_lists_staged(spark, sf_dir)
    for nprobe in (1, 2, 4, 8, 16):
        rows, secs = timed(
            S.ivf_probe_topk(q, lists, k=K, nprobe=nprobe,
                             centroid_stride=100, centroid_offset=7)
        )
        record("ivf_ss04", f"nprobe={nprobe}", rows, secs, K, truth3,
               default=(nprobe == 4))
    # the ss16 adaptive rule as a labeled point on the same curve: the
    # recall a deployment KEEPS as the corpus (and so the list count)
    # grows, where any fixed nprobe row above degrades
    import math

    cen_ids, _CM = S._ivf_codebook_arrays(lists, 100, 7, None, "cid", "ce")
    adaptive = max(1, math.ceil(math.sqrt(len(cen_ids))))
    rows, secs = timed(
        S.ivf_probe_topk(q, lists, k=K, nprobe=adaptive,
                         centroid_stride=100, centroid_offset=7)
    )
    record("ivf_ss04",
           f"nprobe=ceil(sqrt({len(cen_ids)}))={adaptive} [ss16 adaptive]",
           rows, secs, K, truth3)

    # --- incremental IVF (ss13): same probe plan over the two-commit
    # base+delta index — recall must MATCH the from-scratch index at
    # equal nprobe (the incremental-equals-rebuild claim, measured)
    lists_incr = P._ivf_lists_incremental(spark, sf_dir)
    truth2 = {qid: tk[:2] for qid, tk in truth3.items()}
    for nprobe in (1, 3, 8):
        rows, secs = timed(
            S.ivf_probe_topk(q, lists_incr, k=2, nprobe=nprobe,
                             centroid_stride=100, centroid_offset=7)
        )
        record("ivf_incr_ss13", f"nprobe={nprobe}", rows, secs, 2, truth2,
               default=(nprobe == 3))

    # --- LSH multi-table (ss09 plan shape): staged postings,
    # (tables × probe radius) sweep. Each table count is its own staged
    # artifact (a production store sizes its table set up front).
    truth1 = {qid: tk[:1] for qid, tk in truth3.items()}
    for n_tables in (1, 2, 4):
        postings = P._lsh_postings_staged(
            spark, sf_dir, n_planes=8, n_tables=n_tables
        )
        for h in (0, 1, 2):
            rows, secs = timed(
                S.lsh_probe_topk(q, postings, k=1, n_planes=8, dim=64,
                                 probe_hamming=h, n_tables=n_tables)
            )
            record("lsh_ss09", f"tables={n_tables},h={h}", rows, secs, 1,
                   truth1,
                   default=(n_tables == P._MT_TABLES and h == P._MT_H))

    # --- incremental LSH (ss14): base+delta postings, (tables × radius)
    # sweep — each table count staged through the SAME two-commit
    # incremental lifecycle. This is the measurement behind the r12
    # retune: single-table radius-2 tops out at 0.40 (radius widening
    # cannot recover neighbors one signature separates by > h bits),
    # 4 tables at the same radius measure 0.875 — the maintenance price
    # (L× hash+append per refresh, still O(batch)) buys the recall.
    for n_tables in (1, 2, 4):
        postings_incr = P._lsh_postings_incremental(
            spark, sf_dir, n_tables=n_tables
        )
        for h in (1, 2):
            rows, secs = timed(
                S.lsh_probe_topk(q, postings_incr, k=1,
                                 n_planes=P._LSH_INCR_PLANES, dim=64,
                                 probe_hamming=h, n_tables=n_tables)
            )
            record("lsh_incr_ss14", f"tables={n_tables},h={h}", rows, secs,
                   1, truth1,
                   default=(n_tables == P._LSH_INCR_TABLES
                            and h == P._LSH_INCR_H))

    # --- IVFADC (ss10): staged residual codebook + code table, nprobe
    # sweep through the LUT builder (rank is compressed-domain ADC, so
    # recall is bounded by quantization error, not just probe coverage)
    cen_ids, CM = S.ivfpq_coarse_arrays(
        _qc(spark, sf_dir)[2], 100, 7
    )
    rsubs = P._ivfpq_rcodebook_staged(spark, sf_dir)
    codes_cen = P._ivfpq_codes_staged(spark, sf_dir)
    for nprobe in (2, 4, 8):
        lut = S.ivfpq_lut(q, rsubs, cen_ids, CM, nprobe, P._PQ_M, P._PQ_SD)
        rows, secs = timed(S.ivfpq_adc_rank(codes_cen, lut, k=K))
        record("ivfpq_ss10", f"nprobe={nprobe}", rows, secs, K, truth3,
               default=(nprobe == P._IVFPQ_NPROBE))

    # --- IVFADC + EXACT RERANK (ss08's second stage on the ss10 index;
    # r12 ask #3): ADC shortlist of width W → fetch-by-id broadcast →
    # exact cosine rescore (operators.similarity.exact_rescore). The
    # curve decomposes IVFADC's recall bound into its two parts: at
    # fixed nprobe, growing W recovers what the 16-cell residual
    # codebook loses (quantization error) until the curve SATURATES at
    # the probe-coverage ceiling — past that only more probes help.
    # The exact math touches W rows per query; everything else stays
    # compressed-domain.
    for nprobe in (P._IVFPQ_NPROBE, 16):
        lut = S.ivfpq_lut(q, rsubs, cen_ids, CM, nprobe, P._PQ_M, P._PQ_SD)
        for W in (24, 96):
            short = S.ivfpq_adc_rank(codes_cen, lut, k=W)
            rows, secs = timed(S.exact_rescore(short, q, _qc(spark, sf_dir)[2], k=K))
            record("ivfpq_rerank", f"nprobe={nprobe},W={W}", rows, secs, K,
                   truth3)

    return {
        "sf_dir": sf_dir,
        "n_queries": len(truth3),
        "results": results,
        "stage_build_sec": {
            k: round(v, 3) for k, v in sorted(BUILD_SECONDS.items())
        },
    }


def render_md(payload: dict) -> str:
    lines = [
        "# RECALL — measured ANN recall vs cost (real Spark plans)",
        "",
        f"Corpus: `{payload['sf_dir']}` — {payload['n_queries']} queries "
        f"(`vec_id % 50 = 0`), ground truth = ss01 brute-force cosine "
        f"top-k. Wall seconds are query-time only; one-time staged index "
        f"builds are itemized at the bottom. Generated by "
        f"`tools/ann_recall.py`; the floor at the catalog defaults is "
        f"pinned in `tests/test_ann_recall.py`.",
        "",
    ]
    if "scaled" in payload["sf_dir"]:
        lines += [
            "> **Sharded-replication caveat**: this corpus grows by "
            "disjoint-key shard copies (`tools/gen_scaled_sf.py`), so "
            "each query's true neighbors co-shard with it and recall is "
            "structurally EASIER than at the organic sfs — compare "
            "rows within this file, not across files. The adaptive-vs-"
            "fixed ordering is the transferable signal.",
            "",
        ]
    titles = {
        "ivf_ss04": "IVF inverted-list probe (ss04 plan, recall@3)",
        "ivf_incr_ss13": "IVF over the incrementally-maintained index "
        "(ss13 plan, recall@2)",
        "lsh_ss09": "Multi-table hyperplane LSH (ss09 plan, recall@1)",
        "lsh_incr_ss14": "Incremental LSH postings, (tables × radius) "
        "sweep (ss14 plan, recall@1)",
        "ivfpq_ss10": "IVFADC compressed-domain rank (ss10 plan, recall@3)",
        "ivfpq_rerank": "IVFADC + exact rerank: ADC shortlist W → "
        "exact_rescore (recall@3)",
    }
    for fam, rows in payload["results"].items():
        lines += [f"## {titles.get(fam, fam)}", "",
                  "| config | recall@k | query sec |", "|---|---|---|"]
        for r in rows:
            mark = " **(catalog default)**" if r["default"] else ""
            lines.append(
                f"| {r['config']}{mark} | {r['recall']:.4f} | {r['sec']:.2f} |"
            )
        lines.append("")
    lines += ["## One-time staged index builds (sec)", ""]
    for k, v in payload["stage_build_sec"].items():
        lines.append(f"- {k}: {v}")
    lines += [
        "",
        "## Reading the curves (100 TB guidance)",
        "",
        "- **Recall is monotone in probe coverage by construction**: a "
        "larger nprobe / probe radius / table set strictly extends the "
        "candidate set, so each column above is non-decreasing down the "
        "sweep — `tests/test_ann_recall.py` pins that structure plus "
        "absolute floors, so a probe-mask or probe-selection regression "
        "craters a test before it silently craters production recall.",
        "- **Fixed nprobe does not transfer across corpus sizes.** The "
        "coarse codebook is strided (1 centroid per 100 vectors), so "
        "list COUNT grows with the corpus and a fixed nprobe covers a "
        "shrinking fraction: the same nprobe=4 default measures ~0.97 "
        "recall@3 on a 5-list corpus (sf0.01) and ~0.52 on a 20-list "
        "corpus (sf0.1). A deployment holds the COVERED FRACTION "
        "roughly constant (nprobe ∝ √lists is the common rule) — this "
        "file is the measurement that choice is made from.",
        "- **Query wall-time is nearly flat across the sweep** at these "
        "scales because the probe fan-out is broadcast-joined and the "
        "per-candidate cosine is a JVM fold; the real cost driver at "
        "100 TB is candidates scanned per query (∝ nprobe/lists for "
        "IVF, bucket occupancy × probes × tables for LSH). Recall per "
        "candidate-scanned is the metric to optimize, and the LSH "
        "tables=4,h=2 point dominates the single-table radius-3 "
        "alternative on it — it became the ss09 catalog default in the "
        "r11 retune (the entry shipped (2,1) before this measurement "
        "existed).",
        "- **IVFADC recall decomposes into quantization error + probe "
        "coverage, and the rerank curve above MEASURES the split** (r12): "
        "at the default nprobe=4, exact rerank of a W=24 shortlist "
        "roughly DOUBLES recall@3 (the quantization half, fixed by "
        "`exact_rescore`'s 24-exact-evaluations-per-query second stage) "
        "but saturates near the probe-coverage ceiling; crossing 0.9 "
        "needs both levers — nprobe=16 (4× the default probe budget) "
        "with W=96 (exact math on ~5% of this corpus, everything else "
        "compressed-domain) measures ≥0.90, the pinned rerank floor in "
        "`tests/test_ann_recall.py`. More shortlist without more probes "
        "stalls; more probes without rerank stalls lower.",
        "- **Incremental-LSH tables are the lever radius cannot "
        "replace** (the r12 ss14 retune measurement): one 7-plane "
        "signature separates some true neighbors by more than any "
        "practical probe radius (tables=1 h=2 = 0.40 and flat), while "
        "independent tables re-draw the planes — (4, 2) measures 0.875 "
        "at the cost of L× hash+append per refresh (still O(batch) "
        "maintenance, the standard multi-table price). The per-table "
        "incremental lifecycle is identical; only L changed.",
        "",
    ]
    return "\n".join(lines)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default="RECALL.md")
    ap.add_argument("--json", default="RECALL.json")
    args = ap.parse_args()

    os.environ.setdefault("SPARK_GRAFT_CPUS", "16")
    os.environ.setdefault("SPARK_GRAFT_SHUFFLE", "16")
    from pm25ml_spark.session import get_spark

    spark = get_spark("ann_recall")
    payload = run(spark, args.sf_dir)
    with open(args.json, "w") as f:
        json.dump(payload, f, indent=1)
    with open(args.out, "w") as f:
        f.write(render_md(payload))
    print(f"wrote {args.out} and {args.json}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
