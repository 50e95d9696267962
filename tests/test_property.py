"""Property-based (hypothesis) tests — randomized adversarial inputs for
the operators whose correctness depends on algebraic invariants rather
than fixtures. The reference has no randomized testing (SURVEY §5); these
go beyond it on the operators where a filter/prune step could silently
drop results.

Settings: small bounded examples (Spark round-trip per example is ~100 ms,
so examples are capped and deadlines disabled).
"""

from __future__ import annotations

import math

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pytest

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
    derandomize=True,
)


# ---------------------------------------------------------------------------
# as-of backward join ≡ per-row brute force max(ts' <= ts)


@given(
    left=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=1,
        max_size=12,
    ),
    right=st.lists(
        st.tuples(st.integers(0, 3), st.integers(0, 100)),
        min_size=0,
        max_size=12,
    ),
)
@SETTINGS
@pytest.mark.slow
def test_asof_backward_matches_bruteforce(spark, left, right):
    from pm25ml_spark.operators.asof import asof_join_backward

    ldf = spark.createDataFrame(
        [(k, t, i) for i, (k, t) in enumerate(left)],
        "k long, ts long, lid long",
    )
    # unique (key, ts) on the right so the expected match is unambiguous
    right = list({(k, t) for (k, t) in right})
    rdf = spark.createDataFrame(
        [(k, t, k * 1000 + t) for (k, t) in right] or [(99, 0, 0)],
        "k long, ts long, mark long",
    )
    out = {
        r.lid: r.asof_mark
        for r in asof_join_backward(
            ldf, rdf, key="k", left_ts="ts", right_ts="ts", payload=["mark"]
        ).collect()
    }
    rset = right or [(99, 0)]
    for i, (k, t) in enumerate(left):
        earlier = [rt for (rk, rt) in rset if rk == k and rt <= t]
        want = (k * 1000 + max(earlier)) if earlier else None
        assert out[i] == want, (i, k, t, out[i], want)


# ---------------------------------------------------------------------------
# prefix-filtered Jaccard ≡ brute-force pair set (the filter must never
# drop a qualifying pair)

_WORDS = ["aa", "bb", "cc", "dd", "ee"]


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=3, max_size=8),
        min_size=2,
        max_size=8,
    )
)
@SETTINGS
@pytest.mark.slow
def test_jaccard_prefix_filter_is_lossless(spark, docs):
    from pm25ml_spark.operators.dedup import jaccard_pairs

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r.doc_a, r.doc_b)
        for r in jaccard_pairs(df, n=3, t_num=1, t_den=2).collect()
    }

    def shingle_set(toks):
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = set()
    for a in range(len(docs)):
        for b in range(a + 1, len(docs)):
            sa, sb = shingle_set(docs[a]), shingle_set(docs[b])
            inter = len(sa & sb)
            if inter * 2 >= 1 * (len(sa) + len(sb) - inter):
                want.add((a, b))
    assert got == want


# ---------------------------------------------------------------------------
# asymmetric (batch-vs-corpus) jaccard probe: the union-order prefix
# filter must be lossless — every qualifying cross pair survives, and no
# same-side pair ever appears


@given(
    docs=st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=3, max_size=8),
        min_size=2,
        max_size=8,
    )
)
@SETTINGS
@pytest.mark.slow
def test_jaccard_between_prefix_filter_is_lossless(spark, docs):
    from pm25ml_spark.operators.dedup import jaccard_pairs_between

    rows = [(i, " ".join(toks)) for i, toks in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    batch = df.filter("doc_id % 2 = 0")
    corpus = df.filter("doc_id % 2 = 1")
    got = {
        (r.new_id, r.corpus_id)
        for r in jaccard_pairs_between(
            batch, corpus, n=3, t_num=1, t_den=2
        ).collect()
    }

    def shingle_set(toks):
        return {" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)}

    want = set()
    for a in range(0, len(docs), 2):
        for b in range(1, len(docs), 2):
            sa, sb = shingle_set(docs[a]), shingle_set(docs[b])
            inter = len(sa & sb)
            if inter * 2 >= 1 * (len(sa) + len(sb) - inter):
                want.add((a, b))
    assert got == want


# ---------------------------------------------------------------------------
# exact stratified split: per-stratum training count is exactly
# ceil(fraction * n_stratum), regardless of data shape


@given(
    sizes=st.lists(st.integers(1, 9), min_size=1, max_size=4),
    frac=st.sampled_from([0.1, 0.3, 0.5, 0.9]),
)
@SETTINGS
def test_stratified_split_exact_counts(spark, sizes, frac):
    from pm25ml_spark.operators.sampling import stratified_split

    rows = [(f"s{g}", g * 100 + i) for g, n in enumerate(sizes) for i in range(n)]
    df = spark.createDataFrame(rows, "stratum string, id long")
    out = stratified_split(df, "stratum", frac, seed=42, key="id")
    counts = {
        r.stratum: r.n
        for r in out.filter(out.split == "training")
        .groupBy("stratum")
        .count()
        .withColumnRenamed("count", "n")
        .collect()
    }
    for g, n in enumerate(sizes):
        assert counts.get(f"s{g}", 0) == math.ceil(n * frac), (g, n, frac)


# ---------------------------------------------------------------------------
# blocked cosine near-dup: block count must not change the result


@given(
    n_blocks=st.sampled_from([1, 2, 3, 7]),
    n_vecs=st.integers(3, 10),
)
@SETTINGS
@pytest.mark.slow
def test_blocked_neardup_invariant_to_block_count(spark, n_blocks, n_vecs):
    from pm25ml_spark.operators.similarity import cosine_neardup_pairs

    rows = [
        (i, [1.0, 0.01 * (i % 3), 0.02 * (i % 2)]) for i in range(n_vecs)
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = {
        (r.id_a, r.id_b, r.score)
        for r in cosine_neardup_pairs(df, threshold=0.99, n_blocks=n_blocks).collect()
    }
    ref = {
        (r.id_a, r.id_b, r.score)
        for r in cosine_neardup_pairs(df, threshold=0.99, n_blocks=1).collect()
    }
    assert got == ref


# ---------------------------------------------------------------------------
# connected components ≡ local union-find on random graphs


@given(
    edges=st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1,
        max_size=25,
    )
)
@SETTINGS
@pytest.mark.slow
def test_connected_components_match_union_find(spark, edges):
    from pm25ml_spark.operators.components import connected_components

    edges = [(a, b) for a, b in edges if a != b]
    if not edges:
        edges = [(0, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r.node: r.component for r in connected_components(df).collect()}

    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {}
    for n in parent:
        want[n] = find(n)
    assert got == want


# ---------------------------------------------------------------------------
# codec round-trips: PNG / NetCDF-3 / LCC projection — pure numpy, so
# examples are cheap and can run in volume


@given(
    h=st.integers(1, 24),
    w=st.integers(1, 24),
    ch=st.sampled_from([1, 2, 3, 4]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None, derandomize=True)
def test_png_roundtrip_property(h, w, ch, seed):
    import numpy as np
    from pm25ml_spark.sources.imaging import decode_png, encode_png

    img = np.random.RandomState(seed).randint(
        0, 256, size=(h, w, ch), dtype=np.uint8
    )
    out = decode_png(encode_png(img))
    expect = img[:, :, 0] if ch == 1 else img
    assert out.shape == expect.shape
    assert np.array_equal(out, expect)


@given(
    dims=st.lists(st.integers(1, 6), min_size=1, max_size=3),
    dtype=st.sampled_from(["f4", "f8", "i2", "i4", "i1"]),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=40, deadline=None, derandomize=True)
def test_netcdf3_roundtrip_property(tmp_path_factory, dims, dtype, seed):
    import numpy as np
    from pm25ml_spark.sources.netcdf3 import read_netcdf3, write_netcdf3

    rng = np.random.RandomState(seed)
    shape = tuple(dims)
    if dtype.startswith("f"):
        arr = rng.randn(*shape).astype(dtype)
    else:
        info = np.iinfo(dtype)
        arr = rng.randint(info.min, info.max, size=shape).astype(dtype)
    p = str(tmp_path_factory.mktemp("nc") / "t.nc")
    names = [f"d{i}" for i in range(len(shape))]
    write_netcdf3(
        p,
        dims=dict(zip(names, shape)),
        variables={"v": (tuple(names), arr, {"s": seed % 100})},
    )
    _, variables, _ = read_netcdf3(p)
    got = variables["v"][1]
    assert got.shape == arr.shape
    assert np.array_equal(got.astype(arr.dtype), arr)
    assert variables["v"][2]["s"] == seed % 100


@given(
    lon=st.floats(60.0, 100.0),
    lat=st.floats(5.0, 38.0),
)
@settings(max_examples=60, deadline=None, derandomize=True)
def test_lcc_roundtrip_property(lon, lat):
    from pm25ml_spark.sources.shapefile_io import LambertConformalConic2SP

    proj = LambertConformalConic2SP(
        a=6378137.0,
        inv_f=298.257223563,
        lat_origin=24.0,
        lon_origin=80.0,
        lat_1=12.472955,
        lat_2=35.172806,
        false_easting=4e6,
        false_northing=4e6,
    )
    x, y = proj.forward(lon, lat)
    lon2, lat2 = proj.inverse(x, y)
    assert abs(lon2 - lon) < 1e-9 and abs(lat2 - lat) < 1e-9


@given(
    n=st.integers(4, 40),
    seed=st.integers(0, 2**31 - 1),
)
@settings(max_examples=25, deadline=None, derandomize=True)
def test_delaunay_property_random(n, seed):
    """Empty-circumcircle invariant on arbitrary point sets (degenerate
    collinear subsets included by construction of small n)."""
    import numpy as np
    from pm25ml_spark.operators.interpolation import _circumcircles, _delaunay

    pts = np.random.RandomState(seed).rand(n, 2)
    tris = _delaunay(pts)
    if len(tris) == 0:
        return  # fully collinear draw — nothing to check
    cc, r2 = _circumcircles(pts, tris)
    for t in range(len(tris)):
        d2 = ((pts - cc[t]) ** 2).sum(1)
        inside = d2 < r2[t] * (1 - 1e-9)
        inside[tris[t]] = False
        assert not inside.any()


# ---------------------------------------------------------------------------
# partitioned decimation ≡ global decimation (exactness across layouts)


@given(
    n=st.integers(1, 120),
    every=st.integers(1, 11),
    nparts=st.integers(1, 6),
    shuffle_seed=st.integers(0, 3),
)
@SETTINGS
@pytest.mark.slow
def test_decimate_partitioned_property(spark, n, every, nparts, shuffle_seed):
    import random

    from pm25ml_spark.operators.sampling import decimate, decimate_partitioned

    keys = list(range(n))
    random.Random(shuffle_seed).shuffle(keys)
    df = spark.createDataFrame([(k,) for k in keys], "id long").repartition(3)
    a = sorted(r.id for r in decimate(df, every, ["id"]).collect())
    b = sorted(
        r.id
        for r in decimate_partitioned(
            df, every, ["id"], num_partitions=nparts
        ).collect()
    )
    assert a == b == list(range(0, n, every))


# ---------------------------------------------------------------------------
# progressive JPEG ≡ baseline JPEG on identical quantized coefficients


@given(
    h=st.integers(8, 40),
    w=st.integers(8, 40),
    gray=st.booleans(),
    quality=st.sampled_from([50, 75, 90]),
    seed=st.integers(0, 1000),
)
@settings(max_examples=10, deadline=None, derandomize=True)
def test_progressive_equals_baseline_property(h, w, gray, quality, seed):
    import numpy as np

    from pm25ml_spark.sources.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )

    rng = np.random.RandomState(seed)
    shape = (h, w) if gray else (h, w, 3)
    img = rng.randint(0, 256, shape, dtype=np.uint8)
    base = decode_jpeg(encode_jpeg(img, quality=quality))
    prog = decode_jpeg(encode_jpeg_progressive(img, quality=quality))
    assert np.array_equal(base, prog)


@settings(max_examples=25, deadline=None)
@given(
    shape=st.tuples(
        st.integers(1, 6), st.integers(1, 9), st.integers(1, 9)
    ),
    chunks=st.tuples(
        st.integers(1, 4), st.integers(1, 5), st.integers(1, 5)
    ),
    level=st.sampled_from([None, 1, 5]),
    seed=st.integers(0, 2**31 - 1),
)
def test_zarr_roundtrip_property(tmp_path_factory, shape, chunks, level, seed):
    """Any shape × any chunking × any codec level round-trips exactly,
    NaNs included — chunk-grid arithmetic has no edge-size bugs."""
    import numpy as np

    from pm25ml_spark.sources.zarr_io import read_zarr_array, write_zarr_array

    rng = np.random.default_rng(seed)
    arr = rng.normal(size=shape).astype(np.float32)
    arr[rng.random(shape) < 0.2] = np.nan
    p = str(tmp_path_factory.mktemp("z") / "a")
    write_zarr_array(p, arr, chunks, ["t", "y", "x"], level=level)
    back, _ = read_zarr_array(p)
    np.testing.assert_array_equal(back, arr)


@settings(max_examples=25, deadline=None)
@given(
    h=st.integers(1, 40),
    w=st.integers(1, 20),
    rows_per_strip=st.integers(1, 48),
    compress=st.booleans(),
    seed=st.integers(0, 2**31 - 1),
)
def test_geotiff_roundtrip_property(
    tmp_path_factory, h, w, rows_per_strip, compress, seed
):
    """Any grid size × any strip height × both codecs round-trips the
    values and reconstructs the coordinate axes exactly."""
    import numpy as np

    from pm25ml_spark.sources.geotiff import read_geotiff, write_geotiff

    rng = np.random.default_rng(seed)
    g = rng.normal(size=(h, w)).astype(np.float32)
    ys = 50.0 + 10.0 * np.arange(h)
    xs = -30.0 + 5.0 * np.arange(w)
    p = write_geotiff(
        str(tmp_path_factory.mktemp("g") / "t"),
        g,
        ys,
        xs,
        compress=compress,
        rows_per_strip=rows_per_strip,
    )
    out = read_geotiff(p)
    np.testing.assert_array_equal(out["values"], g)
    np.testing.assert_allclose(out["ys"], ys)
    np.testing.assert_allclose(out["xs"], xs)


# ---------------------------------------------------------------------------
# typed z-order ranks: order preservation + clamp/NULL invariants.
# The Morton layout's pruning correctness rests entirely on ranks being
# monotone in the source value (a non-monotone rank would scatter a
# range predicate's rows across the key space and the per-file min/max
# rectangles would still be "correct" but useless); fixtures can't
# cover the value space, so randomized inputs do.


@given(
    vals=st.lists(
        st.one_of(st.none(), st.integers(min_value=-10**6, max_value=10**6)),
        min_size=2,
        max_size=12,
    ),
    lo=st.integers(min_value=-10**4, max_value=0),
    span=st.integers(min_value=1, max_value=10**5),
    bits=st.integers(min_value=2, max_value=12),
)
@SETTINGS
def test_rank_scale_monotone_clamped_null_safe(spark, vals, lo, span, bits):
    from pyspark.sql import functions as F

    from pm25ml_spark.operators.zorder import rank_scale

    hi = lo + span
    df = spark.createDataFrame([(v,) for v in vals], "v long")
    got = {
        r.v: r.s
        for r in df.withColumn(
            "s", rank_scale(F.col("v"), lo, hi, bits)
        ).collect()
    }
    top = (1 << bits) - 1
    ranked = sorted((v, got[v]) for v in got if v is not None)
    for (_v1, s1), (_v2, s2) in zip(ranked, ranked[1:]):
        assert s1 <= s2, "rank must be monotone in the value"
    for v, s in ranked:
        assert 0 <= s <= top, "clamp must bound every rank"
        if lo <= v <= hi and span:
            lin = (v - lo) * top / span
            assert abs(s - lin) <= 1, "in-bounds rank must track the scale"
    for v in got:
        if v is None:
            assert got[v] is None, "NULL must stay NULL, never an edge cell"


@given(
    words=st.lists(
        st.text(
            alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
            min_size=1,
            max_size=8,
        ),
        min_size=2,
        max_size=10,
        unique=True,
    ),
    bits=st.integers(min_value=3, max_value=10),
)
@SETTINGS
@pytest.mark.slow
def test_typed_string_rank_preserves_lexicographic_order(spark, words, bits):
    """Dictionary rank must order exactly like the string column itself
    — otherwise a BETWEEN predicate's stats prune and the z-layout
    disagree about which files a range can live in."""
    from pm25ml_spark.operators.zorder import typed_bounds, typed_zorder_key_fixed

    df = spark.createDataFrame([(w, 0) for w in words], "s string, pad long")
    spec = typed_bounds(df, ["s", "pad"])
    keyed = typed_zorder_key_fixed(df, spec, bits=bits)
    got = {r.s: r["__z"] for r in keyed.collect()}
    ordered = sorted(words)
    ks = [got[w] for w in ordered]
    assert ks == sorted(ks), (ordered, ks)
