"""S9/S10 CSV-over-HTTP source tests: a real local HTTP server feeds the
distributed mapInPandas fetch (no network needed), plus file:// URLs,
retry behaviour, schema stability, and the station helpers."""

from __future__ import annotations

import http.server
import threading

import numpy as np
import pandas as pd
import pytest

from pm25ml_spark.sources.http_csv import (
    MEASUREMENT_SCHEMA,
    STATION_SCHEMA,
    month_urls,
    parse_station_coordinates,
    read_csv_urls,
    station_stats,
)


@pytest.fixture(scope="module")
def http_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("www")
    (root / "m1.csv").write_text(
        "location_id,date,value,extra\nst1,2023-01-01,10.0,x\n"
        "st1,2023-01-02,20.0,y\nst2,2023-01-01,5.0,z\n"
    )
    (root / "m2.csv").write_text(
        # different column order + a missing 'extra' column
        "value,location_id,date\n30.0,st1,2023-02-01\n7.0,st2,2023-02-01\n"
    )
    (root / "stations.csv").write_text(
        "id,coordinates\n"
        "st1,\"{'longitude': 77.1, 'latitude': 28.6}\"\n"
        "st2,\"{'longitude': 72.8, 'latitude': 19.0}\"\n"
    )
    handler = lambda *a, **kw: http.server.SimpleHTTPRequestHandler(  # noqa: E731
        *a, directory=str(root), **kw
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield root, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_distributed_fetch_over_http(spark, http_root):
    _, base = http_root
    df = read_csv_urls(
        spark, [f"{base}/m1.csv", f"{base}/m2.csv"], MEASUREMENT_SCHEMA
    )
    out = df.toPandas().sort_values(["date", "location_id"]).reset_index(drop=True)
    assert list(out.columns) == ["location_id", "date", "value"]
    assert len(out) == 5
    # column-order independence: m2's reordered header still maps by name
    assert out[out.date == "2023-02-01"].value.tolist() == [30.0, 7.0]


def test_fetch_file_urls(spark, http_root):
    root, _ = http_root
    df = read_csv_urls(
        spark, [(root / "m1.csv").as_uri()], MEASUREMENT_SCHEMA
    )
    assert df.count() == 3


def test_fetch_missing_url_fails_loudly(spark, http_root):
    _, base = http_root
    df = read_csv_urls(
        spark, [f"{base}/nope.csv"], MEASUREMENT_SCHEMA, retries=0
    )
    with pytest.raises(Exception, match="nope.csv"):
        df.collect()


def test_month_urls_inclusive_ranges():
    urls = month_urls("https://api.example.org", ["2023-01", "2023-02"])
    assert "date_from=2023-01-01" in urls[0]
    assert "date_to=2023-01-31" in urls[0]  # inclusive month end
    assert "date_to=2023-02-28" in urls[1]
    assert all("pollutant=pm25" in u for u in urls)


def test_station_stats_quartiles(spark, http_root):
    _, base = http_root
    meas = read_csv_urls(
        spark, [f"{base}/m1.csv", f"{base}/m2.csv"], MEASUREMENT_SCHEMA
    )
    stats = station_stats(meas).toPandas().set_index("location_id")
    st1 = np.array([10.0, 20.0, 30.0])
    assert stats.loc["st1", "station_q1"] == pytest.approx(
        np.percentile(st1, 25)
    )
    assert stats.loc["st1", "station_iqr"] == pytest.approx(
        np.percentile(st1, 75) - np.percentile(st1, 25)
    )


def test_parse_station_coordinates(spark, http_root):
    _, base = http_root
    stations = read_csv_urls(
        spark, [f"{base}/stations.csv"], STATION_SCHEMA
    )
    out = (
        parse_station_coordinates(stations)
        .toPandas()
        .set_index("id")
        .sort_index()
    )
    assert out.loc["st1", "longitude"] == pytest.approx(77.1)
    assert out.loc["st2", "latitude"] == pytest.approx(19.0)


def test_schema_mismatch_names_url(spark, http_root):
    """A 200 response carrying none of the declared columns must fail
    with the URL in the message, not an opaque pandas error."""
    root, base = http_root
    (root / "wrong.csv").write_text("a,b\n1,2\n")
    df = read_csv_urls(
        spark, [f"{base}/wrong.csv"], MEASUREMENT_SCHEMA, retries=0
    )
    with pytest.raises(Exception, match="wrong.csv"):
        df.collect()
