"""Invariants of the driver-facing coverage rotation.

The external correctness driver verifies a ~50-query prefix of the dict
``__spark_entry__.queries()`` returns. ``sample_order`` must guarantee:

1. The registry itself is never mutated — catalog iteration order stays
   hermetic registration order (ADVICE r5: no import-time reordering
   keyed on result artifacts).
2. Every query NOT green in the latest CORRECTNESS_r*.json is promoted
   into the next prefix (so no query escapes verification for two
   consecutive rounds, and regressions re-enter the sample immediately).
3. The output is a permutation: same names, no loss, no duplication, and
   queries()/oracle_sql() stay key-aligned.
"""

from __future__ import annotations

import importlib

import __spark_entry__ as entry


def test_registry_order_is_hermetic():
    from pm25ml_spark.plans import registry

    registry.load_all_plans()
    first = list(registry.QUERIES)
    # re-import the plan modules; registration order must not depend on
    # repo-root artifacts or prior loads
    registry.load_all_plans()
    assert list(registry.QUERIES) == first
    assert set(registry.ORACLES) <= set(registry.QUERIES)


def test_sample_order_is_permutation():
    q = entry.queries()
    from pm25ml_spark.plans import registry

    assert set(q) == set(registry.QUERIES)
    assert len(q) == len(registry.QUERIES)
    o = entry.oracle_sql()
    order = list(q)
    assert list(o) == [n for n in order if n in o]


def test_not_green_promoted_to_prefix(tmp_path, monkeypatch):
    """Synthetic latest-round file: red + absent names must lead."""
    import json

    names = [f"q{i:02d}" for i in range(72)]
    latest = {n: {"hash_match": True, "rows_match": True} for n in names[:50]}
    latest["q07"] = {"hash_match": False, "rows_match": True}  # regression
    latest["q09"] = {"hash_match": None, "rows_match": False}  # rows-only red
    (tmp_path / "CORRECTNESS_r09.json").write_text(json.dumps(latest))
    # an older round must be ignored in favor of r09
    (tmp_path / "CORRECTNESS_r03.json").write_text(json.dumps({}))

    monkeypatch.setattr(entry, "__file__", str(tmp_path / "e.py"))
    out = entry.sample_order(names)
    due = set(names[50:]) | {"q07", "q09"}
    assert set(out[: len(due)]) == due
    assert sorted(out) == sorted(names)
    # rotation of the green remainder is round-dependent but deterministic
    assert entry.sample_order(names) == out


def test_no_correctness_files_keeps_registration_order(tmp_path, monkeypatch):
    monkeypatch.setattr(entry, "__file__", str(tmp_path / "e.py"))
    names = ["a", "b", "c"]
    assert entry.sample_order(names) == names


def test_rotation_module_reimport_stable():
    importlib.reload(entry)
    q1 = list(entry.queries())
    q2 = list(entry.queries())
    assert q1 == q2
