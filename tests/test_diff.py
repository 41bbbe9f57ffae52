"""keyed_diff unit semantics: I/U/D classification, null-safe value
compare, and null-KEY rows (equi-join semantics: null keys never match —
they must surface as D + I, never as a phantom match or a misclassified
row; regression for the presence-flag fix, ADVICE r4)."""

from __future__ import annotations

from minerva_etl_46_spark.operators.diff import keyed_diff


def _rows(df):
    return sorted(
        (tuple(r) for r in df.collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )


def test_keyed_diff_classifies_iud(spark):
    old = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", None)],
        schema="id long, name string, v double",
    )
    new = spark.createDataFrame(
        [(2, "b", 25.0), (3, "c", None), (4, "d", 40.0)],
        schema="id long, name string, v double",
    )
    got = keyed_diff(old, new, keys=["id"], compare_cols=["name", "v"])
    by_op = {}
    for r in got.collect():
        by_op.setdefault(r["op"], []).append(r)
    assert [r["id"] for r in by_op["D"]] == [1]
    assert [r["id"] for r in by_op["I"]] == [4]
    assert [r["id"] for r in by_op["U"]] == [2]
    # null == null is "unchanged" (null-safe compare): id=3 absent
    assert {r["id"] for rs in by_op.values() for r in rs} == {1, 2, 4}


def test_keyed_diff_null_keys_report_delete_and_insert(spark):
    old = spark.createDataFrame(
        [(None, "x", 1.0), (1, "a", 10.0)], schema="id long, name string, v double"
    )
    new = spark.createDataFrame(
        [(None, "y", 2.0), (1, "a", 10.0)], schema="id long, name string, v double"
    )
    got = keyed_diff(old, new, keys=["id"], compare_cols=["name", "v"])
    rows = {(r["op"], r["id"], r["old_name"], r["new_name"]) for r in got.collect()}
    # the two null-keyed rows never equi-match: one D with the old values,
    # one I with the new values — and NOT a U, nor a row with both sides
    assert rows == {("D", None, "x", None), ("I", None, None, "y")}


def test_keyed_diff_multi_key_null_in_first_key(spark):
    # null in keys[0] while keys[1] matches: still unmatched (SQL equi-join)
    old = spark.createDataFrame([(None, 7, 1.0)], schema="a long, b long, v double")
    new = spark.createDataFrame([(None, 7, 1.0)], schema="a long, b long, v double")
    got = keyed_diff(old, new, keys=["a", "b"], compare_cols=["v"])
    assert sorted(r["op"] for r in got.collect()) == ["D", "I"]
