"""Regression (ADVICE r6): win_gap_fill must forward-fill THROUGH an
observed hour whose values are all NULL (n=0, sum NULL). The standard
fixtures carry no NULL values, so plain parity never exercises this path;
this test builds an adversarial events.parquet with such an hour and runs
the full Spark-vs-DuckDB parity on it."""

from __future__ import annotations

import os
import shutil

import pytest

from __spark_entry__ import oracle_sql, queries
from tests.conftest import SF_SMOKE
from tests.parity import compare, duck_connection


@pytest.fixture(scope="module")
def null_sf_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("nullhour_sf")
    import duckdb

    con = duckdb.connect()
    # user 1: value@h0, all-NULL@h2 (n=0, sum NULL), value@h5
    #   → h2's run must carry h0's sum forward, not NULL
    # user 2: leading all-NULL hour → ff stays NULL until first real value
    con.execute(f"""
        copy (
          select * from (values
            (1, timestamp '2024-01-01 00:10:00', 1, 'a', 10.0, '{{}}'),
            (2, timestamp '2024-01-01 02:20:00', 1, 'a', NULL, '{{}}'),
            (3, timestamp '2024-01-01 02:40:00', 1, 'a', NULL, '{{}}'),
            (4, timestamp '2024-01-01 05:30:00', 1, 'a', 7.5,  '{{}}'),
            (5, timestamp '2024-01-01 00:05:00', 2, 'b', NULL, '{{}}'),
            (6, timestamp '2024-01-01 03:15:00', 2, 'b', 3.25, '{{}}')
          ) t(event_id, ts, user_id, event_type, value, props)
        ) to '{d}/events.parquet' (format parquet)
    """)
    con.close()
    # parity harness registers every table as a view; link the rest
    for f in os.listdir(SF_SMOKE):
        if f.endswith(".parquet") and f != "events.parquet":
            os.symlink(os.path.join(SF_SMOKE, f), os.path.join(d, f))
    yield str(d)
    shutil.rmtree(d, ignore_errors=True)


def test_gap_fill_forward_fills_through_all_null_hour(spark, null_sf_dir):
    sdf = queries()["win_gap_fill"](spark, null_sf_dir)
    spark_pdf = sdf.toPandas()

    con = duck_connection(null_sf_dir)
    try:
        duck_pdf = con.execute(oracle_sql()["win_gap_fill"]).df()
    finally:
        con.close()
    errs = compare(spark_pdf, duck_pdf, "win_gap_fill[null-hour]")
    assert not errs, "\n".join(errs)

    # belt-and-braces on the exact semantics, independent of the oracle
    u1 = (spark_pdf[spark_pdf.user_id == 1]
          .sort_values("bucket").reset_index(drop=True))
    h = {int(r.bucket): r for r in u1.itertuples()}
    base = min(h)  # epoch of 2024-01-01 00:00
    assert h[base + 2 * 3600].n == 0          # observed, all-NULL hour
    assert h[base + 2 * 3600].sum_value_ff == 10.0   # carried from h0
    assert h[base + 3 * 3600].sum_value_ff == 10.0   # gap after it too
    u2 = spark_pdf[spark_pdf.user_id == 2].sort_values("bucket")
    assert u2.iloc[0].sum_value_ff != u2.iloc[0].sum_value_ff  # leading NaN
