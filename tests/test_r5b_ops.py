"""Independent ground-truth checks for the r5-B analytics operators.

The DuckDB oracles already give cross-ENGINE parity; these tests add a
third, cross-PARADIGM reference (pandas/numpy recomputation of the same
semantics) so an error shared by both SQL formulations can't hide.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from minerva_etl_46_spark.queries import QUERIES
from tests.conftest import SF_SMOKE


def _events_pdf():
    pdf = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    # mirror load()/normalize_ts_columns: everything to µs precision
    pdf["ts"] = pdf["ts"].astype("datetime64[us]")
    return pdf


def test_busy_hour_matches_pandas_argmax(spark):
    out = (
        QUERIES["agg_busy_hour"](spark, SF_SMOKE)
        .toPandas()
        .set_index(["user_id", "day_epoch"])
        .sort_index()
    )
    pdf = _events_pdf()
    epoch = pdf["ts"].astype("int64") // 1_000_000
    pdf["day_epoch"] = epoch // 86_400 * 86_400
    pdf["hour"] = epoch % 86_400 // 3600
    # the operator orders hours by the decimal(38,4)-snapped sum (dsum);
    # mirror the snap exactly (shortest-repr HALF_UP, like Spark's
    # double→decimal cast) so near-tie hours can't rank differently here
    from decimal import ROUND_HALF_UP, Decimal

    q = Decimal("0.0001")
    pdf["value"] = [
        Decimal(repr(v)).quantize(q, ROUND_HALF_UP) for v in pdf["value"]
    ]
    hourly = (
        pdf.groupby(["user_id", "day_epoch", "hour"])["value"]
        .sum()
        .astype(float)
        .reset_index()
    )
    # argmax with the operator's tie-break: max traffic, then earliest hour
    hourly = hourly.sort_values(
        ["user_id", "day_epoch", "value", "hour"],
        ascending=[True, True, False, True],
    )
    ref = hourly.groupby(["user_id", "day_epoch"]).first()
    assert len(out) == len(ref)
    assert (out["busy_hour"] == ref["hour"]).all()
    # traffic within double-vs-decimal snap tolerance
    assert np.allclose(out["traffic"], ref["value"], atol=1e-3)


def test_zscore_matches_pandas_rolling(spark):
    out = QUERIES["win_zscore"](spark, SF_SMOKE).toPandas()
    pdf = _events_pdf().sort_values(["user_id", "ts", "event_id"])

    def score(g):
        prev_mean = g["value"].rolling(20, min_periods=1).mean().shift(1)
        prev_std = g["value"].rolling(20, min_periods=2).std(ddof=1).shift(1)
        prev_n = (
            g["value"].rolling(20, min_periods=1).count().shift(1)
        )
        return pd.DataFrame(
            {
                "event_id": g["event_id"],
                "n_window": prev_n,
                "z": (g["value"] - prev_mean) / prev_std,
            }
        )

    ref = (
        pdf.groupby("user_id", group_keys=False)[["event_id", "value"]]
        .apply(score)
        .dropna()
    )
    # the operator's var > 0 filter drops zero-variance frames, where the
    # pandas ref yields ±inf (not NaN) — mirror that filter here
    ref = ref[np.isfinite(ref["z"])]
    ref = ref[ref["n_window"] >= 10].set_index("event_id")
    got = out.set_index("event_id").sort_index()
    ref = ref.sort_index()
    assert got.index.equals(ref.index)
    assert (got["n_window"] == ref["n_window"]).all()
    # decimal-snapped moments vs float64 rolling: agree to ~1e-6 relative
    assert np.allclose(got["zscore"], ref["z"], rtol=1e-5, atol=1e-6)


def test_regr_slope_matches_numpy_polyfit(spark):
    out = (
        QUERIES["agg_regr_slope"](spark, SF_SMOKE)
        .toPandas()
        .set_index("user_id")
        .sort_index()
    )
    pdf = _events_pdf()
    base = pd.Timestamp("2024-01-01").value // 1000  # µs
    pdf["x"] = (pdf["ts"].astype("int64") - base) // 1_000_000
    for user_id, g in pdf.groupby("user_id"):
        if len(g) < 2 or g["x"].nunique() < 2:
            assert user_id not in out.index
            continue
        slope, intercept = np.polyfit(
            g["x"].to_numpy(float), g["value"].to_numpy(float), 1
        )
        assert np.isclose(out.loc[user_id, "slope_per_sec"], slope,
                          rtol=1e-6, atol=1e-12)
        assert np.isclose(out.loc[user_id, "intercept"], intercept,
                          rtol=1e-6, atol=1e-6)


def test_bm25_matches_python_reference(spark):
    out = QUERIES["llm_bm25"](spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    toks = {r.doc_id: r.text.lower().split(" ") for r in docs.itertuples()}
    n_docs = len(toks)
    df_counts: dict[str, int] = {}
    for ts in toks.values():
        for t in set(ts):
            df_counts[t] = df_counts.get(t, 0) + 1
    qterms = sorted(df_counts, key=lambda t: (-df_counts[t], t))[:3]
    avgdl = sum(len(ts) for ts in toks.values()) / n_docs
    k1, b = 1.2, 0.75
    scores = {}
    for doc_id, ts in toks.items():
        dl = len(ts)
        s = 0.0
        for t in qterms:
            tf = ts.count(t)
            if tf:
                idf = (n_docs - df_counts[t] + 0.5) / (df_counts[t] + 0.5)
                s += idf * (tf * (k1 + 1)) / (
                    tf + k1 * (1 - b + b * dl / avgdl)
                )
        if s > 0:
            scores[doc_id] = s
    top = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert list(out["doc_id"]) == [doc_id for doc_id, _ in top]
    assert np.allclose(out["bm25"], [s for _, s in top], atol=1e-5)


def test_availability_bounds_and_exact_counts(spark):
    out = QUERIES["agg_availability"](spark, SF_SMOKE).toPandas()
    assert ((out["n_present"] >= 1) & (out["n_present"] <= 24)).all()
    assert np.allclose(out["avail_pct"], out["n_present"] / 24)
    pdf = _events_pdf()
    epoch = pdf["ts"].astype("int64") // 1_000_000
    pdf["day_epoch"] = epoch // 86_400 * 86_400
    pdf["hour_epoch"] = epoch // 3600 * 3600
    ref = (
        pdf.groupby(["user_id", "day_epoch"])["hour_epoch"]
        .nunique()
        .reset_index(name="n_present")
    )
    merged = out.merge(ref, on=["user_id", "day_epoch"], suffixes=("", "_ref"))
    assert len(merged) == len(out) == len(ref)
    assert (merged["n_present"] == merged["n_present_ref"]).all()


def test_domain_cap_is_a_hard_cap(spark):
    out = QUERIES["llm_domain_cap"](spark, SF_SMOKE).toPandas()
    sizes = out.groupby("domain").size()
    assert (sizes <= 20).all()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    docs["domain"] = docs["lang"] + ".example.com"
    # every domain with >= 20 docs is fully capped; smaller ones intact
    for domain, g in docs.groupby("domain"):
        expect = min(len(g), 20)
        assert sizes.get(domain, 0) == expect, domain
        # kept docs are exactly the top-n_chars (doc_id tie-break) subset
        ref_ids = set(
            g.sort_values(["n_chars", "doc_id"], ascending=[False, True])
            .head(expect)["doc_id"]
        )
        got_ids = set(out[out["domain"] == domain]["doc_id"])
        assert got_ids == ref_ids, domain


def test_containment_catches_doc_in_doc_that_jaccard_misses(spark):
    # the operator's purpose: a short doc embedded verbatim in a long one
    # must score ~1.0 on containment while Jaccard stays low
    from pyspark.sql import functions as F

    from minerva_etl_46_spark.operators.dedup import shingles

    short = " ".join(f"w{i}" for i in range(30))
    long_ = short + " " + " ".join(f"x{i}" for i in range(90))
    d = spark.createDataFrame(
        [(1, short), (2, long_)], schema="doc_id long, text string"
    )
    sh = d.select(
        "doc_id",
        F.explode(F.array_distinct(shingles("text", 3))).alias("sh"),
    )
    sizes = {r.doc_id: r.n for r in
             sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    inter = (
        sh.select(F.col("doc_id").alias("a"), "sh")
        .join(sh.select(F.col("doc_id").alias("b"), "sh"), "sh")
        .filter(F.col("a") < F.col("b"))
        .count()
    )
    containment = inter / min(sizes[1], sizes[2])
    jaccard = inter / (sizes[1] + sizes[2] - inter)
    assert containment == 1.0, (inter, sizes)
    assert jaccard < 0.35, jaccard
