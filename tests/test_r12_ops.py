"""Round-12 operator gates: distributed BPE tokenization
(llm_bpe_tokenize — the APPLY half that closes llm_bpe_pairs' training
loop in Spark) pinned three ways:

1. full DuckDB-oracle parity on a hostile documents fixture (NULL/empty/
   whitespace-only text, cased words, a word containing the \\x01 wire
   separator, regex-special characters that must stay inert under the
   literal-replace merge application);
2. a hypothesis property: the Spark segmentation equals the driver-side
   bpe_train + bpe_segment reference for every word in the vocabulary,
   across random vocabularies and merge counts — including the
   zero-pairs degenerate round where the argmax degrades to the no-op
   sentinel instead of wiping the vocab;
3. unit pins of bpe_apply_merge's left-to-right non-overlapping rule on
   the classic adversarial shapes ('a a a', 'b c b c').
"""

from __future__ import annotations

import glob
import os
import shutil

import duckdb
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

_NASTY_BPE_DOCS = [
    (0, "the quick brown fox", "en", "web", 19),
    (1, None, "en", "web", 0),                          # NULL text
    (2, "", "en", "web", 0),                            # empty text
    (3, "ab ab ab cd", "en", "web", 11),                # heavy pair runs
    (4, "aaa aaaa", "en", "web", 8),                    # overlap shapes
    (5, "a|b a%b a=b <w> </w>", "en", "web", 20),       # wire/regex chars
    (6, "sep\x01inside normal", "en", "web", 18),       # \x01 word: excluded
    (7, "   ", "en", "web", 3),                         # whitespace-only
    (8, "The THE the tHe", "en", "web", 15),            # case folding
]


@pytest.fixture(scope="module")
def nasty_bpe_dir(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("nasty_bpe"))
    staged = f"{d}/_staged"
    spark.createDataFrame(
        _NASTY_BPE_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(staged)
    (part,) = glob.glob(f"{staged}/part-*.parquet")
    os.rename(part, f"{d}/documents.parquet")
    shutil.rmtree(staged)
    return d


def test_bpe_tokenize_matches_oracle_on_adversarial_text(
        spark, nasty_bpe_dir):
    import __spark_entry__ as E
    from tests.parity import compare

    con = duckdb.connect()
    con.execute("create view documents as select * from "
                f"read_parquet('{nasty_bpe_dir}/documents.parquet')")
    sp = E.queries()["llm_bpe_tokenize"](spark, nasty_bpe_dir).toPandas()
    du = con.execute(E.oracle_sql()["llm_bpe_tokenize"]).df()
    errs = compare(sp, du, "llm_bpe_tokenize")
    assert not errs, "\n".join(errs)


def test_bpe_tokenize_excludes_separator_words(spark, nasty_bpe_dir):
    """The \\x01-bearing word is excluded from the vocab (the wire format
    is not injective for it), so no output token contains \\x01 and the
    word's other-doc neighbours are unaffected."""
    import __spark_entry__ as E

    toks = {r["tok"] for r in
            E.queries()["llm_bpe_tokenize"](spark, nasty_bpe_dir).collect()}
    assert not any("\x01" in t for t in toks)
    # the same doc's clean word still tokenizes
    assert any(t.startswith("n") for t in toks)  # from 'normal'


# ---------------------------------------------------------------------------
# property: Spark segmentation == driver-side bpe_train/bpe_segment replay
# ---------------------------------------------------------------------------

_word = st.text(alphabet="ab<|%/\\>x", min_size=1, max_size=6)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(
    vocab=st.dictionaries(_word, st.integers(1, 9), min_size=1, max_size=8),
    n_merges=st.integers(0, 6),
)
def test_bpe_tokenize_vocab_matches_reference(spark, vocab, n_merges):
    from minerva_etl_46_spark.operators.textstats import (
        bpe_segment,
        bpe_tokenize_vocab,
        bpe_train,
    )

    df = spark.createDataFrame(list(vocab.items()), "w string, freq long")
    got = {r.w: list(r.seg)
           for r in bpe_tokenize_vocab(df, n_merges).collect()}
    merges = bpe_train(vocab, n_merges)
    for w in vocab:
        assert got[w] == bpe_segment(w, merges), (w, merges)


def test_bpe_apply_merge_is_left_to_right_non_overlapping(spark):
    import pyspark.sql.functions as F

    from minerva_etl_46_spark.operators.textstats import bpe_apply_merge

    rows = [
        (["a", "a", "a"], "a", "a", ["aa", "a"]),
        (["b", "c", "b", "c"], "b", "c", ["bc", "bc"]),
        (["x", "a", "b", "a", "b"], "a", "b", ["x", "ab", "ab"]),
        (["ab", "c"], "b", "c", ["ab", "c"]),       # no cross-token match
        (["a"], "a", "a", ["a"]),                   # single token: no-op
    ]
    df = spark.createDataFrame(
        [(seg, a, b, want) for seg, a, b, want in rows],
        "seg array<string>, a string, b string, want array<string>")
    out = df.select(
        bpe_apply_merge(F.col("seg"), F.col("a"), F.col("b")).alias("got"),
        "want").collect()
    for r in out:
        assert list(r.got) == list(r.want)


def test_bpe_tokenize_survives_zero_pair_rounds(spark):
    """More merges than pairs: once every word is a single token, extra
    rounds are no-ops (the sentinel-argmax contract) — the vocab must
    NOT vanish the way a crossJoin against an empty limit-1 frame
    would."""
    from minerva_etl_46_spark.operators.textstats import bpe_tokenize_vocab

    df = spark.createDataFrame([("ab", 3)], "w string, freq long")
    seg = {r.w: list(r.seg) for r in bpe_tokenize_vocab(df, 8).collect()}
    assert seg == {"ab": ["ab</w>"]}


# ---------------------------------------------------------------------------
# kv percent-escape convention (r12): escape/unescape is an exact inverse
# ---------------------------------------------------------------------------

@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(vals=st.lists(
    st.text(alphabet="ab%|=\\x 25C7D3", min_size=0, max_size=12),
    min_size=1, max_size=6))
def test_kv_escape_roundtrips_exactly(spark, vals):
    import pyspark.sql.functions as F

    from minerva_etl_46_spark.sources.harvest import kv_escape, kv_unescape

    df = spark.createDataFrame([(v,) for v in vals], "v string")
    out = df.select(
        "v", kv_unescape(kv_escape(F.col("v"))).alias("rt"),
        kv_escape(F.col("v")).alias("esc")).collect()
    for r in out:
        assert r.rt == r.v, (r.v, r.esc, r.rt)
        # structural chars never survive escaping — the wire invariant
        assert "|" not in r.esc and "=" not in r.esc


# ---------------------------------------------------------------------------
# CSV NULL-token collision (r12c): a value literally equal to \N is
# UNREPRESENTABLE — the writer emits it and NULL as identical bytes
# (probed; quoteAll mode included) — so the export fails loudly instead
# of silently corrupting the value to NULL on re-read.
# ---------------------------------------------------------------------------

def test_csv_export_refuses_the_literal_null_token(spark, tmp_path):
    import pyspark.sql.functions as F  # noqa: F401

    from minerva_etl_46_spark.queries import _csv_token_guard

    df = spark.createDataFrame(
        [(1, "ok"), (2, "\\N"), (3, None)], "k int, s string")
    guarded = _csv_token_guard(df, ["s"])
    with pytest.raises(Exception, match="NULL token"):
        guarded.collect()
    # clean frames pass through unchanged
    clean = spark.createDataFrame(
        [(1, "ok"), (2, "back\\slash"), (3, None)], "k int, s string")
    assert _csv_token_guard(clean, ["s"]).count() == 3


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(vals=st.lists(
    st.one_of(
        st.none(),
        st.text(alphabet='ab,"\\% =|é日 x', min_size=0, max_size=12)
        .filter(lambda s: s != "\\N"),
    ),
    min_size=1, max_size=6))
def test_csv_cell_roundtrips_through_the_real_reader(spark, vals):
    """_csv_cell (the scan_csv_gzip renderer) must round-trip ANY
    representable value — NULL, '', commas, quotes, backslashes,
    unicode, padding — through Spark's actual CSV reader under the
    scan_csv contract options. The two unrepresentable classes (the
    literal \\N token, raw newlines) raise and are excluded here."""
    from minerva_etl_46_spark.queries import _csv_cell

    lines = [f"{i},{_csv_cell(v)}" for i, v in enumerate(vals)]
    rdd = spark.sparkContext.parallelize(["k,s"] + lines, 1)
    back = (spark.read.option("header", True).option("nullValue", "\\N")
            .schema("k int, s string").csv(rdd))
    got = {r.k: r.s for r in back.collect()}
    assert got == dict(enumerate(vals)), (vals, lines, got)


def test_csv_cell_refuses_unrepresentable_values():
    from minerva_etl_46_spark.queries import _csv_cell

    for bad in ("\\N", "has\nnewline", "has\rcr"):
        with pytest.raises(ValueError):
            _csv_cell(bad)


# ---------------------------------------------------------------------------
# harvest malformed-line discipline (r12c): the docstrings promise
# "missing keys surface as NULL rather than shifting columns" — pin it
# ---------------------------------------------------------------------------

def test_kv_harvest_malformed_lines_yield_nulls_not_shifts(spark, tmp_path):
    from minerva_etl_46_spark.sources.harvest import read_kv_harvest

    p = str(tmp_path / "kv")
    lines = [
        "a=1|b=x|c=2",          # clean
        "b=y",                  # missing keys -> NULL a, NULL c
        "",                     # empty line -> all NULL
        "garbage with spaces",  # no separators -> all NULL values
        "a=7|a=8|c=3",          # duplicate key: engine-deterministic
        "a=|b=|c=",             # present-but-empty: '' not NULL
    ]
    spark.createDataFrame([(ln,) for ln in lines], "value string") \
        .coalesce(1).write.mode("overwrite").text(p)
    out = read_kv_harvest(
        spark, p, fields={"a": "int", "b": "string", "c": "int"})
    rows = {(r.a, r.b, r.c) for r in out.collect()}
    assert (1, "x", 2) in rows
    assert (None, "y", None) in rows
    # neither malformed line shifted anything into a typed column
    assert (None, None, None) in rows
    # present-but-empty b stays '' (cast to string), ints cast '' -> NULL
    assert (None, "", None) in rows
    # duplicate keys take LAST-WINS (the read_kv_harvest contract —
    # str_to_map would THROW here and abort the whole load, r12c)
    assert (8, None, 3) in rows
    assert len(rows) >= 5


def test_fixed_width_short_lines_yield_null_tail_not_shift(spark, tmp_path):
    from minerva_etl_46_spark.sources.harvest import read_fixed_width_harvest

    p = str(tmp_path / "fw")
    lines = [
        "7     name      3   ",   # full record (6/10/4 layout)
        "8     only",              # short: name partial, tail missing
        "9",                       # id only
        "",                        # empty line
    ]
    spark.createDataFrame([(ln,) for ln in lines], "value string") \
        .coalesce(1).write.mode("overwrite").text(p)
    out = read_fixed_width_harvest(
        spark, p, fields=[("id", 6, "bigint"), ("name", 10, "string"),
                          ("n", 4, "int")])
    rows = {(r.id, r.name, r.n) for r in out.collect()}
    assert (7, "name", 3) in rows
    assert (8, "only", None) in rows      # tail NULL, no shift
    assert (9, None, None) in rows
    assert (None, None, None) in rows
