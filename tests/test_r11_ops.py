"""Round-11 operator tests: llm_bpe_pairs (X49, the one registry addition
sanctioned by the r10 verdict — BPE merge-pair counting, tokenizer-training
iteration 0).

Coverage:
- hypothesis property: bpe_pair_counts replayed word-for-word against a
  pure-python Sennrich pair counter (collections.Counter over
  chars + </w>) — pins the formula, not just cross-engine SQL parity
  (the DuckDB oracle in queries.py provides that).
- unit semantics: end-of-word marker pairing, min_word_len exclusion,
  single-char words carrying no pair, quote-bearing custom markers
  (the marker is spliced into a SQL string — injection guard).
- driver-sim parity for the registered key is covered by the standing
  test_oracle_parity.py sweep (auto-includes every registered key).

Small example counts — each example is a Spark job.
"""

from __future__ import annotations

from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from minerva_etl_46_spark.operators.textstats import bpe_pair_counts

SLOW = settings(
    max_examples=8, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


def _model_pairs(docs: list[str], min_word_len: int = 2,
                 eow: str = "</w>") -> Counter:
    """Pure-python Sennrich count_pairs over char symbols + </w>."""
    out: Counter = Counter()
    for text in docs:
        for w in text.lower().split(" "):
            if len(w) < min_word_len:
                continue
            syms = list(w) + [eow]
            for a, b in zip(syms, syms[1:]):
                out[(a, b)] += 1
    return out


def _spark_pairs(spark, docs: list[str], **kw) -> Counter:
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    rows = bpe_pair_counts(df, "text", **kw).collect()
    return Counter({(r.s1, r.s2): r.pair_count for r in rows})


# words over a tiny alphabet → heavy pair collisions across words, plus
# 1-char words (excluded) and empty-string artifacts from split.
_word = st.text(alphabet="abc", min_size=1, max_size=6)
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)
_docs = st.lists(_doc, min_size=1, max_size=6)


@SLOW
@given(docs=_docs)
def test_bpe_pairs_match_python_model(spark, docs):
    assert _spark_pairs(spark, docs) == _model_pairs(docs)


def test_bpe_eow_marker_and_min_len(spark):
    # "low" twice, "a" (len 1 → excluded), "go" once
    got = _spark_pairs(spark, ["low a low", "go"])
    assert got == Counter({
        ("l", "o"): 2, ("o", "w"): 2, ("w", "</w>"): 2,
        ("g", "o"): 1, ("o", "</w>"): 1,
    })


def test_bpe_min_word_len_one_keeps_single_chars(spark):
    # at min_word_len=1 a 1-char word contributes exactly its (c, </w>) pair
    got = _spark_pairs(spark, ["a bb"], min_word_len=1)
    assert got == Counter({
        ("a", "</w>"): 1, ("b", "b"): 1, ("b", "</w>"): 1,
    })


def test_bpe_custom_marker_escaping(spark):
    # marker is spliced into a SQL string literal where BOTH quote and
    # backslash are parser escapes — each shape must come through verbatim
    # (r11 review: quote-only escaping corrupted 'x\y' and a trailing
    # backslash swallowed the rest of the lambda)
    for marker in ("x'y", "x\\y", "x\\", "\\'", "a"):
        got = _spark_pairs(spark, ["ab"], eow_marker=marker)
        assert got == Counter({("a", "b"): 1, ("b", marker): 1}), marker


def test_bpe_uppercase_folds_and_empty_tokens_ignored(spark):
    # double space yields an empty split token; len 0 < min_word_len
    got = _spark_pairs(spark, ["AB  ab"])
    assert got == Counter({("a", "b"): 2, ("b", "</w>"): 2})
