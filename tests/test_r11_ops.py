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

import pytest

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


# ---------------------------------------------------------------------------
# bpe_train / bpe_segment — the driver-side merge loop (examples/train_bpe.py
# composes it with the bpe_vocab Spark pass)
# ---------------------------------------------------------------------------

from minerva_etl_46_spark.operators.textstats import (  # noqa: E402
    bpe_pair_counts,
    bpe_segment,
    bpe_train,
)


def test_bpe_train_matches_sennrich_canonical_example():
    # the worked example from Sennrich 2016 §3.2: low×5 lower×2 newest×6
    # widest×3 — the first merges are es, est, est</w>, lo, low
    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(vocab, 5)
    assert merges == [("e", "s"), ("es", "t"), ("est", "</w>"),
                      ("l", "o"), ("lo", "w")]


def test_bpe_segment_applies_merges_in_training_order():
    vocab = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train(vocab, 10)
    assert bpe_segment("lowest", merges) == ["low", "est</w>"]
    # unseen word: only the merges that apply fire, rest stays chars
    assert bpe_segment("news", merges)[-1].endswith("</w>")


def test_bpe_train_iteration0_matches_spark_pair_table(spark):
    """The merge loop's first argmax == the distributed llm_bpe_pairs
    top-ranked pair under the same (count desc, pair asc) tie rule — the
    contract examples/train_bpe.py asserts on the real fixture, pinned
    here on a controlled corpus with a deliberate count TIE."""
    docs = ["low low lower", "newest widest", "low newest"]
    df = spark.createDataFrame([(t,) for t in docs], "text string")
    rows = bpe_pair_counts(df, "text").collect()
    mx = max(r.pair_count for r in rows)
    spark_argmax = min((r.s1, r.s2) for r in rows if r.pair_count == mx)
    vocab: dict[str, int] = {}
    for t in docs:
        for w in t.split(" "):
            vocab[w] = vocab.get(w, 0) + 1
    assert bpe_train(vocab, 1)[0] == spark_argmax


def test_bpe_train_stops_when_vocab_exhausted():
    # a 2-char word fully merges in 2 steps; further merges must stop
    merges = bpe_train({"ab": 3}, 10)
    assert merges == [("a", "b"), ("ab", "</w>")]
    # after full merge each word is ONE symbol — no pairs remain... but a
    # single-symbol sequence still pairs with nothing: loop must break
    assert bpe_segment("ab", merges) == ["ab</w>"]


# ---------------------------------------------------------------------------
# adversarial-fixture parity: the driver's documents fixture is perfectly
# clean (no NULLs, uppercase, or irregular whitespace — verified r11), so
# the oracle gate never exercises the text-stat keys on hostile text. This
# fixture does: NULL text, empty text, uppercase stopwords, runs of spaces,
# tabs/newlines/vertical tab (the Java-\s vs RE2-\s dialect split), and a
# doc that is ONLY whitespace. Every key below must still match its DuckDB
# oracle value-for-value.
# ---------------------------------------------------------------------------

_NASTY_DOCS = [
    (0, "the quick brown fox", "en", "web", 19),
    (1, None, "en", "web", 0),                          # NULL text
    (2, "", "en", "web", 0),                            # empty text
    (3, "The And OF tHe the", "en", "web", 18),         # cased stopwords
    (4, "a  b   c", "en", "web", 8),                    # space runs
    (5, "tab\there newline\nhere vtab\x0bhere", "en", "web", 30),
    (6, "   ", "en", "web", 3),                         # whitespace-only
    (7, "le la et un est", "fr", "web", 15),
    (8, "x", "zz", "web", 1),                           # 1-char doc
    # r12b: NULL lang / NULL source — the metadata axes every mix/shard/
    # stratify key groups by had never been NULL
    (9, "the common words here", None, "web", 21),      # NULL lang
    (10, "more common words here", "en", None, 22),     # NULL source
    (11, "words", None, None, 5),                       # both NULL
]


@pytest.fixture(scope="module")
def nasty_dir(spark, tmp_path_factory):
    import glob
    import os
    import shutil

    d = str(tmp_path_factory.mktemp("nasty"))
    staged = f"{d}/_staged"
    spark.createDataFrame(
        _NASTY_DOCS,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.mode("overwrite").parquet(staged)
    # single FILE like the real fixtures (DuckDB reads the same path)
    (part,) = glob.glob(f"{staged}/part-*.parquet")
    os.rename(part, f"{d}/documents.parquet")
    shutil.rmtree(staged)
    return d


#: every registered key whose inputs are exactly {documents} — pinned
#: explicitly (60 keys as of r11) so coverage loss is loud. The full
#: family swept clean after the r11 fixes: null-safe token counts
#: (_ws_count: size(null) = -1 skewed sums), explicit whitespace classes
#: (Java-\s vs RE2-\s on \x0B) in exact-dedup/overlap normalization,
#: null-text exclusions where a null doc has no bucket/position/pack/
#: content-hash (len_buckets, positional_template, pack, bloom), and the
#: mm_extract null-payload feature row (a null blob no longer kills the
#: decode job).
_NASTY_KEYS = (
    "llm_tokens", "llm_quality", "llm_lang_id", "llm_fingerprint",
    "llm_repetition", "llm_bpe_pairs", "llm_bpe_tokenize",
    "llm_bloom_prefilter", "llm_bm25", "llm_boilerplate", "llm_cdc_chunk",
    "llm_chunk", "llm_chunk_dedup", "llm_code_detect", "llm_collocations",
    "llm_concat", "llm_containment", "llm_dataset_card",
    "llm_decontaminate", "llm_dedup_exact", "llm_dedup_groups",
    "llm_dedup_incremental", "llm_dedup_near", "llm_dedup_url",
    "llm_domain_cap", "llm_domain_match", "llm_dupe_stats",
    "llm_edit_distance", "llm_hot_ngrams", "llm_keywords", "llm_lang_mix",
    "llm_len_buckets", "llm_minhash_est", "llm_mix_weights",
    "llm_ngram_jaccard", "llm_ngram_lm", "llm_normalize", "llm_novelty",
    "llm_overlap", "llm_pack", "llm_positional_template", "llm_postings",
    "llm_readability", "llm_redact", "llm_sample_stratified", "llm_shard",
    "llm_simhash", "llm_split", "llm_stopword_profile", "llm_surprisal",
    "llm_text_stats", "llm_tfidf", "llm_url_parse", "llm_vocab",
    "llm_winnow", "llm_zipf",
    "mm_extract", "mm_frames", "mm_meta", "mm_phash_neardup",
    "mm_tile_grid",
)


@pytest.mark.parametrize("key", _NASTY_KEYS)
def test_text_keys_match_oracle_on_adversarial_text(key, spark, nasty_dir):
    import duckdb

    import __spark_entry__ as E
    from tests.parity import compare

    con = duckdb.connect()
    con.execute("create view documents as select * from "
                f"read_parquet('{nasty_dir}/documents.parquet')")
    sp = E.queries()[key](spark, nasty_dir).toPandas()
    du = con.execute(E.oracle_sql()[key]).df()
    errs = compare(sp, du, key)
    assert not errs, "\n".join(errs)


def test_lang_id_null_text_has_no_language(spark, nasty_dir):
    import __spark_entry__ as E

    rows = {r["doc_id"]: r for r in
            E.queries()["llm_lang_id"](spark, nasty_dir).collect()}
    assert rows[1]["predicted_lang"] is None      # NULL text: no language
    assert rows[3]["predicted_lang"] == "en"      # cased stopwords fold
    assert rows[3]["s_en"] == 5                   # The And OF tHe the all fold
    assert rows[7]["predicted_lang"] == "fr"


def test_repetition_keeps_null_text_docs(spark, nasty_dir):
    import __spark_entry__ as E

    out = {r["doc_id"]: r for r in
           E.queries()["llm_repetition"](spark, nasty_dir).collect()}
    assert set(out) == {d[0] for d in _NASTY_DOCS}  # one row per doc
    assert out[1]["n_tok"] == 0 and out[1]["repetition"] is None
