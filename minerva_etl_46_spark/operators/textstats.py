"""Text analysis for training-data pipelines (SURVEY.md §2.11 X4 +
BASELINE-mandated: language-ID, quality scoring, token counting,
fingerprinting). All built-ins — regex/array ops stay in codegen; zero
Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# BPE-ish pre-tokenizer: letter runs | digit runs | single punctuation.
# The whitespace class is spelled EXPLICITLY, never \s: Java regex \s
# includes \x0B (vertical tab) while DuckDB's RE2 \s does not, so a \s in
# any oracle-mirrored pattern silently diverges the two engines on
# \x0B-bearing text (r11 review). Same chars as Java \s.
WS_CLASS = r"[ \t\n\x0B\f\r]"
TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9 \t\n\x0B\f\r]"

# tiny per-language stopword lists for the n-gram/stopword lang-ID heuristic
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in"),
    "fr": ("le", "la", "et", "un", "est"),
    "es": ("el", "los", "y", "que", "por"),
    "de": ("der", "die", "und", "das", "ist"),
    "zh": ("de", "shi", "le", "wo", "ni"),
}
LANG_ORDER = ("en", "fr", "es", "de", "zh")  # deterministic tie resolution


def ws_tokens(c: Column | str) -> Column:
    """Single-space tokenization — the ENGINE-WIDE convention every text
    key and oracle shares (~30 keys split on ' '). Irregular whitespace
    (runs, tabs, newlines) is owned UPSTREAM by normalization
    (llm_normalize / fingerprint's collapse): this engine, like the
    reference's ingest, tokenizes normalized text. Changing this to a
    \\s-class split would have to move ~30 oracles in lockstep — don't,
    normalize first."""
    col = F.col(c) if isinstance(c, str) else c
    return F.split(col, " ")


def _nullsafe_size(arr: Column, src: Column) -> Column:
    """size() under the engine's non-ANSI session returns -1 for a NULL
    array (spark.sql.legacy.sizeOfNull follows ansi=false); DuckDB's len()
    gives NULL — a silent −1-vs-NULL cross-engine split on NULL text
    (caught by the r11 adversarial-fixture parity tests)."""
    return (F.when(src.isNull(), F.lit(None)).otherwise(F.size(arr))
            .cast("long"))


def stopword_hits(c: Column | str, words: tuple[str, ...]) -> Column:
    """Count (with repeats) of tokens in the list, case-folded — without
    the fold, sentence-initial function words ('The', 'Le') never count
    and every stopword heuristic undercounts on real-cased prose (r11
    review). list_filter keeps multiplicity — array_intersect would dedup
    and diverge from the oracle."""
    col = F.col(c) if isinstance(c, str) else c
    return _nullsafe_size(
        F.filter(ws_tokens(c), lambda t: F.lower(t).isin(*words)), col)


def token_counts(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Whitespace + BPE-ish regex token counts, plus char length."""
    return df.select(
        F.col(id_col),
        _nullsafe_size(ws_tokens(text_col), F.col(text_col))
        .alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(TOKEN_RE)).cast("long").alias("re_tokens"),
        F.length(text_col).cast("long").alias("n_chars_calc"),
    )


def quality_score(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Length/stopword/token-shape quality heuristics. One deterministic
    arithmetic expression per row; the oracle mirrors the exact same parse
    tree so double evaluation is bit-identical."""
    n_tok = _nullsafe_size(ws_tokens(text_col), F.col(text_col))
    n_char = F.length(text_col).cast("long")
    stop_n = stopword_hits(text_col, STOPWORDS["en"])
    nospace = F.length(F.replace(F.col(text_col), F.lit(" "), F.lit("")))
    mean_tok_len = nospace / n_tok
    stop_ratio = stop_n / n_tok
    score = (0.3 * stop_ratio) + (0.1 * mean_tok_len)
    return df.select(
        F.col(id_col),
        n_tok.alias("n_tok"),
        stop_n.alias("stop_n"),
        stop_ratio.alias("stop_ratio"),
        mean_tok_len.alias("mean_tok_len"),
        score.alias("score"),
        (score > 0.45).alias("is_quality"),
    )


def lang_id(df: DataFrame, id_col: str, text_col: str, label_col: str | None = None) -> DataFrame:
    """Stopword-profile language ID. Deterministic argmax with fixed
    LANG_ORDER tie-breaking (first language wins ties)."""
    scores = {lg: stopword_hits(text_col, ws) for lg, ws in STOPWORDS.items()}
    # sequential CASE: branch i fires iff lang i beats-or-ties every LATER
    # lang (an earlier max would have taken its own branch first) — first
    # match wins ties deterministically, and the oracle mirrors the chain.
    pred = F.lit(LANG_ORDER[-1])
    for idx in range(len(LANG_ORDER) - 2, -1, -1):
        lg = LANG_ORDER[idx]
        cond = None
        for other in LANG_ORDER[idx + 1:]:
            c = scores[lg] >= scores[other]
            cond = c if cond is None else (cond & c)
        pred = F.when(cond, F.lit(lg)).otherwise(pred)
    # NULL text: every score is NULL, every CASE condition is NULL, and
    # the chain would fall through to the LAST language — a null doc got
    # a confident 'zh' label (r11 review). A null doc has no language.
    pred = F.when(F.col(text_col).isNull(), F.lit(None)).otherwise(pred)
    cols = [F.col(id_col)]
    cols += [scores[lg].alias(f"s_{lg}") for lg in LANG_ORDER]
    cols += [pred.alias("predicted_lang")]
    if label_col:
        cols += [(pred == F.col(label_col)).alias("matches_label")]
    return df.select(*cols)


def fingerprint(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token set of the normalized text (md5 ⇒ oracle-identical). Whitespace
    collapse uses the explicit WS_CLASS, not \\s — see TOKEN_RE's dialect
    note (Java \\s ∋ \\x0B, RE2 \\s ∌ \\x0B)."""
    toks = F.split(
        F.trim(F.regexp_replace(F.lower(F.col(text_col)),
                                WS_CLASS + "+", " ")), " ")
    canon = F.array_join(F.array_sort(F.array_distinct(toks)), " ")
    return df.select(F.col(id_col), F.md5(canon).alias("fingerprint"))


def repetition_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Repetition-ratio quality signal (boilerplate / degenerate-generation
    filter): per doc, 1 − distinct/total tokens plus the most-frequent
    token's share. Explode + two hash-aggs keyed by (doc, token) then doc —
    partial aggregation absorbs the per-doc fan-out map-side, so the
    shuffle carries one row per distinct (doc, token)."""
    # explode_outer, NOT explode: a NULL-text doc must surface as a row
    # with zero counts like every sibling stat, not vanish — plain explode
    # drops the doc entirely, and a downstream semi-join (the corpus
    # quality gate) then discards it silently attributed to the WRONG
    # filter (r11 review). The null marker row is excluded from every
    # count by the conditionals below; exchange count is unchanged.
    tok = df.select(
        F.col(id_col),
        F.explode_outer(F.split(F.lower(text_col), " ")).alias("tk"),
    )
    freq = tok.groupBy(id_col, "tk").agg(F.count(F.lit(1)).alias("c"))
    real = F.col("tk").isNotNull()
    return (
        freq.groupBy(id_col)
        .agg(
            F.sum(F.when(real, F.col("c")).otherwise(0)).alias("n_tok"),
            F.count(F.when(real, 1)).alias("n_distinct"),
            F.max(F.when(real, F.col("c"))).alias("top_n"),
        )
        .select(
            id_col,
            "n_tok", "n_distinct",
            (F.lit(1.0) - F.col("n_distinct")
             / F.nullif(F.col("n_tok"), F.lit(0))).alias("repetition"),
            (F.col("top_n")
             / F.nullif(F.col("n_tok"), F.lit(0))).alias("top_tok_ratio"),
        )
    )


def bpe_pair_counts(
    df: DataFrame, text_col: str, min_word_len: int = 2,
    eow_marker: str = "</w>",
) -> DataFrame:
    """BPE merge-pair counting (Sennrich et al. 2016, ACL — arXiv
    1508.07909), iteration 0 of tokenizer training: adjacent-symbol pair
    frequencies over the corpus with the end-of-word marker, the table whose
    argmax becomes the first merge rule.

    Scale shape — the whole point of the classic algorithm survives in
    Spark form: the corpus token stream collapses to a VOCAB-sized
    (word, freq) frame FIRST (one map-side-combinable hash-agg over the
    100 TB scan), and every pair is then generated in-row over distinct
    words only — |vocab| × avg_word_len rows, independent of corpus size.
    A naive per-token pair explode would shuffle the full token stream;
    this shuffles the vocabulary. All symbol work is sequence/transform/
    substring HOFs — zero Python in the row path, stays in codegen.

    Symbols at iteration 0 are single characters plus ``eow_marker`` after
    the final character (so "low" yields (l,o), (o,w), (w,</w>) — the
    marker is what lets BPE learn word-final units like "est</w>").
    Words shorter than ``min_word_len`` have no interior pair and only a
    degenerate (char, marker) pair; they are excluded, matching the usual
    practice of not merging across 1-char words.
    """
    return bpe_pairs_from_vocab(
        bpe_vocab(df, text_col, min_word_len), eow_marker)


def bpe_vocab(df: DataFrame, text_col: str,
              min_word_len: int = 2) -> DataFrame:
    """The corpus pass of BPE training: collapse the token stream to a
    (word, freq) vocabulary — ONE map-side-combinable hash-agg over the
    full scan. This is the only corpus-sized stage; everything after
    (pair counting, the merge loop) is vocab-bounded."""
    words = df.select(
        F.explode(F.split(F.lower(F.col(text_col)), " ")).alias("w")
    )
    return (
        words.filter(F.length("w") >= min_word_len)
        .groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    )


def bpe_pairs_from_vocab(vocab: DataFrame,
                         eow_marker: str = "</w>") -> DataFrame:
    """The vocab pass: adjacent char pairs per distinct word, weighted by
    word frequency — |vocab| × avg_word_len rows, independent of corpus
    size (probed: scale_probe.py r11b).

    One in-row pass builds interior pairs AND the word-final (char, </w>)
    pair (position L pairs the last char with the marker) — a single
    Generate over the vocab frame instead of a union of two branches
    re-reading the vocab exchange.
    The marker is spliced into a SQL string literal: Spark's parser
    treats BOTH backslash and quote as escapes there (escapedStringLiterals
    defaults false), so escape backslashes FIRST, then the quotes —
    quote-only escaping lets 'x\\' swallow the rest of the lambda (r11
    review)."""
    marker_sql = eow_marker.replace("\\", "\\\\").replace("'", "\\'")
    pair_arr = F.expr(
        "transform(sequence(1, length(w)), "
        "i -> struct(substring(w, i, 1) as s1, "
        "case when i < length(w) then substring(w, i + 1, 1) "
        f"else '{marker_sql}' end as s2))"
    )
    return (
        # guard: sequence(1, 0) auto-steps DESCENDING in Spark, so an
        # empty-string word (reachable with min_word_len=0 or a hand-built
        # vocab) would emit two bogus ('', marker) pairs instead of none —
        # and bpe_train's iteration-0 table gives ZERO pairs for '', so
        # the documented Spark↔driver argmax cross-check would break
        # (r11 review)
        vocab.filter(F.length("w") >= 1)
        .select(F.explode(pair_arr).alias("p"), "freq")
        .select("p.s1", "p.s2", "freq")
        .groupBy("s1", "s2")
        .agg(F.sum("freq").alias("pair_count"))
    )


def bpe_train(vocab: dict[str, int], n_merges: int,
              eow_marker: str = "</w>") -> list[tuple[str, str]]:
    """The BPE merge loop (Sennrich 2016, algorithm 1), driver-side over
    the collected (word, freq) vocabulary. This split is the 100 TB
    shape of BPE training: the corpus is touched exactly ONCE (the
    bpe_vocab Spark pass collapses the token stream to the vocabulary,
    map-side-combinable), and every merge iteration after that is
    O(|vocab| × avg_word_len) pure-python work — vocab-bounded,
    corpus-size-independent (probed: scale_probe.py r11b). Real
    tokenizer trainers (subword-nmt, HuggingFace) use the same
    word-counts-then-local-loop structure.

    Iteration 0's pair table is exactly what the llm_bpe_pairs driver
    key computes in Spark (pinned by tests/test_r11_ops.py); ties in
    the argmax break deterministically to the lexicographically
    smallest pair, matching that key's (count desc, s1 asc, s2 asc)
    rank order."""
    from collections import Counter

    seq = {w: (*w, eow_marker) for w in vocab}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        counts: Counter = Counter()
        for w, freq in vocab.items():
            s = seq[w]
            for pair in zip(s, s[1:]):
                counts[pair] += freq
        if not counts:
            break
        mx = max(counts.values())
        best = min(p for p, c in counts.items() if c == mx)
        merges.append(best)
        merged = best[0] + best[1]
        for w, s in seq.items():
            if best[0] not in s:
                continue
            out = []
            i = 0
            while i < len(s):
                if i + 1 < len(s) and (s[i], s[i + 1]) == best:
                    out.append(merged)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            seq[w] = tuple(out)
    return merges


#: wire separator for the array↔string round-trip in bpe merge
#: application: tokens render as SEP t SEP concatenated (``\x01 a \x01
#: \x01 b \x01``), so one merge is ONE literal replace of
#: ``SEP a SEP SEP b SEP`` → ``SEP ab SEP`` — matches are disjoint by
#: construction (no shared boundary chars), which makes global
#: left-to-right replace EXACTLY the BPE non-overlapping merge rule in
#: both engines. Words containing the separator are excluded from the
#: tokenize vocab (the representation would not be injective).
BPE_SEP = "\x01"


def bpe_apply_merge(seg: Column, s1: Column, s2: Column) -> Column:
    """Apply ONE merge rule (s1, s2) → s1s2 to a segmentation array —
    pure JVM string ops (join / literal replace / split / filter), no
    Python, no regex. The oracle replays the identical composition with
    DuckDB's array_to_string / replace / string_split / list_filter."""
    sep = F.lit(BPE_SEP)
    joined = F.concat(sep, F.array_join(seg, BPE_SEP + BPE_SEP), sep)
    replaced = F.replace(
        joined,
        F.concat(sep, s1, F.lit(BPE_SEP + BPE_SEP), s2, sep),
        F.concat(sep, s1, s2, sep),
    )
    return F.filter(F.split(replaced, BPE_SEP), lambda t: t != "")


def bpe_tokenize_vocab(vocab: DataFrame, n_merges: int,
                       eow_marker: str = "</w>") -> DataFrame:
    """The APPLY half of tokenizer training, fully distributed: learn
    ``n_merges`` merge rules from the vocabulary and return the
    segmented vocab frame (w, freq, seg array<string>).

    Scale shape (the bpe_train split, now closed end-to-end in Spark):
    the corpus was already collapsed to the vocab by bpe_vocab's ONE
    map-side-combinable pass; every iteration here is vocab-bounded —
    a pair hash-agg, a 1-ROW argmax frame broadcast back over the vocab
    (crossJoin of a limit-1 frame, never a driver collect), and one
    in-row merge application. Iteration count, not data volume, is the
    cost knob — the graph_pagerank unrolling discipline. Ties in the
    argmax break to (count desc, s1 asc, s2 asc), bpe_train's exact
    rule (UTF-8 binary order == codepoint order, engine-identical)."""
    seg0 = F.expr(
        "transform(sequence(1, length(w)), i -> substring(w, i, 1))"
    )
    # marker appended via F.lit — a Column, never a spliced SQL literal,
    # so no escaping concern (contrast bpe_pairs_from_vocab's note)
    seg = vocab.select(
        "w", "freq",
        F.concat(seg0, F.array(F.lit(eow_marker))).alias("seg"),
    )
    # size-1 guard: sequence(1, 0) auto-steps DESCENDING in Spark (the
    # bpe_pairs_from_vocab gotcha), so a fully-merged single-token word
    # would hit element_at(seg, 0) and kill the stage — it has no pairs
    pair_expr = F.expr(
        "case when size(seg) > 1 then "
        "transform(sequence(1, size(seg) - 1), "
        "i -> struct(element_at(seg, i) as s1, "
        "element_at(seg, i + 1) as s2)) "
        "else array() end"
    )
    for _ in range(n_merges):
        pairs = (
            seg.select(F.explode(pair_expr).alias("p"), "freq")
            .groupBy("p.s1", "p.s2")
            .agg(F.sum("freq").alias("cnt"))
        )
        # argmax as a GLOBAL AGG, not orderBy().limit(1): the agg always
        # yields exactly one row, so an iteration with zero pairs (every
        # word already a single token) degrades to a no-op sentinel
        # merge (SEP, SEP) — which cannot match any wire string — where
        # a limit-1 frame would be EMPTY and the crossJoin would wipe
        # the vocab (bpe_train just stops iterating; same net state).
        # min of the struct (-cnt, s1, s2) IS the (cnt desc, s1, s2)
        # argmax with bpe_train's exact tie-break.
        m = pairs.agg(
            F.min(F.struct(
                (-F.col("cnt")).alias("nc"), F.col("s1"), F.col("s2")
            )).alias("m"))
        best = m.select(
            F.coalesce(F.col("m.s1"), F.lit(BPE_SEP)).alias("s1"),
            F.coalesce(F.col("m.s2"), F.lit(BPE_SEP)).alias("s2"),
        )
        seg = (
            seg.crossJoin(F.broadcast(best))
            .select(
                "w", "freq",
                bpe_apply_merge(F.col("seg"), F.col("s1"), F.col("s2"))
                .alias("seg"),
            )
            # lineage cut per iteration (the pagerank_ppb discipline):
            # seg is consumed TWICE next round (pair counts + merge
            # application), so an uncut plan re-derives every earlier
            # iteration multiplicatively — 47 exchanges at n_merges=4
            # vs the per-iteration constant after the cut
            .localCheckpoint(eager=False)
        )
    return seg


def bpe_segment(word: str, merges: list[tuple[str, str]],
                eow_marker: str = "</w>") -> list[str]:
    """Segment one word with learned merge rules, applying them in
    training order (the standard BPE inference rule — merge priority is
    training order, not greedy length)."""
    s: list[str] = [*word.lower(), eow_marker]
    for a, b in merges:
        i, out = 0, []
        while i < len(s):
            if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(s[i])
                i += 1
        s = out
    return s


def winnow_select(
    df: DataFrame, id_col: str, text_col: str, k: int = 4, w: int = 5,
) -> DataFrame:
    """Winnowing fingerprint selection (Schleimer/Wilkerson/Aiken, SIGMOD
    2003 — the MOSS algorithm): hash every k-word shingle, slide a window
    of w consecutive hashes, keep each window's minimum (rightmost wins
    ties), dedup selected positions. Guarantees a match of length w+k-1
    tokens between two docs always shares a fingerprint, at ~2/(w+1)
    selection density — the published local fingerprinting scheme for
    plagiarism / near-dup detection at corpus scale.

    Plan shape: shingle explode → per-shingle window-membership explode
    (constant w× fan-out, linear) → ONE hash-agg per (doc, window) taking
    ``min_by(pos, sortkey)`` → distinct positions. All JVM-side; the
    shingle hash is md5 (oracle-identical in DuckDB) and the sort key
    appends an 8-digit inverted position so lexicographic min =
    (min hash, max pos) — the paper's rightmost tie-break, deterministic
    across engines. Returns (doc, n_sh, sel_pos, h): one row per selected
    fingerprint, carrying its shingle hash for cross-doc matching.
    """
    toks = F.split(F.col(text_col), " ")
    n_sh = F.greatest(F.lit(0), F.size(toks) - F.lit(k - 1))
    base = df.select(
        F.col(id_col).alias("doc"), toks.alias("tk"), n_sh.alias("n_sh")
    ).filter(F.col("n_sh") > 0)
    # shingle positions 0..n_sh-1 with md5 hash of the k-token join
    sh = base.select(
        "doc", "n_sh",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(1), F.col("n_sh")),
                lambda i: F.md5(F.array_join(F.slice(F.col("tk"), i, k), " ")),
            )
        ).alias("pos", "h"),
    )
    # windows are runs of w consecutive shingles starting at s in
    # [0, max(0, n_sh - w)]; shingle pos belongs to s in
    # [max(0, pos-w+1), min(pos, max(0, n_sh-w))] — upper >= lower always
    # (pos <= last_start + w - 1 by construction), so F.sequence never
    # flips into its descending mode. Docs shorter than one full window
    # form a single clamped window (>=1 fingerprint per non-empty doc).
    last_start = F.greatest(F.lit(0), F.col("n_sh") - F.lit(w))
    member = sh.select(
        "doc", "n_sh", "pos", "h",
        F.explode(
            F.sequence(
                F.greatest(F.lit(0), F.col("pos") - F.lit(w - 1)),
                F.least(F.col("pos"), last_start),
            )
        ).alias("win_start"),
    )
    # rightmost-min per window: lexicographic min of the PACKED key
    # (32-hex-char h ‖ 8-digit inverted pos). One plain min(string)
    # replaces two min_by's + a first — still SortAggregate (min over a
    # var-length string buffer can't hash-agg) but with a single cheap
    # buffer and map-side partial_min, the measured cost drops 3.0 → 1.0 s
    # min-of-2 at sf0.1; pos/h unpack from the winning key.
    packed = F.concat(
        F.col("h"),
        F.lpad((F.lit(99999999) - F.col("pos")).cast("string"), 8, "0"),
    )
    won = (
        member.groupBy("doc", "win_start")
        .agg(
            F.min(packed).alias("key"),
            F.max("n_sh").alias("n_sh"),
        )
    )
    return (
        won.select(
            "doc", "n_sh",
            (F.lit(99999999) - F.substring("key", 33, 8).cast("int"))
            .alias("sel_pos"),
            F.substring("key", 1, 32).alias("h"),
        )
        .distinct()
    )


def winnow_fingerprints(
    df: DataFrame, id_col: str, text_col: str, k: int = 4, w: int = 5,
) -> DataFrame:
    """Per-doc winnowing summary over :func:`winnow_select`:
    (id, n_shingles, n_fingerprints, density ≈ 2/(w+1))."""
    selected = winnow_select(df, id_col, text_col, k=k, w=w)
    return (
        selected.groupBy("doc")
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.max("n_sh").alias("n_sh"),  # constant per doc; max is the
            # order-insensitive way to say "any" (bare first() is banned)
        )
        .select(
            F.col("doc").alias(id_col),
            F.col("n_sh").alias("n_shingles"),
            "n_fingerprints",
            (F.col("n_fingerprints") / F.col("n_sh")).alias("density"),
        )
    )
