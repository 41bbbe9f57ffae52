"""Blocked fuzzy string join (J12's reusable core; SURVEY.md §2.3).

Entity resolution — match possibly-corrupted external names against a
reference dimension — without an O(|probe|·|dim|) distance matrix.
Three stacked levers, each load-bearing at 100 TB:

1. **Distinct-name dedupe.** Edit distance depends only on the STRING,
   so both sides collapse to distinct names before any verify (the dim
   side keeps ``min(key)`` per name for deterministic tie-breaks).
   Verify work is vocabulary-sized, never corpus-row-sized.
2. **Compound block key** ``(prefix, length-band)``: equi-join on the
   first ``prefix_len`` chars plus ``floor(len / max_distance)``, probe
   side exploding bands ``{b-1, b, b+1}``. Because ``lev ≤ k`` implies
   ``|Δlen| ≤ k`` implies adjacent bands (width = k), the band axis is
   a NECESSARY condition of the final filter — it never changes the
   result, only bounds pair formation, and it keeps subdividing blocks
   as the vocabulary grows where prefix cardinality is constant.
3. **Threshold-bounded levenshtein** (Spark 3.5+ banded DP: O(len·k)
   per pair; returns −1 past the threshold, the exact distance
   otherwise).

Blocking contract (stated, not hidden): a candidate must share the
``prefix_len``-char prefix — a corruption INSIDE the prefix is a
blocking miss. ``block_suffix=True`` (r9) widens the contract to a
prefix∪suffix block UNION: a candidate must share the prefix OR the
last-``prefix_len``-chars suffix, so a corruption confined to one end
of the name is always caught (only a corruption touching BOTH ends
within ``max_distance`` edits can still miss). Cost: candidate pairs
roughly double in the worst case (each side blocks twice; pairs
sharing both ends are verified twice and collapse at the winner
window — measured 1.3× wall at a 1M-name end-entropic vocabulary
even with pairs exactly doubled, SCALE.md r9b: the verify is not the
dominant term). HAZARD the prefix side doesn't have: real name corpora often
carry LOW-ENTROPY TAILS (legal forms — "Inc.", "GmbH"; padded serial
suffixes), and a suffix key shared by a large fraction of the
vocabulary is a quadratic hot block (measured: a padded-tail
vocabulary at 20k names made the union 5.7× the prefix-only cost and
grows quadratically from there). The guard is ENFORCED in code (r10,
closing the r9 verdict's docstring-only gap): ``block_suffix=True``
runs one vocabulary-sized agg on the dim side at call time and raises
ValueError when any suffix key covers more than ``suffix_share_guard``
of the distinct names (and at least 100 of them — tiny vocabularies
can't go quadratic). Dim-side-only is sufficient: candidate pairs per
suffix block are ``hot_probe × hot_dim``, so a bounded dim block
bounds the product no matter how degenerate the probe side is. Opt
out with ``suffix_share_guard=None`` after an explicit
``skew_report`` audit (operators/profile.py) — the escape hatch is
deliberate, the default is safe.

Rank equivalence for lever 1: the per-probe best row under
``(distance, key)`` equals the best NAME under ``(distance, min key
within name)`` because within the minimum-distance set the row-minimum
key equals the per-name minimum. Winners re-attach to probe rows via a
vocabulary-sized broadcast join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def blocked_fuzzy_join(
    probes: DataFrame,
    dim: DataFrame,
    probe_name_col: str,
    dim_name_col: str,
    dim_key_col: str,
    max_distance: int = 2,
    prefix_len: int = 4,
    out_key_col: str | None = None,
    out_name_col: str | None = None,
    out_dist_col: str = "lev",
    block_suffix: bool = False,
    suffix_share_guard: float | None = 0.05,
) -> DataFrame:
    """Best fuzzy match per probe row.

    Returns every ``probes`` row that has a dimension name within
    ``max_distance`` edits (inner-join semantics), plus three columns:
    ``out_key_col`` (default ``dim_key_col``) — the matched key, the
    MINIMUM among dim rows sharing the winning name; ``out_name_col``
    (default ``dim_name_col``) — the matched name; and ``out_dist_col``
    (default ``lev``) — the exact distance, long. Winner per probe =
    minimum ``(distance, key, name)`` — the name term only matters
    when dim keys repeat, where two names can tie on (distance, key);
    it pins that edge deterministically. Candidates are restricted to names
    sharing the ``prefix_len``-char prefix (the blocking contract
    above); with ``block_suffix=True`` the restriction widens to
    prefix OR last-``prefix_len``-chars suffix, catching corruptions
    confined to the front of the name at ~2× candidate cost.
    The three output names must not collide with each other or
    with any ``probes`` column — when the defaults collide (e.g. both
    sides name their column ``name``), pass explicit ``out_*`` names;
    a collision raises ValueError instead of producing a frame with
    duplicate column names (which Spark rejects at write time or
    resolves ambiguously).

    ``dim`` may carry payload columns; they are ignored here — re-join
    them on the returned key. Work at scale: one hash-agg per side for
    the name dedupe, a vocab-sized compound-key equi-join for the
    verify, one broadcast back onto probe rows.
    """
    if max_distance < 1:
        raise ValueError("max_distance must be >= 1 (use an equi-join "
                         "for exact matching)")
    if prefix_len < 1:
        raise ValueError("prefix_len must be >= 1")
    k = int(max_distance)
    out_key = out_key_col or dim_key_col
    out_name = out_name_col or dim_name_col
    outs = [out_key, out_name, out_dist_col]
    if len(set(outs)) != 3:
        raise ValueError(f"output columns must be distinct, got {outs}")
    clash = [c for c in outs if c in probes.columns]
    if clash:
        raise ValueError(
            f"output column(s) {clash} collide with probe columns "
            f"{probes.columns}; pass out_key_col/out_name_col/"
            f"out_dist_col to rename them")
    if block_suffix and suffix_share_guard is not None:
        # Low-entropy-tail guard (module docstring HAZARD): one
        # vocabulary-sized agg, ONE row collected. A suffix key held by
        # > guard-share of the distinct dim names (and ≥100 of them) is
        # a quadratic hot block — refuse loudly instead of silently
        # planning hot² candidate pairs.
        hot, total = (
            dim.select(F.col(dim_name_col)).distinct()
            .groupBy(F.substring(dim_name_col, -prefix_len, prefix_len)
                     .alias("__sfx"))
            .count()
            .agg(F.max("count"), F.sum("count"))
            .first()
        )
        if total and hot >= 100 and hot / total > suffix_share_guard:
            raise ValueError(
                f"block_suffix=True on a low-entropy-tail vocabulary: one "
                f"{prefix_len}-char suffix key covers {hot}/{total} distinct "
                f"dim names ({hot / total:.1%} > guard "
                f"{suffix_share_guard:.1%}) — a quadratic hot block. Strip "
                f"the common tail (legal forms, padding) or raise "
                f"prefix_len; pass suffix_share_guard=None to override "
                f"after a skew_report audit")

    def blocks(name):
        # block keys per name: prefix always; with block_suffix also the
        # last-prefix_len-chars suffix, tagged so a prefix block never
        # equi-joins a suffix block (substring(-n, n) == Python s[-n:]
        # for every length incl. short/empty names — probed on this
        # Spark version). A pair sharing BOTH ends forms under both
        # tags; the duplicate carries identical (lev, key, name) values
        # and collapses at the winner window.
        pre = F.struct(F.lit("p").alias("side"),
                       F.substring(name, 1, prefix_len).alias("key"))
        if not block_suffix:
            return F.array(pre)
        suf = F.struct(F.lit("s").alias("side"),
                       F.substring(name, -prefix_len, prefix_len).alias("key"))
        return F.array(pre, suf)

    dnames = (
        dim.groupBy(dim_name_col)
        .agg(F.min(dim_key_col).alias("__pk_min"))
        .select(
            F.col(dim_name_col).alias("__d_name"), "__pk_min",
            F.explode(blocks(F.col(dim_name_col))).alias("__blk"),
            F.floor(F.length(dim_name_col) / k).alias("__band"),
        )
    )
    pnames = (
        probes.select(F.col(probe_name_col).alias("__p_name")).distinct()
        .withColumn("__blk", F.explode(blocks(F.col("__p_name"))))
        .withColumn("__b0", F.floor(F.length("__p_name") / k))
        .withColumn(
            "__band",
            F.explode(F.array(F.col("__b0") - 1, F.col("__b0"),
                              F.col("__b0") + 1)))
        .drop("__b0")
    )
    cand = (
        pnames.join(dnames, ["__blk", "__band"])
        .filter(F.abs(F.length("__p_name") - F.length("__d_name")) <= k)
        .withColumn("lev", F.levenshtein("__p_name", "__d_name", k))
        .filter(F.col("lev") >= 0)
    )
    # __d_name is the final tie-break: when dim keys are NOT unique,
    # two different names can tie on (lev, __pk_min) and row_number
    # alone would pick arbitrarily — the name key pins the winner so
    # the promised deterministic minimum-(distance, key) contract
    # holds for duplicate-key dims too.
    w = Window.partitionBy("__p_name").orderBy(
        F.col("lev").asc(), F.col("__pk_min").asc(),
        F.col("__d_name").asc())
    best = (
        cand.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            "__p_name",
            F.col("__pk_min").alias(out_key),
            F.col("__d_name").alias(out_name),
            F.col("lev").cast("long").alias(out_dist_col),
        )
    )
    return probes.join(
        F.broadcast(best),
        probes[probe_name_col] == best["__p_name"],
    ).drop("__p_name")
