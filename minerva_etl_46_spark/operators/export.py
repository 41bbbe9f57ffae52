"""Training-data export verbs (SURVEY.md §2.11 extension): deterministic
sharding and sequence packing — the last mile between a cleaned corpus and
a training job.

- shard assignment is content-id-keyed md5 (the llm_split convention):
  reproducible across engines, runs and cluster sizes; never row position,
  never random(). Shards are the unit of training-file output AND the
  packing boundary, so everything downstream is re-runnable.
- sequence packing (greedy, in doc_id order within a shard) is the one op
  here Spark genuinely lacks: bin assignment is sequential state. It runs
  as applyInPandas per shard — state is bounded by one shard's docs, the
  shuffle key is the shard id, and the output is per-bin aggregates.
  DuckDB reproduces it with a recursive CTE (see queries.llm_pack), so the
  op stays inside the full-oracle gate despite being non-window SQL.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def id_hash(id_col: Column | str) -> Column:
    """First 8 md5 hex digits of the id as a long — the deterministic
    basis for split/shard assignment (same expression as llm_split)."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 8), 16, 10).cast("long")


def shard_assign(df: DataFrame, id_col: str, n_shards: int = 16) -> DataFrame:
    """Adds a `shard` column: md5-deterministic 0..n_shards-1."""
    return df.withColumn("shard", id_hash(id_col) % n_shards)


def shard_stats(docs: DataFrame, id_col: str, text_col: str,
                n_shards: int = 16) -> DataFrame:
    """Per-shard balance stats for a training export: doc count, token and
    char totals. One hash-agg over n_shards keys — the skew check a
    100 TB export runs before writing files."""
    return (
        shard_assign(docs, id_col, n_shards)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            # null-safe: size(split(NULL)) is -1 under the non-ANSI
            # session and silently skews the sum (r11 adversarial-docs);
            # a null-text doc still counts as a doc, contributes 0 tokens
            F.sum(F.when(F.col(text_col).isNull(), F.lit(None))
                  .otherwise(F.size(F.split(F.col(text_col), " "))))
            .alias("total_tokens"),
            F.sum(F.length(text_col)).alias("total_chars"),
        )
    )


def greedy_bins(token_counts: list[int], max_tokens: int) -> list[int]:
    """The greedy walk itself, pure and property-testable
    (tests/test_export.py): bin i+1 opens when adding the next doc would
    exceed ``max_tokens``; the first doc always lands in bin 0, and an
    oversized doc occupies a bin alone. Mirrored 1:1 by the recursive-CTE
    oracle in queries.llm_pack."""
    bins: list[int] = []
    b, fill, first = 0, 0, True
    for t in token_counts:
        if first:
            fill, first = t, False
        elif fill + t > max_tokens:
            b, fill = b + 1, t
        else:
            fill += t
        bins.append(b)
    return bins


def pack_sequences(docs: DataFrame, id_col: str, text_col: str,
                   n_shards: int = 8, max_tokens: int = 512) -> DataFrame:
    """Greedy sequence packing: within each shard, walk docs in id order
    and open a new bin whenever the running token count would exceed
    ``max_tokens`` (an oversized doc still gets its own bin). Output is
    per-bin: (shard, bin, n_docs, total_tokens).

    Scale shape: ONE shuffle on the shard key, then per-shard sequential
    state inside applyInPandas (Arrow-batched; state = one shard's doc
    list). n_shards is the parallelism knob — a 100 TB export uses
    thousands of shards, keeping every group executor-sized. Greedy
    first-fit-in-order is the standard trainer-side packing contract:
    deterministic given (id order, token counts), no global coordination.
    """
    # NULL text carries nothing to pack — and size(split(NULL)) is NULL,
    # which arrives as NaN in the Arrow frame and crashes int() inside
    # the worker (r10 review: one null doc killed the whole packing job
    # AFTER shard_stats happily passed it). Dropping is the contract:
    # quality filtering owns null handling upstream; the packer only
    # guarantees it cannot be killed by one.
    with_tok = shard_assign(
        docs.filter(F.col(text_col).isNotNull()), id_col, n_shards,
    ).select(
        F.col(id_col).alias("doc_id"), "shard",
        F.size(F.split(F.col(text_col), " ")).alias("tokens"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        pdf = pdf.assign(bin=greedy_bins(
            [int(t) for t in pdf["tokens"]], max_tokens))
        out = (
            pdf.groupby(["shard", "bin"], as_index=False)
            .agg(n_docs=("doc_id", "size"), total_tokens=("tokens", "sum"))
        )
        return out.astype({"shard": "int64", "bin": "int64",
                           "n_docs": "int64", "total_tokens": "int64"})

    return with_tok.groupBy("shard").applyInPandas(
        pack, schema="shard long, bin long, n_docs long, total_tokens long"
    )
