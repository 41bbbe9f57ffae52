"""Train a BPE tokenizer from the `documents` table, end to end.

The 100 TB shape (SURVEY §2.11 X49): the corpus is scanned exactly ONCE —
a map-side-combinable Spark hash-agg collapses the token stream to the
(word, freq) vocabulary — and the merge loop then runs vocab-local on the
driver (Sennrich 2016, algorithm 1; subword-nmt / HuggingFace trainers use
the same word-counts-then-local-loop split). Iteration 0's pair table is
what the `llm_bpe_pairs` driver key computes distributed; this script
cross-checks the first learned merge against that key's top-ranked pair.

Usage: python examples/train_bpe.py [sf_dir] [n_merges]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from minerva_etl_46_spark.operators.textstats import (
    bpe_pair_counts,
    bpe_segment,
    bpe_train,
    bpe_vocab,
)
from minerva_etl_46_spark.session import get_spark

#: refuse to collect an unbounded vocabulary: at web scale, prune the
#: low-frequency tail in Spark first (freq >= k drops hapaxes, which BPE
#: merges never benefit from meaningfully at the head of the merge table)
MAX_VOCAB = 5_000_000


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    n_merges = int(sys.argv[2]) if len(sys.argv) > 2 else 20
    spark = get_spark(app_name="train-bpe", cpus=8, shuffle_partitions=8)

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    vocab_df = bpe_vocab(docs, "text")
    n_vocab = vocab_df.count()
    if n_vocab > MAX_VOCAB:
        raise SystemExit(
            f"vocabulary has {n_vocab} entries (> {MAX_VOCAB}); prune the "
            "low-frequency tail first: bpe_vocab(...).filter('freq >= 2')")
    # bounded-by: the distinct-word vocabulary (counted above), never the
    # corpus — the one collect in the pipeline, same boundedness class as
    # the reference's trend-definition catalogs
    vocab = {r["w"]: r["freq"] for r in vocab_df.collect()}
    print(f"corpus pass done: {n_vocab} vocabulary entries")

    merges = bpe_train(vocab, n_merges)
    print(f"learned {len(merges)} merges; first 10: {merges[:10]}")

    # cross-check: the distributed iteration-0 pair table's argmax must be
    # the first learned merge (same tie rule: count desc, pair asc)
    top = (bpe_pair_counts(docs, "text")
           .orderBy(["pair_count", "s1", "s2"], ascending=[False, True, True])
           .limit(1).collect()[0])
    assert (top["s1"], top["s2"]) == merges[0], (top, merges[0])
    print(f"distributed iteration-0 argmax matches: {merges[0]} "
          f"(count {top['pair_count']})")

    for w in list(vocab)[:5]:
        print(f"  segment({w!r}) -> {bpe_segment(w, merges)}")
    spark.stop()


if __name__ == "__main__":
    main()
