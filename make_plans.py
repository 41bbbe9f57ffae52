#!/usr/bin/env python
"""Regenerate PLANS.md: executed (AQE-final) physical plans of the headline
operators with the scale property each must keep. Run after plan-shape
changes; diff review of PLANS.md is the perf-regression signal."""

from __future__ import annotations

from minerva_etl_46_spark.queries import QUERIES
from minerva_etl_46_spark.session import get_spark

SF = "/root/testdata/sf0.01"

NOTES = {
    "agg_time": "ONE exchange (the groupBy's own); partial HashAggregate "
                "before it — map-side combine at any scale.",
    "filter_ts_range": "Range bounds pushed as raw-long PushedFilters → "
                       "parquet row-group pruning.",
    "join_dim": "Both dimension joins are BroadcastHashJoin — zero shuffle "
                "of the fact side.",
    "topk_per_group": "WindowGroupLimit before the sort: per-partition "
                      "streaming top-k, never a full per-group sort.",
    "join_range": "SortMergeJoin on (user_id, time-bucket): the bucket key "
                  "bounds per-task pair counts under hot keys.",
    "join_asof": "Union-tag as-of: one exchange per side into a single "
                 "window sort — no range cross-product.",
    "upsert_latest": "Single window exchange; production bounds it per "
                     "touched partition (trendstore.upsert).",
    "agg_approx": "Sketch aggregation (HLL++ + GK quantiles) is ONE pass "
                  "with map-side partials; the invariant machinery only "
                  "touches 5-row frames (broadcast) plus one rank pass.",
    "llm_dedup_near": "Candidate generation is an equi-join on "
                      "(band_id, band_hash) — no cross product; exact "
                      "Jaccard touches only candidates.",
    "llm_sim_ivf": "Sample-fit centroids ride as numpy closures into two "
                   "vectorized projections (assign / probe-cells); the "
                   "probe side BROADCASTS into the cell_id equi-join — "
                   "the corpus is never shuffled, broadcast or "
                   "cross-joined.",
    "llm_decontaminate": "Benchmark gram set is the distinct-projected "
                         "small side; the corpus gram explode is narrow "
                         "and the per-doc count collapses map-side "
                         "(partial HashAggregate) before its exchange.",
    "llm_pack": "ONE exchange on the shard key feeding applyInPandas; "
                "per-group state is one shard's docs — n_shards is the "
                "parallelism/skew knob at 100 TB.",
    "win_gap_fill": "r6 rewrite (win_interp's probe lesson): TWO "
                    "exchanges, zero joins, zero window sorts — the "
                    "collect_list+HOF segment walk; the old grid join "
                    "planned 4 exchanges + an output-sized SMJ at 20M.",
    "llm_sample_stratified": "WindowGroupLimit before the sort: streaming "
                             "per-stratum top-k on the md5 rank, never a "
                             "full per-stratum sort.",
    "agg_bitmap_distinct": "Exact distinct with NO Expand operator: two "
                           "hash-aggs (bitmap partials then bitmap_count "
                           "sum), both with map-side partial aggregation.",
    "join_interval": "Interval×interval overlap as ONE (key, bucket) "
                     "equi-join; bucket-ownership filter dedups in the "
                     "join filter — no Distinct/second exchange.",
    "join_salted": "The (key, salt) equi-join: probe side scatters, build "
                   "side replicates — per-task rows capped at "
                   "hot-share/n_salt.",
    "llm_dedup_incremental": "Batch-bounded: batch band rows probe stored "
                             "corpus signatures; the verify's shingle "
                             "explode is semi-join-restricted to "
                             "candidate docs only.",
    "diff_keyed": "ONE full-outer key join (inherent — both snapshots "
                  "must meet); null-safe compare in the filter, "
                  "change-sized output, no second pass.",
    "trigger_notify": "Every rule fuses into the ONE KPI-rollup scan "
                      "(filter+project per rule, union on top) — no "
                      "per-rule re-read of the source.",
    "llm_dedup_embed": "The banded production path (r5): SRP band buckets "
                       "equi-join on (band_id, band_hash) — the pair "
                       "cross-product never materializes; exact decimal "
                       "cosine scores candidates only.",
    "agg_time_dst": "Same ONE-exchange rollup as agg_time_local; the µs "
                    "shift is a narrow projection folded into the scan — "
                    "DST handling adds no operator.",
    "agg_availability": "ONE logical hash-agg with distinct-on-bucket "
                        "(partial_merge expansion) — no join, no window; "
                        "linear in rows at any scale.",
    "agg_busy_hour": "Decimal-exact hourly rollup, then WindowGroupLimit "
                     "before the rank sort: each partition forwards only "
                     "its per-(entity,day) top row.",
    "win_zscore": "ONE window exchange+sort; both decimal frame-sums and "
                  "the count share the same frame — single Window "
                  "operator, O(21)-row frame state.",
    "agg_regr_slope": "All four moment sums in ONE hash-agg with map-side "
                      "partials; slope/intercept are post-agg projections "
                      "over |entities| rows.",
    "llm_domain_cap": "WindowGroupLimit under the rank filter: at most K "
                      "rows per domain cross the exchange, output "
                      "domains×K-bounded.",
    "llm_bm25": "Two token hash-aggs (dl, df); the 3-term tf join and the "
                "1-row corpus stats are BroadcastHashJoins; final top-20 "
                "is TakeOrderedAndProject — no global sort or window.",
    "llm_containment": "Same shuffle shape as the Jaccard ground truth: "
                       "shingle explode → equi-join on the shingle → one "
                       "hash-agg; fan-out bounded by shared-shingle "
                       "frequency, never corpus².",
    "win_share": "One hash-agg (hourly rollup) + one window exchange on "
                 "the bucket key; the denominator is a decimal window "
                 "sum over already-snapped doubles.",
    "mm_phash_neardup": "Arrow-batched hash stage, then the 6-band "
                        "equi-join — candidates only on an exact band "
                        "match, exact bit_count(xor) verify; the media "
                        "cross-product never materializes.",
    "set_intersect": "Per-side partial+final hash-agg distinct, then AQE "
                     "broadcasts the smaller post-agg side — the big side "
                     "shuffles at most once.",
    "agg_cube": "All four grouping sets in ONE Expand + hash-agg pass "
                "(4× map-side fan-out collapses in the partial agg) — "
                "never k separate scans.",
    "agg_percentile": "ONE exchange on the group key; exact quantiles "
                      "sort inside the agg buffer per group — the "
                      "documented trade vs agg_approx's sketch.",
    "join_scd2": "SCD2 probe rides the as-of union-tag plan: dim "
                 "compression (window) + ONE shuffle-sort over "
                 "facts∪versions — no interval cross-product, no "
                 "end-bound filter needed (periods tile time).",
    "llm_winnow": "Shingle explode → constant w× window-membership "
                  "explode → ONE min(packed h‖inv-pos) SortAggregate "
                  "with map-side partial_min (string buffers can't "
                  "hash-agg; one min vs 2×min_by+first cut 3.0→1.0 s "
                  "min-of-2) → distinct — linear with constant 5, no "
                  "join, no window-function sort.",
    "scan_orc": "The ORC scan carries ReadSchema pruning exactly like "
                "parquet (same DSv2 path); the rollup is the standard "
                "partial+final hash-agg pair.",
    "scan_avro": "ZERO exchanges: binaryFile FileScan (one task per "
                 ".avro file — the format is not splittable) feeding "
                 "MapInPandas running the pure-Python OCF decoder; no "
                 "projection pushdown EXISTS for row-major avro, so "
                 "the plan's job is purely per-file parallelism and "
                 "the convert-to-parquet first pass (SCALE.md r9c: "
                 "5.6× decode toll paid once).",
    "win_funnel": "ONE exchange total: collect_list hash-agg per user, "
                  "array_sort + the F.aggregate HOF walk are "
                  "projections — no self-joins, no N stage passes "
                  "(the oracle's 3-CTE formulation would be 3 joins).",
    "agg_time_weighted": "One window sort (lead) and one hash-agg on "
                         "the SAME entity key — the agg reuses the "
                         "window's partitioning, no second exchange.",
    "llm_novelty": "TWO exchanges total (r6; was 4): one gram-keyed "
                   "repartition of the exploded shingles feeds the "
                   "(gram, doc) dedup groupBy (no exchange — subset "
                   "partitioning rule) AND the per-gram window min "
                   "(sort-only); only the final per-doc agg shuffles "
                   "again. 7.4 → 2.4 s warm at sf0.1.",
    "win_interp": "Same grid-explode as win_gap_fill; BOTH fill passes "
                  "(forward + backward-via-descending-window) partition "
                  "on user_id — one exchange feeding two window sorts; "
                  "no self-join, no driver loop.",
    "agg_ohlc": "SortAggregate (struct min/max can't hash-agg) but the "
                "partial agg still runs MAP-SIDE — the exchange carries "
                "one row per (entity, hour), never raw events; contrast "
                "a row_number window, which would shuffle every event.",
    "llm_dedup_url": "Canonicalization is pure regexp codegen in the "
                     "scan projection; ONE hash-agg on the canonical "
                     "key (+ the count-distinct expand for n_raw_forms) "
                     "— the cheapest member of the dedup family.",
    "agg_hist_quantile": "Raw rows touched ONCE (daily-histogram "
                         "hash-agg with map-side partials); the weekly "
                         "re-roll + cumulative window run on the "
                         "(type, week, bin) vocabulary frame — the "
                         "mergeable-partial re-rollup shape.",
    "agg_heavy_hitters_cms": "Sketch build: ONE hash-agg over the "
                             "seed-exploded scan, map-side partials "
                             "shrink to \u22641024 rows pre-exchange; "
                             "probe join broadcasts the grid.",
    "upsert_tombstone": "Same single keep-latest window exchange as "
                        "upsert_latest; the tombstone filter is a "
                        "post-window projection — no second pass.",
    "win_dod_change": "One rollup hash-agg; the day-shift compare is a "
                      "SELF EQUI-JOIN on (entity, bucket-86400) — both "
                      "sides reuse the rollup's partitioning, no "
                      "window/grid machinery.",
    "llm_chunk_dedup": "Chunk spans from one cumsum window; ONE join "
                       "back to docs (row per chunk) for the hash; "
                       "cross-doc matching is a chunk-hash frequency "
                       "hash-agg — never doc×doc.",
    "win_ewma": "ONE exchange (collect_list hash-agg); sort + the "
                "EWMA recursion are per-row projections over the "
                "array — no window sort, no self-join.",
    "join_nearest": "Two union-tag as-of passes (backward, and forward "
                    "on the negated axis) — 2 window sorts on the "
                    "entity key, then element-wise pick; no range "
                    "cross-product anywhere.",
    "win_outlier_mad": "ONE exchange: both medians are whole-partition "
                       "window percentiles over the same entity key — "
                       "no joins (the agg+join-back form shuffled facts "
                       "3×; 25.6→7.8 s at 20M events).",
    "agg_retention": "Distinct → per-user min → unhinted join back "
                     "(AQE broadcasts the entity-sized cohort frame "
                     "while it fits) → one count-distinct agg.",
    "trigger_cooldown": "Sessionization (gaps-and-islands) over the "
                        "already-tiny notification frame: one window + "
                        "one hash-agg downstream of the fused trigger "
                        "scan.",
    "win_seasonal_baseline": "ONE exchange on the (entity, hour-of-week) "
                             "cell key; the exact median sorts per cell "
                             "inside the window buffer.",
    "win_cusum": "ONE exchange (collect_list + percentile share the "
                 "entity hash-agg); the CUSUM recursion is a per-row "
                 "projection over the sorted array.",
    "agg_gini": "Two chained hash-aggs — the second runs on the "
                "(entity, type) vocabulary frame; pure integer "
                "arithmetic until the final divide.",
    "llm_domain_match": "Corpus side: one distinct + one hash-agg; the "
                        "500-row profile (parameter-bounded) is the "
                        "only broadcast — TakeOrdered builds it, no "
                        "global sort.",
    "join_bucketed": "At fixture scale AQE (rightly) broadcasts the small orders side — both scans still show `Bucketed: true`, and the one Exchange is the downstream rollup's own (o_orderpriority, a different key). The zero-Exchange bucketed SMJ — the shape this table pair plans when both sides outgrow the broadcast threshold — is plan-ASSERTED with broadcast disqualified in tests/test_bucketed.py; bucketing never forces a worse plan than AQE would pick.",
    "llm_surprisal": "Deliberately tf JOIN freq, NOT window-attach: "
                     "unigram stopwords are catastrophic window hot "
                     "keys (one task walks the whole 'the' stream); "
                     "the join AQE can skew-split, and every exchange "
                     "carries the tf frame, never raw tokens. Corpus "
                     "total is a broadcast 1-row frame.",
    "win_autocorr": "ONE exchange: lag() window hash-partitions on "
                    "entity and the Pearson-sums groupBy reuses that "
                    "partitioning; five exact-decimal sums then "
                    "element-wise IEEE math.",
    "win_streak": "repartition(user) ONCE; day-distinct, row_number, "
                  "run agg and best-pick all reuse hash(user) — a "
                  "single exchange end to end (anchor keys extend the "
                  "clustering, never re-shuffle).",
    "fn_ip_cidr": "Projection-only: parse/classify fused into ONE "
                  "WholeStageCodegen span over the scan — zero "
                  "exchanges, zero doubles.",
    "join_spatial": "Grid-bucketed spatial join: sites replicate to 9 "
                    "cells and broadcast; candidates via the cell-id "
                    "equi-join + integer distance² verify — the "
                    "all-pairs distance matrix never plans; ONE "
                    "exchange (the per-point agg's own).",
    "win_holt": "ONE collect_list exchange; the coupled level/trend "
                "recursion is an in-row F.aggregate struct walk — no "
                "per-step joins, no N passes.",
    "scan_partitioned": "The day bound is a PartitionFilter — file "
                        "listing prunes to ONE day=N directory before "
                        "any I/O; the only exchange is the hourly "
                        "rollup's own.",
    "llm_postings": "The rn<=8 rank filter rewrites to "
                    "WindowGroupLimit: each map task forwards at most "
                    "k rows per token into the shuffle — a stopword's "
                    "postings candidates are k×partitions, not its "
                    "full document list.",
    "upsert_scd2_build": "Explicit repartition(entity) up front: "
                         "hash(entity) satisfies the (entity, ts) tie "
                         "window, the suppression window AND the lead "
                         "window — ONE exchange end to end; raw events "
                         "ship once.",
    "win_bollinger": "Two exchanges, neither raw-sized: the hourly "
                     "rollup's exchange carries map-side-combined "
                     "partials; the band window re-keys only the "
                     "(entity, hour) frame. Exact decimal Σv/Σv² in "
                     "the O(25) frame, element-wise IEEE bands after.",
    "agg_skyline": "Distinct-point hash-agg + running-max window — "
                   "the O(n²) dominance self-join never plans; the "
                   "window exchange carries only distinct (size, "
                   "price) points per group.",
    "llm_tfidf": "tf⋈df JOIN shape (the surprisal argument: stopword "
                 "hot keys skew-split by AQE, window-attach cannot); "
                 "WindowGroupLimit caps the per-doc rank before the "
                 "sort materializes; corpus size is a broadcast "
                 "1-row frame.",
    "llm_collocations": "Bigrams from an IN-ROW slice+zip_with — the "
                        "positional token self-join never plans; "
                        "exchanges carry bigram/unigram agg frames "
                        "only; top-200 is a WindowGroupLimit-capped "
                        "global rank on the c_ab>=5 filtered frame.",
    "llm_bpe_pairs": "Token stream collapses to the VOCAB (one "
                     "map-side-combinable hash-agg over the scan) "
                     "BEFORE any pair work; the pair Generate runs "
                     "over distinct words only — both exchanges are "
                     "vocab-sized, corpus-size-independent; top-200 "
                     "is TakeOrderedAndProject, scan reads only text.",
    "agg_survival": "Per-entity span hash-agg is the ONLY data-sized "
                    "exchange; duration-table frames (bounded by "
                    "retention days) flow through the ordered KM fold "
                    "— the single-partition window is deliberately "
                    "bounded, never entity-sized.",
    "agg_corr_pairs": "Raw events exchanged ONCE (hourly rollup); the "
                      "pair self-join and five-moment agg run on the "
                      "buckets×types frame — pair count never touches "
                      "event volume.",
    "agg_weighted_median": "ONE group exchange: ordered cum-window, "
                           "partition total and the final min share "
                           "it; the 2·cum ≥ tot decision is exact "
                           "decimal, no float threshold.",
    "win_drawdown": "Rollup partials + one entity-keyed window pass "
                    "(running peak, per-entity max, argmin) — "
                    "join-free where the oracle self-joins; every "
                    "gap comparison exact decimal.",
    "agg_peak_concurrency": "Sweep-line in ONE exchange: +1/−1 "
                            "endpoint union, integer running sum, "
                            "peak and first-peak-time all on "
                            "hash(event_type); frame is 2× events — "
                            "no interval self-product.",
    "join_fuzzy": "Distinct-name dedupe FIRST (verify is vocab², "
                  "never rows²) → compound (prefix4, length-band) "
                  "block equi-join (never a cross product) → "
                  "threshold-bounded levenshtein INSIDE blocks → "
                  "WindowGroupLimit best-match cap → broadcast "
                  "re-attach of the vocab-sized winner frame.",
    "agg_basket_pairs": "Pair generation self-joins ON THE ORDER KEY "
                        "(work = Σ basket², never |parts|²); the "
                        "repartition(order) exchange is the only "
                        "fact-sized shuffle, runtime-reused "
                        "(ReusedExchange) by the join's second side "
                        "and the item counts; count frames broadcast.",
    "agg_paths": "Two leads over one hash(user) window exchange; the "
                 "trigram agg frame is ≤ |types|³ and the total is a "
                 "single-partition window on THAT frame — no join, no "
                 "recomputed subtree.",
    "win_rolling_median": "Hourly rollup exchange then the O(5)-state "
                          "frame window rides hash(user); collect-sort-"
                          "pick stays bounded per row regardless of "
                          "partition length.",
    "agg_entropy": "ONE exchange end-to-end: repartition(user) "
                   "satisfies the (user,type) hash-agg, the per-user "
                   "total window AND the final rollup; surprisal is "
                   "integer-bits (no libm).",
    "agg_gaps": "Two-level decomposition: in-bucket lead() is "
                "hash-parallel on key div 4096; the only global window "
                "walks the per-bucket (min,max) frame — keyspace/4096 "
                "rows, never the fact table.",
    "agg_rfm": "One hash(cust) agg over orders; the three ntile(5) "
               "scores FUSE into a single single-partition window over "
               "the customer frame (dimension-bounded by design).",
    "agg_abc": "Fact-sized work is one hash(part) revenue rollup; the "
               "cumulative walk is a single-task window over the part "
               "frame — global order IS the semantics, run on the "
               "smallest frame that carries it; class cuts are exact "
               "integer-scaled decimal comparisons.",
    "fn_workdays": "One equi-join then pure whole-stage-codegen integer "
                   "calendar math — no window, no second exchange; "
                   "broadcast at fixture scale, SMJ at 100 TB.",
    "scan_evolved": "mergeSchema unions parquet footers at PLANNING "
                    "time — per-file schemas read once on the driver, "
                    "row data never rewritten; v1 rows surface the new "
                    "column as NULL→sentinel.",
    "win_vwap": "ONE hash(part) exchange; both running decimal sums "
                "fuse into a single Window with O(1) frame state — "
                "survives any history length that fits a task sort.",
    "agg_churn": "repartition(user) satisfies the (user, week) dedup "
                 "AND the lead() window via the subset rule — one "
                 "fact exchange, then a calendar-bounded week rollup.",
    "agg_cohort_matrix": "Same subset-rule fusion on hash(cust): "
                         "distinct + per-customer min-window share one "
                         "exchange; cohort size recovered from the "
                         "grid itself (no second scan, no join).",
    "agg_grouping_sets": "Expand (3× fan-out) feeds ONE hash-agg with "
                         "map-side partials — the fact table is read "
                         "once for all three granularities.",
    "llm_boilerplate": "The llm_novelty r6 pattern: one gram-keyed "
                       "repartition serves the (gram, doc) dedup AND "
                       "the per-gram doc-count window (sort-only); "
                       "only the per-doc rollup shuffles again.",
    "llm_ngram_lm": "Bigrams form INSIDE the row (slice+zip HOFs, no "
                    "posexplode window); repartition(w1) serves the "
                    "(w1, w2) hash-agg and the c1 marginal window; "
                    "1-row vocab frame broadcasts.",
    "win_late_arrivals": "repartition(user) shared by the running-max "
                         "window and the per-user rollup — one "
                         "exchange; O(1) window state (running max).",
    "join_snowflake": "The star probe: ONE fact×fact exchange pair "
                      "(orders), then customer/nation/region are ALL "
                      "BroadcastHashJoin — a fact shuffle for a "
                      "dimension hop is the regression this catches.",
    "agg_latency_histogram": "Orderkey equi-join collapses immediately "
                             "to a day-frame hash-agg (map-side "
                             "partial); cumulative windows walk the "
                             "tiny frame.",
    "agg_attribution": "ONE hash(user) window exchange over the fact "
                       "table; both IGNORE-NULLS last_value calls "
                       "share the sort; channel rollup is "
                       "types-bounded.",
    "agg_user_growth": "repartition(user) fuses the (user, day) "
                       "distinct with the first-day window (subset "
                       "rule); calendar frames after.",
    "graph_degree": "stack() unpivots the distinct edge set so both "
                    "degree directions ride ONE orderkey join "
                    "(was 2 SMJs / 10 exchanges as two branches).",
    "graph_pagerank": "Per iteration the node-scale rank frame must show "
                      "BroadcastHashJoin into the edge scan (lineage-cut "
                      "frames hide stats; an SMJ here re-shuffles 36M "
                      "edges per iteration — 2.5x slower at 20M, "
                      "SCALE.md r7e).",
    "graph_triangles": "Top-3 partner (kNN) edges bound degree <= 2k by "
                       "construction; wedge + closing joins run on that "
                       "sparse frame — a support threshold cannot "
                       "sparsify a dense co-occurrence structure "
                       "(SCALE.md r7e).",
    "agg_boxplot": "Three exact percentile windows + the fence-count "
                   "hash-agg share ONE hash(event_type) exchange — the "
                   "win_outlier_mad fusion applied at design time.",
    "agg_mann_whitney": "Facts collapse to DISTINCT VALUES first; the "
                        "single-partition rank window walks the value "
                        "frame (bounded by value cardinality, not rows).",
    "sink_parquet_partitioned": "Read-back scan must show the day "
                                "predicate under PartitionFilters (also "
                                "plan-asserted in tests); the write side "
                                "repartitions on day — one file per day.",
    "llm_bloom_prefilter": "Filter and exact-membership sides are "
                           "BroadcastHashJoins (kilobyte frames); probe "
                           "work is explode(4) + one hash-agg — batch-"
                           "proportional.",
    "agg_theil_sen": "Month-grain hash-agg BEFORE the quadratic pair "
                     "self-join; the pair frame is nation x months^2, "
                     "never fact-scaled.",
    "agg_skew_report": "All three key columns ride ONE stack() scan "
                       "into a (col, key) hash-agg with map-side "
                       "partials; the hot-key rank walks the count "
                       "frame, never a second fact pass.",
    "fn_zorder": "Single WholeStageCodegen span (the HOF bit fold) - "
                 "zero exchanges, zero UDFs.",
    "agg_target_encode": "Both window statistics share one "
                         "hash(event_type) exchange; the global prior "
                         "is a 1-row broadcast, never a whole-frame "
                         "window.",
    "llm_embed_outliers": "The labels x 64 sum frame and the label "
                          "norms broadcast back onto the element "
                          "stream; fact-scaled work is one posexplode "
                          "+ two hash-aggs.",
}


def main() -> None:
    spark = get_spark(app_name="make-plans", cpus=8, shuffle_partitions=8)
    out = [
        "# PLANS — executed physical plans of headline operators "
        "(sf0.01, AQE final plans)",
        "",
        "Regenerate: `python make_plans.py`. Annotations state the property "
        "each plan",
        "must keep at 100 TB; `.explain` drift here is a perf regression "
        "signal.",
        "",
    ]
    for key, note in NOTES.items():
        df = QUERIES[key](spark, SF)
        # Execute the DataFrame's OWN QueryExecution (collect path) so AQE
        # finalizes THIS plan object — a noop write would run a separate
        # execution and leave df's plan at isFinalPlan=false. Result sizes
        # at sf0.01 are bounded (≤105k rows), driver-safe.
        df.toPandas()
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = [ln.rstrip() for ln in plan.splitlines() if ln.strip()]
        lines = [ln if len(ln) <= 150 else ln[:147] + "..." for ln in lines][:40]
        out += [f"## {key}", "", note, "", "```", *lines, "```", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(out))
    print("wrote PLANS.md")
    spark.stop()


if __name__ == "__main__":
    main()
