"""Embedding similarity search (SURVEY.md §2.11 X3).

Two paths, as a 100 TB pipeline needs both:
- brute-force cosine top-k: the exact baseline (and the oracle-checkable
  one). Query set restricted by predicate; candidates = full corpus. The
  dot/norm arithmetic goes through exact DECIMAL accumulators so DuckDB
  reproduces it bit-for-bit (see functions/kpi.py rationale).
- LSH (random-hyperplane / SRP) bucketed ANN: signature → band buckets →
  exact cosine only within buckets → top-k. Candidate generation is an
  equi-join on bucket keys — no cross product at scale. Recall is
  probabilistic ⇒ rows-only check (documented in SURVEY.md §5).

Embeddings stay ArrayType(Float) end-to-end; all math in built-in
higher-order functions (JVM codegen) — no Python UDF in either path.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scale 12 snap for per-element products; precision 20 (not 38) so that
# decimal addition KEEPS scale 12 (Spark types p38 s12 + p38 s12 as (38,11),
# silently rounding — p20 s12 + p20 s12 → (21,12), exact). The cast back to
# (20,12) in the accumulator is exact for any realizable magnitude here.
DEC12 = "decimal(20,12)"


def _dot_dec(a: Column, b: Column) -> Column:
    """Exact-decimal dot product of two float arrays, computed in double
    per element then snapped; order-insensitive, engine-identical."""
    prods = F.zip_with(a, b, lambda x, y: (x.cast("double") * y.cast("double")).cast(DEC12))
    return F.aggregate(
        prods, F.lit(0).cast(DEC12), lambda acc, v: (acc + v).cast(DEC12)
    ).cast("double")


def _norm2_dec(a: Column) -> Column:
    sq = F.transform(a, lambda x: (x.cast("double") * x.cast("double")).cast(DEC12))
    return F.aggregate(
        sq, F.lit(0).cast(DEC12), lambda acc, v: (acc + v).cast(DEC12)
    ).cast("double")


def cosine_topk_bruteforce(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_mod: int = 200,
    k: int = 5,
) -> DataFrame:
    """Exact top-k cosine neighbors for every query vector
    (id % query_mod == 0) against the whole corpus, self excluded.

    Plan shape: queries (small) are broadcast against the corpus — the
    corpus is never shuffled; per-query top-k via window (Catalyst's
    WindowGroupLimit keeps it a streaming top-k, not a full sort)."""
    from pyspark.sql import Window

    norms = emb.select(
        F.col(id_col), F.col(vec_col), _norm2_dec(F.col(vec_col)).alias("nrm2")
    )
    q = norms.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.col("nrm2").alias("q_nrm2"),
    )
    c = norms.select(
        F.col(id_col).alias("c_id"), F.col(vec_col).alias("c_vec"),
        F.col("nrm2").alias("c_nrm2"),
    )
    pairs = c.join(F.broadcast(q), F.col("c_id") != F.col("q_id"))
    scored = pairs.select(
        "q_id", "c_id",
        (_dot_dec(F.col("q_vec"), F.col("c_vec"))
         / F.sqrt(F.col("q_nrm2") * F.col("c_nrm2"))).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def _infer_dim(emb: DataFrame, vec_col: str) -> int:
    """Embedding dimensionality from the first row (one-row driver fetch,
    bounded metadata — not a data-path collect)."""
    row = emb.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dim from '{vec_col}'")
    return int(row["d"])


def _dim_guard(emb: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Executor-side dim assertion for the SRP signature paths: a vector of
    any other length would silently degenerate the sign test (zip_with pads
    with null) and collapse recall instead of erroring. assert_true returns
    NULL when the predicate holds, so the filter is a plan-visible no-op
    that cannot be pruned away."""
    return emb.where(
        F.assert_true(
            F.size(F.col(vec_col)) == dim,
            F.lit(f"embedding length != SRP plane dim {dim}"),
        ).isNull()
    )


def cosine_near_dup_pairs(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.25,
    nbits: int = 16,
    bands: int = 8,
    seed: int = 42,
    max_bucket_size: int | None = None,
    dim: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate PAIRS at corpus scale (the semantic
    dedup flavor — the scale twin of the exact all-pairs baseline in
    queries.llm_dedup_embed, symmetric to text dedup's LSH→verify split).

    SRP band buckets generate candidates via a self-equi-join on
    (band_id, band_hash) — never the cross product — then exact decimal
    cosine keeps pairs ≥ threshold (no false positives; recall is the
    probabilistic part, floored in tests/test_recall.py). Per-band
    collision for angle θ is (1 − θ/π)^r, so like the text path the band
    width must track the threshold: r=2 suits thresholds in the 0.25–0.5
    range. max_bucket_size guards degenerate buckets exactly like
    lsh_candidate_pairs (e.g. zero-vector or template embeddings).
    ``dim`` defaults to the first row's vector length; a mismatched row
    fails loudly (see _dim_guard)."""
    if dim is None:
        dim = _infer_dim(emb, vec_col)
    emb = _dim_guard(emb, vec_col, dim)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((nbits, dim))
    r = nbits // bands
    mask = (1 << r) - 1

    sig = emb.select(
        F.col(id_col), F.col(vec_col),
        srp_signature(F.col(vec_col), planes).alias("sig"),
        _norm2_dec(F.col(vec_col)).alias("nrm2"),
    ).localCheckpoint(eager=False)  # self-joined below: hash the vectors once
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftright(F.col("sig"), b * r).bitwiseAND(F.lit(mask)).alias("bh"),
        )
        for b in range(bands)
    ])
    long_ = sig.select(id_col, "nrm2", F.explode(band_structs).alias("e")) \
               .select(id_col, "nrm2", "e.band_id", "e.bh")
    if max_bucket_size is not None:
        sizes = long_.groupBy("band_id", "bh").agg(F.count(F.lit(1)).alias("__n"))
        long_ = long_.join(sizes.filter(F.col("__n") <= max_bucket_size),
                           ["band_id", "bh"]).drop("__n")
    a = long_.select(F.col(id_col).alias("a_id"), "band_id", "bh")
    b = long_.select(F.col(id_col).alias("b_id"), "band_id", "bh")
    cand = (
        a.join(b, ["band_id", "bh"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .distinct()
    )
    av = sig.select(F.col(id_col).alias("a_id"), F.col(vec_col).alias("a_vec"),
                    F.col("nrm2").alias("a_nrm2"))
    bv = sig.select(F.col(id_col).alias("b_id"), F.col(vec_col).alias("b_vec"),
                    F.col("nrm2").alias("b_nrm2"))
    scored = cand.join(av, "a_id").join(bv, "b_id").select(
        "a_id", "b_id",
        (_dot_dec(F.col("a_vec"), F.col("b_vec"))
         / F.sqrt(F.col("a_nrm2") * F.col("b_nrm2"))).alias("cos"),
    )
    return scored.filter(F.col("cos") >= threshold)


def cosine_topk_ivf(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_mod: int = 200,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_iter: int = 10,
) -> DataFrame:
    """IVF (inverted-file) ANN: seeded KMeans centroids partition the
    corpus into cells; each query probes only its ``n_probe`` nearest
    cells and ranks candidates by exact cosine.

    Scale shape: the corpus is assigned once (one model.transform pass,
    narrow), candidates come from an equi-join on cell_id — per-query work
    is corpus × n_probe/n_cells instead of the full broadcast. The
    centroid table is n_cells rows (broadcast, never shuffled). Recall
    rises with n_probe (n_probe == n_cells degenerates to brute force);
    tests/test_recall.py pins a floor on the fixture corpus.

    The KMeans fit is iterative (driver-coordinated, like llm_cluster) —
    at 100 TB fit on a sample, then transform the full corpus. Cells only
    need to be a reasonable partition, not a converged clustering —
    max_iter=10 matches max_iter=20's recall on the fixture (0.933) at
    roughly half the fit cost; 5 iterations drops recall to 0.80."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector
    from pyspark.sql import Window

    feats = emb.select(
        F.col(id_col), F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=max_iter).fit(feats)
    assigned = model.transform(feats).select(
        F.col(id_col), F.col(vec_col), F.col("prediction").alias("cell_id"),
        _norm2_dec(F.col(vec_col)).alias("nrm2"),
    )
    spark = emb.sparkSession
    centroids = spark.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(model.clusterCenters())],
        schema="cell_id int, centroid array<double>",
    )
    # queries probe their n_probe nearest cells (tiny frames: queries ×
    # n_cells rows)
    q = assigned.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.col("nrm2").alias("q_nrm2"),
    )
    qc = q.crossJoin(F.broadcast(centroids)).select(
        "q_id", "q_vec", "q_nrm2", "cell_id",
        F.aggregate(
            F.zip_with(F.col("q_vec"), F.col("centroid"),
                       lambda x, y: (x.cast("double") - y) * (x.cast("double") - y)),
            F.lit(0.0), lambda acc, v: acc + v,
        ).alias("dist2"),
    )
    wp = Window.partitionBy("q_id").orderBy(F.col("dist2"), F.col("cell_id"))
    probes = qc.withColumn("pr", F.row_number().over(wp)) \
               .filter(F.col("pr") <= n_probe) \
               .select("q_id", "q_vec", "q_nrm2", "cell_id")
    cands = (
        assigned.join(probes, "cell_id")
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id", F.col(id_col).alias("c_id"), "q_vec", "q_nrm2",
            F.col(vec_col).alias("c_vec"), F.col("nrm2").alias("c_nrm2"),
        )
    )
    scored = cands.select(
        "q_id", "c_id",
        (_dot_dec(F.col("q_vec"), F.col("c_vec"))
         / F.sqrt(F.col("q_nrm2") * F.col("c_nrm2"))).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def srp_signature(vec: Column, planes: np.ndarray) -> Column:
    """Signed-random-projection bit signature as a long. planes: (nbits,
    dim) from a fixed seed — shipped as literals (tiny), evaluated
    JVM-side per row."""
    bits = []
    for j in range(planes.shape[0]):
        plane = F.array(*[F.lit(float(v)) for v in planes[j]])
        d = F.aggregate(
            F.zip_with(vec, plane, lambda x, y: x.cast("double") * y),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(d >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def cosine_topk_ann(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_mod: int = 200,
    k: int = 5,
    nbits: int = 16,
    bands: int = 8,
    seed: int = 42,
    dim: int | None = None,
) -> DataFrame:
    """ANN variant: SRP-LSH banding prunes candidates, exact cosine ranks
    them. At 100 TB the bucket join replaces the corpus broadcast —
    each query only meets its band-collision set.

    Band width r = nbits/bands sets the recall/pruning trade: collision
    probability per band is (1 − θ/π)^r. The default r=2 is tuned for
    weakly-similar corpora like the fixture embeddings (top-5 neighbors at
    cos ≈ 0.34 → θ/π ≈ 0.39, giving ~0.37/band; r=8 drops that to ~4e-4
    and recall to 0 — measured in tests/test_recall.py). Corpora whose
    near-neighbors sit at cos ≥ 0.9 should RAISE r (e.g. nbits=32,
    bands=4) for harder pruning at the same recall. ``dim`` defaults to
    the first row's vector length; a mismatched row fails loudly (see
    _dim_guard)."""
    from pyspark.sql import Window

    if dim is None:
        dim = _infer_dim(emb, vec_col)
    emb = _dim_guard(emb, vec_col, dim)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((nbits, dim))
    r = nbits // bands
    mask = (1 << r) - 1

    sig = emb.select(
        F.col(id_col), F.col(vec_col),
        srp_signature(F.col(vec_col), planes).alias("sig"),
        _norm2_dec(F.col(vec_col)).alias("nrm2"),
    )
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftright(F.col("sig"), b * r).bitwiseAND(F.lit(mask)).alias("bh"),
        )
        for b in range(bands)
    ])
    banded = sig.select(id_col, vec_col, "nrm2", F.explode(band_structs).alias("e")) \
                .select(id_col, vec_col, "nrm2", "e.band_id", "e.bh")
    q = banded.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        F.col("nrm2").alias("q_nrm2"), "band_id", "bh",
    )
    cands = (
        banded.join(q, ["band_id", "bh"])
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id", F.col(id_col).alias("c_id"), "q_vec", "q_nrm2",
            F.col(vec_col).alias("c_vec"), F.col("nrm2").alias("c_nrm2"),
        )
        .dropDuplicates(["q_id", "c_id"])
    )
    scored = cands.select(
        "q_id", "c_id",
        (_dot_dec(F.col("q_vec"), F.col("c_vec"))
         / F.sqrt(F.col("q_nrm2") * F.col("c_nrm2"))).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
