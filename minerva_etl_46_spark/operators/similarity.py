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
import pandas as pd
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


def _dot_double(a: Column, b: Column) -> Column:
    """Plain-double dot product for the rows-only ANN paths: element order
    is fixed (array aggregate), so it is deterministic, just not
    engine-portable like the decimal version. Interpreted BigDecimal
    arithmetic is ~an order of magnitude slower per element — measurable
    against a 12k-candidate rerank — and ANN outputs have no SQL oracle to
    stay bit-identical with."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


def _norm2_double(a: Column) -> Column:
    return F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, v: acc + v,
    )


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

    # NULL vectors are missing data (cannot be normed or ranked) and are
    # excluded on BOTH sides — as query AND candidate — matching the IVF
    # path's exclusion and the oracle's non-null elems CTE (r12: previously
    # a NULL query emitted k NULL-cos rows the oracle never produced, and a
    # NULL candidate could enter top-k when < k real candidates existed).
    emb = emb.where(F.col(vec_col).isNotNull())
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
    row = (emb.where(F.col(vec_col).isNotNull())
           .select(F.size(F.col(vec_col)).alias("d")).first())
    if row is None or row["d"] is None or row["d"] <= 0:
        raise ValueError(f"cannot infer embedding dim from '{vec_col}'")
    return int(row["d"])


def _dim_guard(emb: DataFrame, vec_col: str, dim: int) -> DataFrame:
    """Executor-side dim assertion for the SRP signature paths: a vector of
    any other length would silently degenerate the sign test (zip_with pads
    with null) and collapse recall instead of erroring. assert_true returns
    NULL when the predicate holds, so the filter is a plan-visible no-op
    that cannot be pruned away."""
    # NULL vectors are MISSING DATA, not dimension errors: excluded like
    # every null observation in this engine (they cannot be hashed,
    # assigned, or ranked); a NON-null vector of the wrong length still
    # raises (r11 adversarial-embeddings parity — the guard previously
    # killed the job on the first null row)
    return emb.where(F.col(vec_col).isNotNull()).where(
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
    exact: bool = True,
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
    fails loudly (see _dim_guard).

    ``exact`` picks the verify arithmetic. True (default) = DECIMAL
    accumulators: engine-portable bit-exact cosine, what the oracle-keyed
    llm_dedup_embed path needs. False = plain-double fold: the PRODUCTION
    verify — interpreted BigDecimal is ~an order of magnitude slower per
    element, and at corpus scale the verify touches
    corpus × bucket_size × dim elements (measured: 1M vecs × ~15/bucket
    × 64 dims stalls the decimal path for tens of minutes where double
    finishes in ~2 — scale_probe.py r5). Double cosine is deterministic
    (fixed fold order), just not cross-engine bit-identical; a pair
    within one ulp of the threshold may differ — irrelevant for dedup,
    disqualifying only for the hash-checked oracle twin."""
    if dim is None:
        dim = _infer_dim(emb, vec_col)
    emb = _dim_guard(emb, vec_col, dim)
    rng = np.random.RandomState(seed)
    planes = rng.standard_normal((nbits, dim))
    r = nbits // bands
    mask = (1 << r) - 1
    norm2 = _norm2_dec if exact else _norm2_double
    dot = _dot_dec if exact else _dot_double

    sig = emb.select(
        F.col(id_col), F.col(vec_col),
        srp_signature(F.col(vec_col), planes).alias("sig"),
        norm2(F.col(vec_col)).alias("nrm2"),
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
        (dot(F.col("a_vec"), F.col("b_vec"))
         / F.sqrt(F.col("a_nrm2") * F.col("b_nrm2"))).alias("cos"),
    )
    return scored.filter(F.col("cos") >= threshold)


def _fit_centroids_sample(
    emb: DataFrame, id_col: str, vec_col: str,
    n_cells: int, seed: int, fit_sample: int, max_iter: int,
) -> np.ndarray:
    """Driver-side Lloyd fit on a deterministic pseudo-random sample — the
    100 TB IVF recipe (fit on a sample, transform everything) made the
    only path. The sample is the ``fit_sample`` lowest rows by
    xxhash64(id, seed) — deterministic regardless of partitioning — so at
    any corpus size the fit sees a bounded, reproducible subset; k-means
    over ≤ a few thousand × dim doubles is numpy-trivial, and the cluster
    only pays ONE corpus scan (TakeOrdered) instead of 2 Spark jobs per
    KMeans iteration. ANN cells need a reasonable space partition, not a
    converged clustering (see cosine_topk_ivf)."""
    rows = (
        # null vectors are missing data — a None in the sample crashed
        # the numpy fit (r11 adversarial-embeddings parity)
        emb.where(F.col(vec_col).isNotNull())
        .select(F.col(id_col).alias("i"), F.col(vec_col).alias("v"))
        .withColumn("__h", F.xxhash64(F.col("i").cast("string"), F.lit(seed)))
        .sort("__h", "i").limit(fit_sample).collect()  # bounded-by: fit_sample cap
    )
    X = np.array([list(r["v"]) for r in rows], dtype=np.float64)
    rng = np.random.RandomState(seed)
    # k-means++ init: random-row init measurably costs recall (0.533 vs
    # 0.933 on the fixture corpus — same gap as halving n_probe)
    k_eff = min(n_cells, len(X))
    idx = [int(rng.randint(len(X)))]
    d2min = ((X - X[idx[0]]) ** 2).sum(axis=1)
    for _ in range(1, k_eff):
        tot = d2min.sum()
        if tot <= 0:
            idx.append(int(rng.randint(len(X))))
        else:
            idx.append(int(rng.choice(len(X), p=d2min / tot)))
        d2min = np.minimum(d2min, ((X - X[idx[-1]]) ** 2).sum(axis=1))
    cent = X[idx].copy()
    for _ in range(max_iter):
        d2 = ((X[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
        lab = d2.argmin(axis=1)
        new = np.array([
            X[lab == j].mean(axis=0) if (lab == j).any() else cent[j]
            for j in range(len(cent))
        ])
        if np.allclose(new, cent):
            break
        cent = new
    return cent


def _cell_id(vec: Column, centroids: np.ndarray) -> Column:
    """argmin-distance cell assignment as a vectorized Arrow-batched
    pandas UDF: one narrow projection over the corpus, no shuffle, no
    iterative job. A pure-HOF version (n_cells × dim literal tree) was
    measured 2.9s of Catalyst ANALYSIS time at 16×64 — expression-size
    cost, not data cost — so this is the sanctioned vectorized-UDF case:
    routing needs deterministic float math, not the oracle-exact decimal
    accumulators. Squared distances sum per-row over a fixed axis order
    (no BLAS reduction reordering), ties break to the lowest cell_id
    (argmin finds the first min)."""
    from pyspark.sql.functions import pandas_udf

    cent = centroids.astype(np.float64)

    @pandas_udf("int")
    def assign(vs: pd.Series) -> pd.Series:
        out = np.empty(len(vs), dtype=np.int32)
        X = np.array(vs.tolist(), dtype=np.float64)
        for lo in range(0, len(X), 1024):  # bound the (chunk, cells, dim) temp
            chunk = X[lo:lo + 1024]
            d2 = ((chunk[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            out[lo:lo + len(chunk)] = d2.argmin(axis=1)
        return pd.Series(out)

    # nondeterministic-marking is a planner fence, not a semantics claim
    # (the function IS deterministic): without it the downstream join's
    # isnotnull(cell_id) filter makes Catalyst evaluate the UDF TWICE on
    # the corpus side (one ArrowEvalPython for the filter, one for the
    # projection — seen in PLANS.md); the fence forces evaluate-once.
    return assign.asNondeterministic()(vec)


def _probe_cells(vec: Column, centroids: np.ndarray, n_probe: int) -> Column:
    """Top-``n_probe`` nearest centroid ids per query vector as one narrow
    vectorized projection — replaces a crossJoin + HOF distance + ranking
    window (three first-compile stage shapes, ~6s of fixed cost on a cold
    session) with a single Arrow batch pass over the (small) query side.
    Stable argsort: ties break to the lowest cell_id."""
    from pyspark.sql.functions import pandas_udf

    cent = centroids.astype(np.float64)
    take = min(n_probe, len(cent))

    @pandas_udf("array<int>")
    def probes(vs: pd.Series) -> pd.Series:
        out: list = []
        X = np.array(vs.tolist(), dtype=np.float64)
        for lo in range(0, len(X), 1024):
            chunk = X[lo:lo + 1024]
            d2 = ((chunk[:, None, :] - cent[None, :, :]) ** 2).sum(axis=2)
            idx = np.argsort(d2, axis=1, kind="stable")[:, :take]
            out.extend(idx.astype(np.int32).tolist())
        return pd.Series(out)

    return probes(vec)


def cosine_topk_ivf(
    emb: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_mod: int = 200,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 42,
    max_iter: int = 20,
    fit_sample: int = 4096,
) -> DataFrame:
    """IVF (inverted-file) ANN: sample-fit k-means centroids partition the
    corpus into cells; each query probes only its ``n_probe`` nearest
    cells and ranks candidates by exact cosine.

    Scale shape: centroids are fit driver-side on a deterministic
    ``fit_sample``-row sample (see _fit_centroids_sample — one corpus
    scan, zero iterative Spark jobs; this replaced an MLlib fit whose
    per-iteration job overhead dominated the r02 bench at 4.4s), the
    corpus is assigned once via a narrow argmin projection, and candidates
    come from a broadcast equi-join on cell_id (probes side is queries ×
    n_probe rows; the corpus side is never shuffled) — per-query work is
    corpus × n_probe/n_cells instead of the full broadcast. Centroids ride
    into both vectorized projections as plain numpy closures (tiny:
    n_cells × dim floats). Recall rises with n_probe
    (n_probe == n_cells degenerates to brute force); tests/test_recall.py
    pins a floor on the fixture corpus. Cells only need to be a
    reasonable partition of the space, not a converged clustering.

    Recall vs pruning honesty: on a corpus with real cluster structure,
    neighbors concentrate in few cells and small n_probe gives high
    recall. The fixture embeddings are weakly clustered, so recall ≈
    probed corpus fraction (measured: 0.4/0.6/0.73/0.87 at n_probe
    4/6/8/10 of 16 with balanced cells). The old MLlib fit scored 0.933
    at n_probe=4 only because its unbalanced cells (3 singletons, largest
    = 13% of corpus) made 4 probes cover half the corpus — an artifact,
    not better ANN. Balanced cells + explicit n_probe is the tunable,
    honest trade."""
    from pyspark.sql import Window

    # null vectors are MISSING DATA (the engine's null-observation rule):
    # unfiltered, one None in an Arrow batch makes the assignment UDF's
    # numpy array inhomogeneous and kills the worker (r11
    # adversarial-embeddings parity)
    emb = emb.where(F.col(vec_col).isNotNull())
    cent = _fit_centroids_sample(
        emb, id_col, vec_col, n_cells, seed, fit_sample, max_iter
    )
    # No checkpoint needed: the query-side filter evaluates BEFORE the
    # assignment UDF (predicate pushdown), so the corpus pays exactly one
    # assignment pass; the probe side re-runs scan+UDF on queries only.
    assigned = emb.select(
        F.col(id_col), F.col(vec_col),
        _cell_id(F.col(vec_col), cent).alias("cell_id"),
        _norm2_double(F.col(vec_col)).alias("nrm2"),
    )
    # queries probe their n_probe nearest cells: one narrow projection +
    # explode on the small query side, broadcast into the candidate join —
    # the corpus side is never shuffled
    probes = emb.filter(F.col(id_col) % query_mod == 0).select(
        F.col(id_col).alias("q_id"), F.col(vec_col).alias("q_vec"),
        _norm2_double(F.col(vec_col)).alias("q_nrm2"),
        F.explode(_probe_cells(F.col(vec_col), cent, n_probe)).alias("cell_id"),
    )
    cands = (
        assigned.join(F.broadcast(probes), "cell_id")
        .filter(F.col(id_col) != F.col("q_id"))
        .select(
            "q_id", F.col(id_col).alias("c_id"), "q_vec", "q_nrm2",
            F.col(vec_col).alias("c_vec"), F.col("nrm2").alias("c_nrm2"),
        )
    )
    scored = cands.select(
        "q_id", "c_id",
        (_dot_double(F.col("q_vec"), F.col("c_vec"))
         / F.sqrt(F.col("q_nrm2") * F.col("c_nrm2"))).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def srp_signature(vec: Column, planes: np.ndarray) -> Column:
    """Signed-random-projection bit signature as a long. planes: (nbits,
    dim) from a fixed seed. Supports the full nbits=64: bit 63 is the
    long's sign bit (two's complement −2⁶³ sets exactly that bit, and
    summing disjoint bit values equals bitwise OR), so wide-band tunings
    like nbits=64/bands=4 (r=16 → 65k buckets per band, the
    100 TB-friendly bucket count — r must satisfy corpus/2^r ≈ target
    bucket size, see cosine_near_dup_pairs) pack into one long.

    Two implementations, switched on nbits×dim:

    - small (≤1024 literals): planes ship as literals into a pure
      Catalyst expression — stays in whole-stage codegen, zero Python.
    - wide: the literal expression tree grows as nbits×dim and its
      codegen compile dominates wall-clock (measured: nbits=64, dim=64 →
      4096 literals, minutes to compile), so the signature becomes ONE
      Arrow-batched pandas_udf doing a numpy (batch, dim) @ (dim, nbits)
      matmul — constant compile cost, vectorized math, the sanctioned
      pandas-UDF case. Bit values near a plane (dot ≈ 0) could differ
      between the two paths' summation orders; SRP tolerates either sign
      there by construction (both are valid signatures of the SAME
      planes), and all oracle-exact paths use the small/codegen route."""
    nbits, dim = planes.shape
    if nbits > 64:
        raise ValueError(f"srp_signature packs into one long: nbits "
                         f"{nbits} > 64")
    if nbits * dim <= 1024:
        bits = []
        for j in range(nbits):
            plane = F.array(*[F.lit(float(v)) for v in planes[j]])
            d = F.aggregate(
                F.zip_with(vec, plane, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            bit_val = (1 << j) if j < 63 else -(1 << 63)
            bits.append(F.when(d >= 0, F.lit(bit_val)).otherwise(F.lit(0)))
        out = bits[0]
        for b in bits[1:]:
            out = out + b
        return out.cast("long")

    from pyspark.sql.functions import pandas_udf

    P = planes.T.astype("float64")          # (dim, nbits)
    w = 1 << np.arange(nbits, dtype=np.uint64)  # uint64: bit 63 is fine

    @pandas_udf("long")
    def sig(s: pd.Series) -> pd.Series:
        M = np.stack(s.to_numpy()).astype("float64")   # (batch, dim)
        bits = (M @ P) >= 0.0                          # (batch, nbits)
        packed = (bits.astype(np.uint64) * w).sum(axis=1, dtype=np.uint64)
        return pd.Series(packed.view(np.int64))

    return sig(vec)


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
    max_bucket_size: int | None = None,
) -> DataFrame:
    """ANN variant: SRP-LSH banding prunes candidates, exact cosine ranks
    them. At 100 TB the bucket join replaces the corpus broadcast —
    each query only meets its band-collision set.

    Scale caveat (measured, SCALE.md r5): a band has 2^r distinct
    buckets, so the collision set is ~corpus/2^r per band. The fixture
    tuning r=2 (4 buckets/band) prunes little — correct for recall on
    the weakly-similar fixture corpus, but a real corpus needs
    corpus/2^r ≈ an affordable rerank size (e.g. nbits=64, bands=4 →
    r=16 → 65k buckets/band; wide signatures take srp_signature's
    Arrow/numpy path automatically).

    Band width r = nbits/bands sets the recall/pruning trade: collision
    probability per band is (1 − θ/π)^r. The default r=2 is tuned for
    weakly-similar corpora like the fixture embeddings (top-5 neighbors at
    cos ≈ 0.34 → θ/π ≈ 0.39, giving ~0.37/band; r=8 drops that to ~4e-4
    and recall to 0 — measured in tests/test_recall.py). Corpora whose
    near-neighbors sit at cos ≥ 0.9 should RAISE r (e.g. nbits=32,
    bands=4) for harder pruning at the same recall. ``dim`` defaults to
    the first row's vector length; a mismatched row fails loudly (see
    _dim_guard).

    ``max_bucket_size`` is the same degenerate-bucket cap the near-dup
    path carries (cosine_near_dup_pairs / lsh_candidate_pairs): one hot
    bucket (e.g. zero vectors all hashing to bh=0) fans every query in
    it against the whole collision set. Buckets past the cap are dropped
    before the join; members can still meet queries through their other
    bands. None (default) disables it — the fixture recall floors are
    pinned with the cap off, so turning it on is a per-corpus decision."""
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
        _norm2_double(F.col(vec_col)).alias("nrm2"),  # rows-only path:
        # double math (see _dot_double) — no SQL oracle to stay exact with
    )
    # the query side below is a filtered second consumer of this frame:
    # without the lineage cut, scan + srp_signature (the pandas-UDF
    # matmul on the wide path) + norm would all run TWICE — the same
    # reason cosine_near_dup_pairs checkpoints before ITS self-join
    # (r10 review: the two functions had silently diverged)
    sig = sig.localCheckpoint(eager=False)
    band_structs = F.array(*[
        F.struct(
            F.lit(b).alias("band_id"),
            F.shiftright(F.col("sig"), b * r).bitwiseAND(F.lit(mask)).alias("bh"),
        )
        for b in range(bands)
    ])
    banded = sig.select(id_col, vec_col, "nrm2", F.explode(band_structs).alias("e")) \
                .select(id_col, vec_col, "nrm2", "e.band_id", "e.bh")
    if max_bucket_size is not None:
        sizes = banded.groupBy("band_id", "bh").agg(
            F.count(F.lit(1)).alias("__n"))
        banded = (
            banded.join(sizes.filter(F.col("__n") <= max_bucket_size),
                        ["band_id", "bh"])
            .drop("__n")
        )
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
        (_dot_double(F.col("q_vec"), F.col("c_vec"))
         / F.sqrt(F.col("q_nrm2") * F.col("c_nrm2"))).alias("cos"),
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("c_id"))
    return scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
