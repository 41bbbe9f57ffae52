"""Graph analytics over entity-relationship graphs derived from fact
tables (the `graph_degree` key's siblings; SURVEY.md §2.11 extension
family — no Minerva counterpart, mandated by the large-scale-pipeline
brief).

Spark ships no graph primitive (GraphFrames is an external package, not
in-image), but the two workhorse graph diagnostics a data platform runs —
PageRank-style centrality and triangle counting — decompose into joins +
hash-aggs that Catalyst plans like any other relational op. Both keep
every graph frame (edges, degrees, ranks) distributed; nothing collects
an adjacency structure to the driver.

Cross-engine determinism: PageRank here is ALL-INTEGER — ranks live in
parts-per-billion (ppb) of total mass, updates use integral division
(`div` in Spark == `//` in DuckDB for non-negative operands), so a fixed
iteration count is bit-identical across engines with zero float
summation-order hazard. The deliberate cost: each `div` floors, so a few
ppb of mass leak per iteration — documented, deterministic, and
irrelevant to the ranking use of the output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: total rank mass, parts-per-billion scale
_MASS_PPB = 1_000_000_000
#: damping 0.85 split into integer numerator/denominator
_DAMP_NUM, _DAMP_DEN = 85, 100
#: (1 - damping) * mass, distributed uniformly each step
_TELEPORT_PPB = 150_000_000


def pagerank_ppb(directed_edges: DataFrame, iterations: int = 3,
                 broadcast_ranks: bool = True) -> DataFrame:
    """Fixed-iteration PageRank over ``(src, dst)`` directed edges,
    returning ``(node, rank_ppb)`` with integer ppb ranks.

    NOT LAZY at construction: the one-time sink-existence check below
    runs a small Spark job (a limit-1 count on the node-scale degree
    frame) while the plan is being BUILT, so merely calling this
    builder — e.g. from explain/plan-contract tooling — triggers
    cluster work and materializes the localCheckpoints. The payoff is
    that sink-free graphs (the common case for symmetric edge sets)
    skip the per-iteration dangling agg + crossJoin entirely, with
    bit-identical output either way (dangling mass is provably 0
    without sinks).

    Shape per iteration: edges × ranks on src, then one hash-agg on dst
    (map-side partial sums collapse multi-edge fan-in early), then a
    left join back to the degree frame so sinks with no in-edges still
    receive teleport mass. With ``broadcast_ranks=True`` (default) the
    NODE-scale rank frame broadcasts into the EDGE-scale join — the
    explicit hint is load-bearing because the lineage-cut frames hide
    size stats from Catalyst, which otherwise plans an SMJ that
    re-shuffles the full edge set every iteration (A/B at 36M directed
    edges / 110k nodes, 3 iterations: SMJ ~25 s warm vs broadcast
    ~9-10 s warm — scale_probe r7e + SCALE.md). Per-iteration cost is
    then one edge
    SCAN plus a node-scale partial-agg shuffle — the scan is
    irreducible (every edge carries mass), the shuffle is rank-sized.
    Set ``broadcast_ranks=False`` when the node set exceeds the
    broadcast budget (billions of nodes); then pre-partition the edge
    frame by src so the sort-merge reuses one exchange across
    iterations. The edge and degree frames are lineage-cut with
    localCheckpoint (consumed every iteration; an uncut plan grows
    linearly and re-derives the edge set per step).

    The node set is union(src, dst) — a node appearing only as a
    destination (a SINK: out-degree 0) gets a rank row, and the mass
    it would otherwise swallow is redistributed uniformly each step
    (the standard dangling-mass correction): rank' = teleport/n +
    d·(inflow + dangling/n), all in integral ppb arithmetic. On a
    graph with no sinks the dangling term is exactly 0 and the update
    reduces to the plain form — bit-identical output. The per-step
    dangling sum is a node-scale agg folded into the plan as a
    broadcast 1-row frame; each iteration's rank frame is lineage-cut
    because it feeds BOTH the inflow join and the dangling agg (an
    uncut plan would double per step).
    """
    de = directed_edges.select("src", "dst").localCheckpoint(eager=False)
    out_c = (
        de.groupBy("src").agg(F.count(F.lit(1)).alias("outdeg"))
        .withColumnRenamed("src", "node")
    )
    nodes = (
        de.select(F.col("src").alias("node"))
        .union(de.select(F.col("dst").alias("node")))
        .distinct()
    )
    deg = (
        nodes.join(out_c, "node", "left")
        .select("node",
                F.coalesce("outdeg", F.lit(0)).cast("long").alias("outdeg"))
        .localCheckpoint(eager=False)
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n_nodes")).localCheckpoint(eager=False)
    # one-time sink check on the (already checkpointed) node-scale deg
    # frame: sink-free graphs — the common case for symmetric edge sets
    # — skip the per-iteration dangling agg + crossJoin entirely; the
    # update below is bit-identical either way (dm ≡ 0 when no sinks)
    has_sinks = bool(
        deg.filter(F.col("outdeg") == 0).limit(1).count())
    r = (
        deg.crossJoin(F.broadcast(nn))  # 1-row stats frame
        .select("node", "outdeg",
                F.expr(f"{_MASS_PPB} div n_nodes").alias("rank"))
    )
    for _ in range(iterations):
        # cut the lineage each step: with sinks r is consumed twice
        # (inflow join + dangling agg — uncut, the plan DOUBLES per
        # iteration); sink-free it is consumed once but the uncut plan
        # still grows linearly with iterations (analysis cost + plan-
        # contract stability)
        r = r.localCheckpoint(eager=False)
        if has_sinks:
            dang = r.filter(F.col("outdeg") == 0).agg(
                F.coalesce(F.sum("rank"), F.lit(0)).alias("dm"))
        r_side = F.broadcast(r) if broadcast_ranks else r
        s = (
            de.join(r_side, de["src"] == r_side["node"])
            .select(de["dst"].alias("in_node"),
                    F.expr("rank div outdeg").alias("c"))
            .groupBy("in_node")
            .agg(F.sum("c").alias("s"))
        )
        nxt = (
            deg.join(s, deg["node"] == s["in_node"], "left")
            .crossJoin(F.broadcast(nn))
        )
        if has_sinks:
            nxt = nxt.crossJoin(F.broadcast(dang))  # 1-row mass frame
            rank_expr = (
                F.expr(f"{_TELEPORT_PPB} div n_nodes")
                + F.expr(f"({_DAMP_NUM} * (coalesce(s, 0)"
                         f" + dm div n_nodes)) div {_DAMP_DEN}"))
        else:
            rank_expr = (
                F.expr(f"{_TELEPORT_PPB} div n_nodes")
                + F.expr(f"({_DAMP_NUM} * coalesce(s, 0))"
                         f" div {_DAMP_DEN}"))
        r = nxt.select(
            deg["node"].alias("node"),
            deg["outdeg"].alias("outdeg"),
            rank_expr.alias("rank"),
        )
    return r.select("node", F.col("rank").alias("rank_ppb"))


def triangles_per_node(edges: DataFrame) -> DataFrame:
    """Triangle participation count per node over undirected edges given
    canonically oriented as ``(u, v)`` with ``u < v`` (one row per edge).

    Compact-forward enumeration: wedges chain two oriented edges
    (a<b, b<c ⇒ a<b<c), then a semi-check join against the edge set on
    (a, c) closes each triangle exactly once. Every step is an equi-join
    Catalyst can SMJ/shuffle-hash; the triangle frame then unpivots via
    ``stack`` so all three corners ride ONE hash-agg.

    Skew note for 100 TB: id-ordering bounds wedge fan-out by the
    max forward-degree; on graphs with hub nodes replace the id order
    with a (degree, id) total order (orient edges low→high degree),
    which caps forward-degree at O(sqrt(m)) — same plan, different
    orientation predicate. The fixture graph (co-supplier via shared
    part) is near-regular, so id order suffices and keeps the oracle
    SQL trivially portable.
    """
    e = edges.select("u", "v").localCheckpoint(eager=False)
    wedges = (
        e.alias("e1")
        .join(e.alias("e2"), F.col("e1.v") == F.col("e2.u"))
        .select(F.col("e1.u").alias("a"), F.col("e1.v").alias("b"),
                F.col("e2.v").alias("c"))
    )
    tri = (
        wedges.join(
            e.alias("e3"),
            (F.col("a") == F.col("e3.u")) & (F.col("c") == F.col("e3.v")),
        )
        .select("a", "b", "c")
    )
    stubs = tri.select(F.expr("stack(3, a, b, c) as (node)"))
    return stubs.groupBy("node").agg(F.count(F.lit(1)).alias("n_tri"))
