"""Iterative graph traversal: BFS shortest paths and connected components.

The reference's Neo4j backend gives its users Cypher path queries for
free; its own code only ships fixed 2-3 hop patterns (SURVEY §2.3). These
operators restore general traversal capability Spark-first: driver-side
loops over DataFrames, one equi-join shuffle per superstep, lineage
truncated with localCheckpoint — the same Pregel-on-DataFrames shape as
graphs.pagerank.

Scale notes: each superstep shuffles the frontier (BFS) or the full label
set (CC) against the edge table, prepared by REGIME (measured rule 3,
SCALING.md pinned-cache appendix): a row-format checkpoint re-partitioned
once to the loop count while the state side broadcasts (the edge side
merely streams through a BHJ there), a hash-partitioned sorted cache
(`_pin_for_iteration` — cached scans keep partitioning/ordering,
checkpoints do not) in the big regime, so per-superstep movement is
state-sized. Keyed frontiers carry a size-gated broadcast hint and every
per-superstep aggregate is merge-pinned (see _pin_for_iteration's
docstring for the measured policy). BFS work is proportional to the
expanding frontier; CC label propagation converges in O(diameter)
supersteps (the driver testdata co-occurrence graphs have tiny diameters;
for pathological chains `connected_components_star` below is the
O(log n)-round alternative).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .pagerank import (
    _BROADCAST_STATE_ROWS, _EDGE_PIN_ROWS, _iter_partitions,
    _pin_for_iteration, _prep_iter_edges, _repartition_checkpoint,
)


def shortest_paths(edges: DataFrame, landmarks: DataFrame,
                   max_hops: int = 20,
                   num_partitions: int | None = None,
                   dedupe: bool = True) -> DataFrame:
    """(id, landmark, dist): unweighted BFS distance from every reachable
    vertex to each landmark. edges: (src, dst) directed — pass a
    symmetric edge list for undirected semantics. landmarks: (id).

    dedupe=False skips the defensive distinct (a full edge shuffle) when
    the caller guarantees unique (src, dst) rows — e.g. a symmetrized
    aggregated pair table; duplicates would not change BFS results, only
    waste expansion work, so this is a pure planning hint."""
    edges = edges.select("src", "dst")
    if dedupe:
        edges = edges.distinct()
    edges = edges.localCheckpoint()
    m = edges.count()
    # KEYED (id, landmark) state — the class where the measured gated
    # hint beats stats-driven planning (see _BROADCAST_STATE_ROWS). In
    # the broadcast regime the EDGE side streams through every hop's
    # hash join, and a row-format checkpoint streams faster than the
    # sorted columnar cache (whose per-scan decode measured ~15% on the
    # SSSP twin at sf0.1) — so only the big regime pins, where the
    # cache's reported partitioning is what saves the per-round edge
    # shuffle+sort under the sort-merge join.
    n_landmarks = landmarks.count()
    nv = (edges.select(F.col("src").alias("v"))
          .unionByName(edges.select(F.col("dst").alias("v")))
          .distinct().count())
    bcast_state = nv * max(1, n_landmarks) <= _BROADCAST_STATE_ROWS
    # pin past the broadcast regime OR past the measured edge-row bound
    # (the checkpoint's per-row deserialization is linear in rows — the
    # sf1-measured inversion on the pagerank-family loops; same
    # streamed-BHJ shape here)
    edges_pinned = not (bcast_state and m <= _EDGE_PIN_ROWS)
    if edges_pinned:
        # per-hop join emits up to |E|·|landmarks| expansion rows out of
        # the cache's partitions — size by that work product
        n_parts = num_partitions or _iter_partitions(
            edges.sparkSession.sparkContext, m * max(1, n_landmarks), m)
        edges = _pin_for_iteration(edges, n_parts, "src")

    def _b(df: DataFrame) -> DataFrame:
        # big regime: pin to a merge join so a generous session
        # autoBroadcastJoinThreshold can never move an aggregate subplan
        # onto a driver-blocking broadcast side (see the single-vector
        # loop's note)
        return F.broadcast(df) if bcast_state else df.hint("merge")

    dist = landmarks.select(
        F.col("id"), F.col("id").alias("landmark"),
        F.lit(0).alias("dist")).localCheckpoint()
    frontier = dist

    try:
        for hop in range(1, max_hops + 1):
            # expand: neighbors of the frontier not yet seen for that
            # landmark
            expanded = (
                edges.join(_b(frontier), frontier["id"] == edges["src"])
                .select(F.col("dst").alias("id"), "landmark",
                        F.lit(hop).alias("dist"))
                .distinct()
            )
            new_frontier = expanded.join(
                dist.select("id", "landmark"), ["id", "landmark"],
                "left_anti"
            ).localCheckpoint()
            if new_frontier.isEmpty():
                break
            dist = dist.unionByName(new_frontier).localCheckpoint()
            frontier = new_frontier
    finally:
        # finally-scoped like pagerank/HITS/CC: an exception mid-loop
        # (e.g. during the isEmpty probe) must not leak the pinned cache
        if edges_pinned:
            edges.unpersist(False)
    return dist


def connected_components(vertices: DataFrame, edges: DataFrame,
                         max_iter: int = 50,
                         num_partitions: int | None = None,
                         dedupe: bool = True,
                         init_labels: DataFrame | None = None) -> DataFrame:
    """(id, component): undirected connected components by min-label
    propagation — component = smallest vertex id reachable. vertices: (id);
    edges: (src, dst), treated as undirected.

    dedupe=False skips the distinct over the symmetrized list (a full
    edge shuffle) when the input rows are unique with src<dst or src≠dst
    pairs — the mirror halves are then disjoint by construction and
    duplicates can't exist. Min-propagation is idempotent over
    duplicates, so this is a planning hint, never a correctness risk.

    `init_labels` ((id, component)) warm-starts from a PREVIOUS run's
    labels after edges were appended — the incremental path: appends only
    ever MERGE components, so each old label is a vertex id inside the
    vertex's new component and an upper bound on its new label, and
    min-propagation from those labels reaches the same fixpoint as a
    cold start (min over reachable init labels = the new component min).
    The saving: components UNTOUCHED by the append are already at their
    fixpoint (zero propagation work — and on a typical incremental batch
    that is almost all of them, including the high-diameter ones that
    dominate cold-start superstep counts); only components actually
    merged by new edges pay propagation, bounded by THEIR diameter.
    Vertices absent from init_labels (new arrivals) start at their own
    id. Edge DELETIONS can split components and break the upper-bound
    invariant — recompute cold for those."""
    sym = (edges.select("src", "dst")
           .unionByName(edges.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst"))))
    if dedupe:
        sym = sym.distinct()
    sym = sym.localCheckpoint()
    m = sym.count()
    # labels / neighbor_min are |V|-sized — state sizing uses the vertex
    # count; the symmetrized edge count enters at the looser edge weight
    nv = vertices.count()
    n_parts = num_partitions or _iter_partitions(
        edges.sparkSession.sparkContext, nv, m)
    # Regime gate (measured rule 3 + the _EDGE_PIN_ROWS row bound —
    # pagerank.py:_prep_iter_edges): while the label state broadcasts
    # AND the symmetrized edge list stays under the measured row bound,
    # each superstep's propagation join streams the edge side through a
    # BHJ — keep the row-format checkpoint (re-partitioned once to the
    # loop count); pin past either gate (the merge-pinned neighbor_min
    # aggregate makes the cache's partitioning load-bearing in the big
    # regime; past the row bound the checkpoint's per-row
    # deserialization outgrows the cache decode — the sf1-measured
    # inversion on the pagerank-family loops, same streamed-join shape).
    bcast_state = nv <= _BROADCAST_STATE_ROWS
    sym, sym_pinned = _prep_iter_edges(sym, n_parts, bcast_state, m, "src")

    if init_labels is None:
        labels = vertices.select("id", F.col("id").alias("component")) \
            .localCheckpoint()
    else:
        prev = init_labels.select("id", F.col("component").alias("__c0"))
        labels = (vertices.select("id").join(prev, "id", "left")
                  .select("id", F.coalesce(F.col("__c0"), F.col("id"))
                          .alias("component"))
                  .localCheckpoint())

    # Labels only ever DECREASE under min-propagation, so for NUMERIC ids
    # "any label changed this superstep" ⟺ "the label sum changed" — one
    # narrow aggregate over the new frame instead of a join of old vs
    # new. DECIMAL(38,0) keeps the sum exact for any |V|·max(id) (a
    # bigint sum would overflow-error under ANSI at 10⁹ vertices).
    # Non-numeric ids (min is lexicographic) fall back to the join probe.
    numeric_ids = labels.schema["component"].dataType.typeName() in (
        "byte", "short", "integer", "long", "decimal")

    def _label_sum(df: DataFrame):
        return df.agg(
            F.sum(F.col("component").cast("decimal(38,0)")).alias("s")
        ).first()["s"]

    prev_sum = _label_sum(labels) if numeric_ids else None
    try:
        for _ in range(max_iter):
            neighbor_min = (
                sym.join(labels, labels["id"] == sym["src"])
                .groupBy(F.col("dst").alias("id"))
                .agg(F.min("component").alias("n_comp"))
            )
            new_labels = (
                # merge-pin the aggregate side: see pagerank's contrib note
                labels.join(neighbor_min.hint("merge"), "id", "left")
                .select("id", F.least(
                    F.col("component"),
                    F.coalesce(F.col("n_comp"), F.col("component"))
                ).alias("component"))
                .localCheckpoint()
            )
            if numeric_ids:
                new_sum = _label_sum(new_labels)
                unchanged = new_sum == prev_sum
                prev_sum = new_sum
            else:
                unchanged = (
                    new_labels.withColumnRenamed("component", "new_c")
                    .join(labels, "id")
                    .filter(F.col("new_c") != F.col("component"))
                    .isEmpty()
                )
            labels = new_labels
            if unchanged:
                break
    finally:
        if sym_pinned:
            sym.unpersist(False)
    return labels


def weighted_shortest_paths(edges: DataFrame, landmarks: DataFrame,
                            rounds: int = 8,
                            num_partitions: int | None = None,
                            init_dists: DataFrame | None = None,
                            until_stable: bool = False,
                            with_rounds: bool = False,
                            ) -> DataFrame | tuple[DataFrame, int]:
    """(id, landmark, dist): Bellman-Ford relaxation — min-cost paths
    under non-negative edge weights, the weighted upgrade of
    `shortest_paths` (which counts hops). edges: (src, dst, weight)
    directed; pass a symmetric list for undirected semantics.

    FIXED round count: after r rounds `dist` is exact over all paths of
    ≤ r edges — pinning r makes the whole fixed point replayable by a
    recursive-CTE oracle (the same contract as pagerank_fixed20), and on
    a real workload r is the graph's effective weighted diameter. Each
    round is one edge-join shuffle + one (id, landmark) min-aggregate —
    float-parity-safe across engines because the only arithmetic is
    binary IEEE adds along each path (identical association order) and
    exact MIN comparisons.

    `init_dists` ((id, landmark, dist) from a PREVIOUS run) warm-starts
    the relaxation after edges were APPENDED — the incremental pattern
    shared with pagerank(init_ranks=...) and CC(init_labels=...):
    appends only ever shorten paths, so each old distance is a
    realizable path length in the new graph and an UPPER bound on the
    new distance, and min-relaxation from upper bounds reaches the exact
    fixpoint (it can never undershoot; landmark self-rows are re-seeded
    at 0). Only vertices actually improved by the new edges pay
    propagation rounds. Edge DELETIONS can lengthen paths and break the
    upper-bound invariant — recompute cold for those.

    `until_stable=True` stops as soon as a round neither reaches a new
    (id, landmark) pair nor improves a distance (`rounds` then acts as
    the superstep budget): one count on the freshly checkpointed frame
    plus one id-partitioned join probe per round — no extra shuffle
    class. Leave False for the fixed-round oracle contract.
    `with_rounds=True` additionally returns the executed round count.
    """
    edges = edges.select("src", "dst", "weight").localCheckpoint()
    m = edges.count()
    # same regime split as shortest_paths: broadcast regime streams the
    # row-format checkpoint (measured faster than the columnar cache);
    # big regime pins, sized by the |E|·|landmarks| relax work product
    n_landmarks = landmarks.count()
    nv = (edges.select(F.col("src").alias("v"))
          .unionByName(edges.select(F.col("dst").alias("v")))
          .distinct().count())
    bcast_state = nv * max(1, n_landmarks) <= _BROADCAST_STATE_ROWS
    # same two-condition gate as shortest_paths (rule 3 + the measured
    # _EDGE_PIN_ROWS bound)
    edges_pinned = not (bcast_state and m <= _EDGE_PIN_ROWS)
    if edges_pinned:
        n_parts = num_partitions or _iter_partitions(
            edges.sparkSession.sparkContext, m * max(1, n_landmarks), m)
        edges = _pin_for_iteration(edges, n_parts, "src")

    def _b(df: DataFrame) -> DataFrame:
        # big regime: pin to a merge join so a generous session
        # autoBroadcastJoinThreshold can never move an aggregate subplan
        # onto a driver-blocking broadcast side (see the single-vector
        # loop's note)
        return F.broadcast(df) if bcast_state else df.hint("merge")

    zero = landmarks.select(
        F.col("id"), F.col("id").alias("landmark"),
        F.lit(0.0).alias("dist"))
    if init_dists is None:
        dist = zero.localCheckpoint()
    else:
        # seed with prior distances (upper bounds after appends); min
        # with the landmark zero rows so a stale/missing self-row can
        # never displace the exact 0
        dist = (init_dists
                .select("id", "landmark", F.col("dist").cast("double"))
                .unionByName(zero)
                .groupBy("id", "landmark").agg(F.min("dist").alias("dist"))
                .localCheckpoint())

    done = 0
    try:
        for done in range(1, rounds + 1):
            relaxed = (
                edges.join(_b(dist), dist["id"] == edges["src"])
                .select(F.col("dst").alias("id"), "landmark",
                        (F.col("dist") + F.col("weight")).alias("dist"))
            )
            new_dist = (dist.unionByName(relaxed)
                        .groupBy("id", "landmark")
                        .agg(F.min("dist").alias("dist"))
                        .localCheckpoint())
            if until_stable:
                # stable ⟺ no new (id, landmark) pair AND no exact-min
                # improvement; both frames are checkpointed so the probes
                # are count + one join, no recomputation
                grew = new_dist.count() != dist.count()
                improved = grew or not (
                    new_dist.withColumnRenamed("dist", "__nd")
                    .join(dist, ["id", "landmark"])
                    .filter(F.col("__nd") < F.col("dist")).isEmpty())
                dist = new_dist
                if not improved:
                    break
            else:
                dist = new_dist
    finally:
        # finally-scoped like pagerank/HITS/CC (ADVICE r12): a mid-loop
        # exception must not leak the pinned cache
        if edges_pinned:
            edges.unpersist(False)
    if with_rounds:
        return dist, done
    return dist


def connected_components_star(vertices: DataFrame, edges: DataFrame,
                              max_rounds: int = 30,
                              num_partitions: int | None = None,
                              dedupe: bool = True) -> DataFrame:
    """(id, component) by alternating large-star/small-star contraction —
    the O(log n)-round connected components of Kiveris et al.,
    "Connected Components in MapReduce and Beyond" (SoCC'14).

    Same answer as `connected_components` (component = min reachable id,
    any orderable id type), different convergence regime: min-label
    propagation needs O(diameter) supersteps, which on a 100 TB graph
    with a long-chain component (web graphs, transaction chains) means
    hundreds of shuffles; star contraction HALVES tree heights every
    alternation, so a 10⁹-vertex path closes in ~30 rounds and typical
    graphs in <10. Prefer the propagation variant on known-low-diameter
    graphs (co-occurrence, social) — fewer jobs per round; prefer this
    one when the diameter is unknown or large.

    Per round: large-star connects every neighbor v>u to min(Γ(u)∪{u})
    (one min-aggregate + one edge join), small-star re-parents every
    smaller neighbor to the group min (same shape on the big→small
    orientation). Both are edge-shuffle-bounded with map-side-combining
    min aggregates; edges shrink toward one star edge per non-root
    vertex, so late rounds are |V|-cheap. Convergence = the canonical
    (big→small) edge set reaches a fixed point — an exact anti-join probe
    on the (small, shrinking) star set, checked every round.
    """
    e = edges.select("src", "dst").filter(F.col("src") != F.col("dst"))
    if dedupe:
        e = e.distinct()
    e = e.localCheckpoint()
    m = e.count()
    n_parts = num_partitions or _iter_partitions(
        edges.sparkSession.sparkContext, m)

    prev = None
    converged = False
    for _ in range(max_rounds):
        # full neighborhoods: both directions of the current edge set
        sym = e.unionByName(
            e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        # large-star: m(u) = min(min_neighbor(u), u); emit (v, m) for
        # every neighbor v > u, plus (u, m) to keep u attached
        mins = (sym.groupBy("src").agg(F.min("dst").alias("__mn"))
                .select("src", F.least("__mn", "src").alias("m")))
        large = (
            sym.join(mins, "src")
            .filter(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("a"), F.col("m").alias("b"))
            .unionByName(mins.select(F.col("src").alias("a"),
                                     F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
        )  # oriented big→small by construction
        # small-star on the big→small orientation: per hub a, re-parent
        # every small neighbor (and a itself) to the group min
        mins2 = large.groupBy("a").agg(F.min("b").alias("m"))
        small = (
            mins2.select("a", F.col("m").alias("b"))
            .unionByName(
                large.join(mins2, "a")
                .filter(F.col("b") != F.col("m"))
                .select(F.col("b").alias("a"), F.col("m").alias("b")))
            .filter(F.col("a") != F.col("b"))
            .distinct()
            .repartition(n_parts, "a")
            .localCheckpoint()
        )
        e = small.select(F.col("a").alias("src"), F.col("b").alias("dst"))
        n_small = small.count()  # cheap: small is checkpointed
        if prev is not None:
            # equal-size pre-check skips both anti-join probes on every
            # still-contracting round (sizes differ); when sizes match,
            # equal cardinality + one empty anti-join ⟹ set equality, so
            # the second-direction probe is never needed at all
            changed = (n_small != n_prev
                       or small.join(prev, ["a", "b"], "left_anti")
                       .limit(1).count() > 0)
            if not changed:
                converged = True
                break
        prev, n_prev = small, n_small

    if not converged:
        # max_rounds exhausted before the star fixed point: each vertex's
        # min DIRECT star neighbor would be a silently wrong label here.
        # Finish exactly with min-label propagation over the CONTRACTED
        # star set — star rounds preserve connectivity and only ever
        # re-parent toward smaller ids, and the contracted forest is both
        # far smaller and far shallower than the input, so the bounded
        # propagation pass is cheap and closes in ≤ remaining tree height.
        contracted_vs = (e.select(F.col("src").alias("id"))
                         .unionByName(e.select(F.col("dst").alias("id")))
                         .distinct())
        labels = connected_components(contracted_vs, e,
                                      num_partitions=n_parts,
                                      dedupe=True)
        return (vertices.select("id").distinct()
                .join(labels.withColumnRenamed("component", "__c"),
                      "id", "left")
                .select("id", F.coalesce(F.col("__c"), F.col("id"))
                        .alias("component")))

    # at the fixed point every non-root has exactly one star edge to its
    # component min
    roots = e.groupBy(F.col("src").alias("id")) \
        .agg(F.min("dst").alias("__c"))
    return (vertices.select("id").distinct()
            .join(roots, "id", "left")
            .select("id", F.coalesce(F.col("__c"), F.col("id"))
                     .alias("component")))


def label_propagation(vertices: DataFrame, edges: DataFrame,
                      max_iter: int = 10,
                      num_partitions: int | None = None,
                      dedupe: bool = True,
                      init_labels: DataFrame | None = None,
                      stop_when_stable: bool = False,
                      with_iterations: bool = False) -> DataFrame | tuple[DataFrame, int]:
    """(id, community) via synchronous label propagation with a
    deterministic tie-break: each superstep every vertex adopts the
    label most frequent among its neighbors, ties broken by the SMALLEST
    label (so runs are reproducible — asynchronous/random-order LPA is
    not). Isolated vertices keep their own id. Undirected: pass src<dst
    pairs; the symmetrized list is built here.

    Same Pregel-on-DataFrames shape as connected_components: per
    superstep one edge⋈labels join, a (dst, label) count aggregate, and
    an argmax-by-(count desc, label asc) window over neighbor label
    histograms — all shuffle-bounded by the edge count. LPA on huge
    graphs typically runs a FIXED small iteration budget (it may
    oscillate rather than converge), which is the default contract here:
    no convergence probe, exactly max_iter supersteps.

    `init_labels` ((id, community)) warm-starts from a PREVIOUS run —
    the incremental-graph pattern shared with pagerank(init_ranks=...)
    and connected_components(init_labels=...): after a small edge
    append, yesterday's communities are near the new argmax fixpoint, so
    with `stop_when_stable=True` (a changed-vertex count probe per
    superstep — one tiny aggregate on the id-partitioned labels frame)
    the loop exits after a fraction of the cold budget. Vertices absent
    from init_labels (new arrivals) start at their own id.
    `with_iterations=True` additionally returns the superstep count.
    """
    from pyspark.sql import Window

    sym = (edges.select("src", "dst")
           .unionByName(edges.select(F.col("dst").alias("src"),
                                     F.col("src").alias("dst"))))
    if dedupe:
        sym = sym.distinct()
    sym = sym.localCheckpoint()
    m = sym.count()
    # labels / per-vertex argmax frames are |V|-sized — state sizing by
    # vertices, symmetrized edges at the looser edge weight
    nv = vertices.count()
    n_parts = num_partitions or _iter_partitions(
        edges.sparkSession.sparkContext, nv, m)
    # LPA keeps the UNCONDITIONAL pin — measured exception to the regime
    # gate (r12 A/B: gated 0.86×, consistent across rounds, while CC
    # gated measured 1.08×): the symmetrized 2-col long edge list decodes
    # trivially from the columnar cache, so rule 3's per-scan decode
    # premium doesn't materialize, and LPA's FIXED 10 supersteps rescan
    # the list enough times that scan cost dominates the setup sort the
    # checkpoint saves; CC converges in ~diameter (2-4) supersteps on the
    # co-occurrence graphs, so its setup dominates and the gate wins.
    sym = _pin_for_iteration(sym, n_parts, "src")

    if init_labels is None:
        labels = vertices.select("id", F.col("id").alias("community"))
    else:
        prev = init_labels.select("id", F.col("community").alias("__c0"))
        labels = (vertices.select("id").join(prev, "id", "left")
                  .select("id", F.coalesce(F.col("__c0"), F.col("id"))
                           .alias("community")))
    labels = labels.localCheckpoint()

    w = (Window.partitionBy("id")
         .orderBy(F.desc("cnt"), F.asc("community")))
    it = -1  # max_iter <= 0 never enters the loop → superstep count 0
    try:
        for it in range(max_iter):
            hist = (
                sym.join(labels, labels["id"] == sym["src"])
                .groupBy(F.col("dst").alias("id"), "community")
                .agg(F.count(F.lit(1)).alias("cnt"))
            )
            winner = (hist
                      .withColumn("__rn", F.row_number().over(w))
                      .filter("__rn = 1")
                      .select("id", F.col("community").alias("n_comm")))
            updated = (
                # merge-pin the argmax side: see pagerank's contrib note
                labels.join(winner.hint("merge"), "id", "left")
                .select("id",
                        F.coalesce(F.col("n_comm"), F.col("community"))
                         .alias("community"),
                        (F.col("n_comm").isNotNull()
                         & (F.col("n_comm") != F.col("community")))
                        .alias("__chg"))
                .localCheckpoint()
            )
            stable = (stop_when_stable
                      and updated.filter("__chg").limit(1).count() == 0)
            labels = updated.drop("__chg")
            if stable:
                break
    finally:
        sym.unpersist(False)
    if with_iterations:
        return labels, it + 1
    return labels


def kcore_peel(edges: DataFrame, k: int, rounds: int = 3,
               init_candidates: DataFrame | None = None,
               until_stable: bool = False,
               with_rounds: bool = False,
               ) -> DataFrame | tuple[DataFrame, int]:
    """(id, degree): vertices surviving `rounds` synchronized peels of the
    k-core iteration, with their degree in the surviving subgraph.

    Each round removes every vertex whose current degree is below k and
    restricts the edge set to survivors — the synchronous form of k-core
    decomposition (fixed round count, so an external engine can replay it
    exactly; run more rounds for the fixpoint core). edges must hold both
    directions of each undirected pair, so per-src counts ARE degrees.

    Scale shape: per round, one degree aggregate plus two src/dst
    semi-joins, all keyed on vertex id; localCheckpoint truncates lineage
    so the plan stays flat across rounds (same Pregel discipline as CC).
    The input is checkpointed ONCE up front: round 1 otherwise computes
    the incoming edge lineage twice (once under the degree aggregate,
    once under the restricted-edge checkpoint) — measurable when the
    input is an expensive expansion like the co-occurrence pair join.

    `init_candidates` ((id) survivors of a PREVIOUS run) warm-starts the
    peel after edges were DELETED/expired (sliding-window graphs): the
    k-core only ever SHRINKS under deletions, so the old survivor set is
    a superset of the new core, and peeling restricted to any superset
    of the core reaches the exact same fixpoint (core members keep
    degree ≥ k inside the core; dropping non-candidates only peels
    non-core vertices faster). The saving: rounds scale with the old
    CORE's peel depth, not the whole graph's. Edge APPENDS can grow the
    core past the old survivors — recompute cold for those (the mirror
    of CC/SSSP warm starts, which are append-only).

    `until_stable=True` stops when a round peels nothing (`rounds` is
    then the budget; the survivor set at that point IS the k-core
    fixpoint) — one count per round on the freshly checkpointed edge
    frame. `with_rounds=True` additionally returns the round count.
    """
    e = edges.select("src", "dst").localCheckpoint()
    if init_candidates is not None:
        cand = (init_candidates.select(F.col("id").alias("src"))
                .distinct().localCheckpoint())
        e = (e.join(cand, "src", "leftsemi")
             .join(cand.withColumnRenamed("src", "dst"), "dst", "leftsemi")
             .localCheckpoint())
    # the edge count seeds the until_stable fixpoint test only — the
    # fixed-rounds path never reads it, so don't pay the count job there
    n_edges = e.count() if until_stable else -1
    done = 0
    for done in range(1, rounds + 1):
        keep = (e.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
                .filter(F.col("deg") >= k)
                .select("src").localCheckpoint())
        e = (e.join(keep, "src", "leftsemi")
             .join(keep.withColumnRenamed("src", "dst"), "dst", "leftsemi")
             .localCheckpoint())
        if until_stable:
            n_new = e.count()
            if n_new == n_edges:
                break
            n_edges = n_new
    out = (e.groupBy("src").agg(F.count(F.lit(1)).alias("degree"))
           .select(F.col("src").alias("id"), "degree"))
    if with_rounds:
        return out, done
    return out


def local_clustering(edges: DataFrame) -> DataFrame:
    """(id, degree, triangles, clustering): per-vertex local clustering
    coefficient 2·tri(v) / (deg(v)·(deg(v)−1)) — the standard
    neighborhood-density metric (Watts–Strogatz) behind community and
    spam/bot screens. edges: oriented src<dst, distinct.

    Scale shape: triangles come from ONE wedge join + closing-edge check
    on the oriented edge list (each triangle a<b<c found exactly once),
    then each triangle credits its three corners — a union + count
    keyed on vertex id. Degree is a count over the symmetrized list. No
    explicit broadcast hint: on thresholded similarity graphs AQE
    converts the join to broadcast from the measured size; on a full
    social graph the same plan shuffles on the join keys (a forced
    broadcast would OOM there) and the orientation trick still bounds
    wedge fan-out by the smaller-id endpoint's degree."""
    e = edges.select("src", "dst").localCheckpoint()
    sym = e.unionByName(
        e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    deg = (sym.groupBy(F.col("src").alias("id"))
           .agg(F.count(F.lit(1)).alias("degree")))
    ab, bc, ac = e.alias("ab"), e.alias("bc"), e.alias("ac")
    tri = (ab.join(bc, F.col("ab.dst") == F.col("bc.src"))
           .join(ac, (F.col("ac.src") == F.col("ab.src"))
                 & (F.col("ac.dst") == F.col("bc.dst")))
           .select(F.col("ab.src").alias("a"), F.col("ab.dst").alias("b"),
                   F.col("bc.dst").alias("c")))
    per_v = (tri.select(F.col("a").alias("id"))
             .unionByName(tri.select(F.col("b").alias("id")))
             .unionByName(tri.select(F.col("c").alias("id")))
             .groupBy("id").agg(F.count(F.lit(1)).alias("__t")))
    return (deg.join(per_v, "id", "left")
            .select("id", "degree",
                    F.coalesce(F.col("__t"), F.lit(0)).alias("triangles"),
                    F.when(F.col("degree") >= 2,
                           F.round(2.0 * F.coalesce(F.col("__t"), F.lit(0))
                                   / (F.col("degree")
                                      * (F.col("degree") - 1)), 6))
                     .otherwise(F.lit(0.0)).alias("clustering")))


def neighbor_mean_agg(edges: DataFrame, features: DataFrame,
                      feature_col: str, out_col: str) -> DataFrame:
    """(id, degree, <out_col>): 1-layer mean message passing
    (GraphSAGE-mean shape) — every vertex aggregates its neighbors'
    feature. ONE edge⋈feature join + one hash aggregate per layer; the
    feature table is vertex-sized, the join shuffles on the edge key.
    Stack calls for deeper receptive fields (output of layer k is the
    feature table of layer k+1)."""
    return (edges.join(features.withColumnRenamed("id", "dst"), "dst")
            .groupBy(F.col("src").alias("id"))
            .agg(F.count(F.lit(1)).alias("degree"),
                 F.round(F.sum(feature_col) / F.count(F.lit(1)), 6)
                  .alias(out_col)))
