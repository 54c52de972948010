"""Customer-overlap similarity (SURVEY §2.3 J3/J4/J5).

Three reference strategies over the bipartite incidence pairs:

- Jaccard product similarity (tp1 `_similarity_scores`,
  tp1/knoledge_graphs/recommendation.py:114-133): for product pairs,
  |customers(A) ∩ customers(B)| / |union|; zero-intersection pairs skipped.
- User-based CF counting (tp2 Cypher, tp2/app/main.py:144-154): c1→p1,
  c2→p1, c2→p2, c1<>c2, p1<>p2 → count(DISTINCT c2) per p2. Note the
  reference does NOT exclude products c1 already touched (SURVEY §7.3).
- Seed-expansion co-occurrence scores (tp1 `_co_occurrence_scores`,
  recommendation.py:105-112): Σ co-occurrence counts from seed products to
  neighbors, seeds excluded.

Spark-first: set intersections become a self equi-join on customer_id with
map-side pair aggregation — never collect_set into driver memory. The
self-join key (customer_id) is the skew axis at 100 TB (power users);
AQE skew-join splitting plus an optional per-customer product cap handle it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def product_customer_counts(incidence: DataFrame) -> DataFrame:
    """|customers(p)| per product — the Jaccard denominator input."""
    return incidence.groupBy("product_id").agg(
        F.count(F.lit(1)).alias("n_customers"))


def cap_products_per_customer(incidence: DataFrame, m: int) -> DataFrame:
    """Deterministic per-customer truncation: keep each customer's first m
    products (product_id asc — stable, data-independent tie-break).

    This is THE scale guard for the customer-keyed self-join: one power
    customer with k products otherwise contributes k² pair rows, and AQE
    skew-splitting can spread but not shrink that quadratic output. The
    same top-m-per-entity truncation pattern bounds recommend_batch's
    expansion join (registry top-30 neighbors).
    """
    w = Window.partitionBy("customer_id").orderBy(F.asc("product_id"))
    return (incidence
            .withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= m)
            .drop("__rn"))


def jaccard_pairs(incidence: DataFrame,
                  broadcast_sizes: bool = False,
                  max_products_per_customer: int | None = None) -> DataFrame:
    """(src, dst, intersection, jaccard) for product pairs sharing ≥1 customer.

    incidence must be DISTINCT (customer_id, product_id) — set semantics
    (tp1 graph.py:25-26). Output has src < dst; mirror for the symmetric view.

    Pass broadcast_sizes=True when |products| is known-small and the
    incidence frame is checkpointed (no Catalyst stats): the two
    denominator joins then broadcast the per-product counts instead of
    shuffling the pair table twice.

    max_products_per_customer caps the quadratic self-join fan-out per
    customer (see cap_products_per_customer); the Jaccard is then computed
    over the capped incidence (both intersection AND sizes), i.e. the
    well-defined similarity of the truncated sets.
    """
    if max_products_per_customer is not None:
        incidence = cap_products_per_customer(
            incidence, max_products_per_customer)
    a, b = incidence.alias("a"), incidence.alias("b")
    inter = (
        a.join(b, on=(F.col("a.customer_id") == F.col("b.customer_id"))
               & (F.col("a.product_id") < F.col("b.product_id")))
        .groupBy(F.col("a.product_id").alias("src"),
                 F.col("b.product_id").alias("dst"))
        .agg(F.count(F.lit(1)).alias("intersection"))
    )
    sizes = product_customer_counts(incidence)
    if broadcast_sizes:
        sizes = F.broadcast(sizes)
    return (
        inter
        .join(sizes.withColumnRenamed("product_id", "src")
                   .withColumnRenamed("n_customers", "n_src"), "src")
        .join(sizes.withColumnRenamed("product_id", "dst")
                   .withColumnRenamed("n_customers", "n_dst"), "dst")
        .select(
            "src", "dst", "intersection",
            (F.col("intersection")
             / (F.col("n_src") + F.col("n_dst") - F.col("intersection"))
             ).alias("jaccard"),
        )
    )


def user_cf_scores(incidence: DataFrame, customer_id) -> DataFrame:
    """tp2's 3-hop collaborative filter for one customer (main.py:144-154).

    Cypher: MATCH (c1)-->(p1)<--(c2)-->(p2) WHERE c1<>c2 AND p1<>p2
            RETURN p2, count(DISTINCT c2).

    The `p1 <> p2` predicate is PER PATH: a (c2, p2) pair qualifies iff c2
    shares at least one product p1 with c1 *other than p2 itself* — i.e.
    |products(c1) ∩ products(c2) \\ {p2}| > 0. The reference does NOT
    exclude products c1 already touched (SURVEY §7.3), so a global
    anti-join against the seed set would be wrong.

    Returns (product_id, cf_count) = count(DISTINCT c2) per p2.
    """
    seeds = incidence.filter(F.col("customer_id") == F.lit(customer_id)) \
        .select(F.col("product_id").alias("p1"))
    # |products(c1) ∩ products(c2)| per co-customer c2
    shared = (
        incidence.join(F.broadcast(seeds),
                       incidence["product_id"] == seeds["p1"])
        .filter(F.col("customer_id") != F.lit(customer_id))
        .groupBy(F.col("customer_id").alias("c2"))
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    # candidate (c2, p2) rows, flagging whether p2 is itself a seed: the
    # path count supporting (c2, p2) is n_shared minus 1 if p2 ∈ seeds∩products(c2)
    cands = (
        incidence.withColumnRenamed("customer_id", "c2")
        .withColumnRenamed("product_id", "p2")
        .join(shared, "c2")
        .join(F.broadcast(seeds.withColumn("__is_seed", F.lit(1))),
              F.col("p2") == F.col("p1"), "left")
        .filter(F.col("n_shared") > F.coalesce(F.col("__is_seed"), F.lit(0)))
    )
    return (
        cands.groupBy(F.col("p2").alias("product_id"))
        .agg(F.countDistinct("c2").alias("cf_count"))
    )


def seed_expansion_scores(cooc_sym: DataFrame, seeds: DataFrame) -> DataFrame:
    """tp1 `_co_occurrence_scores` (recommendation.py:105-112).

    cooc_sym: symmetric (src, dst, count); seeds: (product_id). Score each
    non-seed neighbor by Σ counts from all seeds. seeds is small → broadcast.
    """
    return (
        cooc_sym.join(F.broadcast(seeds),
                      cooc_sym["src"] == seeds["product_id"])
        .drop("product_id")
        .join(F.broadcast(seeds),
              cooc_sym["dst"] == seeds["product_id"], "left_anti")
        .groupBy(F.col("dst").alias("product_id"))
        .agg(F.sum("count").alias("score"))
    )


def seed_expansion_scores_from_items(items: DataFrame, seeds: DataFrame,
                                     order_col: str = "order_id",
                                     product_col: str = "product_id"
                                     ) -> DataFrame:
    """Seed expansion with the seed predicate pushed BELOW the pair build.

    Equivalent to `seed_expansion_scores(cooccurrence_ordered(items), seeds)`
    but never materializes the full co-occurrence table: since
    score(dst) = Σ_{src∈seeds} |orders containing src and dst|, the seed
    filter commutes with the pair aggregation, so the LEFT side of the
    order self-join is semi-joined to seeds first. Catalyst cannot derive
    this itself (seeds is a runtime relation behind an aggregation), so
    the operator encodes it structurally.

    Plan shape at scale: items⋉seeds is |seeds| · avg-orders-per-product
    rows — small enough to BROADCAST against the full items table, so the
    100 TB side is scanned once with no shuffle; the only shuffle left is
    the final groupBy over ≤|products| keys.
    """
    seeds1 = seeds.select(F.col(seeds.columns[0]).alias(product_col))
    # PK(order, product) invariant, as in cooccurrence._item_pairs: a
    # product appearing on several lines of one order counts once.
    base = items.select(order_col, product_col).distinct()
    seed_items = (
        base.join(F.broadcast(seeds1), product_col)
        .select(F.col(order_col).alias("__o"),
                F.col(product_col).alias("__src"))
    )
    return (
        base.join(F.broadcast(seed_items),
                  (F.col(order_col) == F.col("__o"))
                  & (F.col(product_col) != F.col("__src")))
        .join(F.broadcast(seeds1), product_col, "left_anti")
        .groupBy(F.col(product_col).alias("product_id"))
        .agg(F.count(F.lit(1)).alias("score"))
    )
