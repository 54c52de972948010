"""The composite recommendation engine (SURVEY §2.11 Q1/Q2).

Re-implements tp1's RecommendationEngine (tp1/knoledge_graphs/
recommendation.py) over DataFrames, preserving the observed semantics:

- derived structures from build_graph (tp1/knoledge_graphs/graph.py:42-86):
  symmetric unordered co-occurrence, incidence sets from orders ∪ events,
  summed event weights, row-normalized adjacency over ALL catalog products.
- `purchased` = customer_products[cid] — products touched via orders OR
  events (graph.py:55-66), not just order lines. `interacted` = event
  products with weight > 0 (recommendation.py:97-103).
- seeds = purchased if non-empty else interacted (the Python `or`,
  recommendation.py:48-50 — an if/else on emptiness, NOT a union).
- empty seeds → global-PageRank fallback (recommendation.py:224-229).
- per-strategy scores (co-occurrence expansion, summed Jaccard, PPR),
  max-normalized BEFORE exclusion (recommendation.py:54-64), combined
  0.4/0.3/0.3 with `value <= 0` contributions dropped and
  purchased ∪ interacted excluded (recommendation.py:198-222).
- strategy_breakdown returns RAW scores, top-n with exclusion
  (recommendation.py:70-89).

Scale posture: every structure is a DataFrame; per-customer calls filter
distributed data (fine for serving parity), while `recommend_batch` in the
registry and `pagerank_batch` are the 100 TB-idiomatic all-customers forms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..graphs.pagerank import pagerank
from ..operators.cooccurrence import (
    cooccurrence_unordered, row_normalized_adjacency, symmetrize,
)
from ..operators.incidence import incidence_pairs, order_incidence
from ..operators.normalize import max_normalize
from ..operators.similarity import seed_expansion_scores
from ..operators.weights import event_weights

# tp1/knoledge_graphs/recommendation.py:10-14
STRATEGY_WEIGHTS = {
    "co_occurrence": 0.4,
    "similarity": 0.3,
    "personalized_pagerank": 0.3,
}


class SparkRecommendationEngine:
    """tables: customers/products/orders/order_items/events (toy schema,
    sources.toy). All derived structures are cached DataFrames — the Spark
    analog of tp1's eager build at module import (tp1/main.py:7-10)."""

    def __init__(self, spark: SparkSession, tables: dict[str, DataFrame],
                 damping: float = 0.85, tolerance: float = 1e-6,
                 max_iterations: int = 50, num_partitions: int = 8):
        self.spark = spark
        self.tables = tables
        self.damping = damping
        self.tolerance = tolerance
        self.max_iterations = max_iterations
        self.n_parts = num_partitions

        self.cooc = symmetrize(
            cooccurrence_unordered(tables["order_items"])).cache()
        order_pairs = order_incidence(tables["orders"], tables["order_items"])
        self.incidence = incidence_pairs(
            order_pairs, tables["events"]).cache()
        self.event_weights = event_weights(tables["events"]).cache()
        self.adjacency = row_normalized_adjacency(self.cooc).cache()
        self.products = tables["products"].select("id").cache()
        self.global_pagerank = pagerank(
            self.products, self.adjacency,
            damping=damping, tol=tolerance, max_iter=max_iterations,
            num_partitions=num_partitions,
        ).cache()

    # -- helpers (names mirror the reference for auditability) -----------

    def _ensure_known_customer(self, customer_id: str) -> None:
        """P2: raise ValueError on unknown id (recommendation.py:93-95)."""
        known = self.tables["customers"].filter(
            F.col("id") == F.lit(customer_id)).isEmpty()
        if known:
            raise ValueError(f"Unknown customer: {customer_id}")

    def _touched_products(self, customer_id: str) -> DataFrame:
        """customer_products[cid]: orders ∪ events (graph.py:55-66)."""
        return (self.incidence
                .filter(F.col("customer_id") == F.lit(customer_id))
                .select("product_id"))

    def _interacted_products(self, customer_id: str) -> DataFrame:
        """event products with summed weight > 0 (recommendation.py:97-103)."""
        return (self.event_weights
                .filter((F.col("customer_id") == F.lit(customer_id))
                        & (F.col("weight") > 0))
                .select("product_id"))

    def _seed_context(self, customer_id: str) \
            -> tuple[DataFrame, DataFrame, DataFrame]:
        """(purchased, interacted, seeds). SE3: seeds = purchased if
        non-empty, else interacted — an emptiness if/else, not a union
        (recommendation.py:48-50); purchased/interacted are also needed
        separately for the exclusion union (SE4)."""
        purchased = self._touched_products(customer_id)
        interacted = self._interacted_products(customer_id)
        seeds = purchased if not purchased.isEmpty() else interacted
        return purchased, interacted, seeds

    def _co_occurrence_scores(self, seeds: DataFrame) -> DataFrame:
        """(product_id, score): Σ co-occurrence counts from seeds, seeds
        excluded (recommendation.py:105-112)."""
        return (seed_expansion_scores(self.cooc, seeds)
                .select("product_id", F.col("score").cast("double").alias("score")))

    def _similarity_scores(self, seeds: DataFrame) -> DataFrame:
        """(product_id, score): Σ_seeds jaccard(customers(seed),
        customers(candidate)), zero-intersection pairs contributing nothing,
        candidates restricted to non-seed products with ≥1 customer
        (recommendation.py:114-133)."""
        sizes = self.incidence.groupBy("product_id").agg(
            F.count(F.lit(1)).alias("n"))
        seed_inc = (
            self.incidence.join(F.broadcast(seeds), "product_id", "left_semi")
            .withColumnRenamed("product_id", "seed"))
        cand_inc = self.incidence.join(
            F.broadcast(seeds), "product_id", "left_anti")
        inter = (
            seed_inc.join(cand_inc, "customer_id")
            .groupBy("seed", "product_id")
            .agg(F.count(F.lit(1)).alias("i")))
        return (
            inter
            .join(sizes.withColumnRenamed("product_id", "seed")
                       .withColumnRenamed("n", "n_seed"), "seed")
            .join(sizes.withColumnRenamed("n", "n_cand"), "product_id")
            .withColumn("jac", F.col("i")
                        / (F.col("n_seed") + F.col("n_cand") - F.col("i")))
            .groupBy("product_id")
            .agg(F.sum("jac").alias("score"))
            .filter(F.col("score") > 0)
        )

    def _personalized_pagerank(self, seeds: DataFrame) -> DataFrame:
        """(product_id, score): PPR with uniform 1/|seeds| personalization
        (recommendation.py:135-142)."""
        pers = seeds.select(F.col("product_id").alias("id"),
                            F.lit(1.0).alias("p"))  # normalized inside
        ranks = pagerank(self.products, self.adjacency, personalization=pers,
                         damping=self.damping, tol=self.tolerance,
                         max_iter=self.max_iterations,
                         num_partitions=self.n_parts)
        return ranks.select(F.col("id").alias("product_id"),
                            F.col("rank").alias("score"))

    # -- public API -------------------------------------------------------

    def recommend_for_customer(self, customer_id: str,
                               top_n: int = 3) -> DataFrame:
        """Q1 (recommendation.py:44-68). Returns (product_id, score,
        co_occurrence, similarity, personalized_pagerank, global_pagerank)
        — one column per possible contribution (recommendation.py:18-23's
        `contributions` mapping), null when the strategy contributed
        nothing; global_pagerank is non-null only on the empty-seeds
        fallback (recommendation.py:224-228). Both branches share this
        schema so per-customer results union cleanly."""
        self._ensure_known_customer(customer_id)
        purchased, interacted, seeds = self._seed_context(customer_id)
        if seeds.isEmpty():
            top = (self.global_pagerank
                   .orderBy(F.desc("rank"), F.asc("id")).limit(top_n))
            return top.select(
                F.col("id").alias("product_id"),
                F.col("rank").alias("score"),
                F.lit(None).cast("double").alias("co_occurrence"),
                F.lit(None).cast("double").alias("similarity"),
                F.lit(None).cast("double").alias("personalized_pagerank"),
                F.col("rank").alias("global_pagerank"),
            )

        strategies = {
            "co_occurrence": max_normalize(self._co_occurrence_scores(seeds)),
            "similarity": max_normalize(self._similarity_scores(seeds)),
            "personalized_pagerank": max_normalize(
                self._personalized_pagerank(seeds)),
        }
        exclude = purchased.unionByName(interacted).distinct()

        combined = None
        for name, scores in strategies.items():
            weight = STRATEGY_WEIGHTS.get(name, 0.0)
            contrib = (
                scores
                .filter(F.col("score") > 0)  # value<=0 dropped (.py:209)
                .join(exclude, "product_id", "left_anti")
                .select("product_id",
                        (F.col("score") * F.lit(weight)).alias(name))
            )
            combined = contrib if combined is None else \
                combined.join(contrib, "product_id", "full_outer")

        score = sum(
            (F.coalesce(F.col(n), F.lit(0.0)) for n in STRATEGY_WEIGHTS),
            F.lit(0.0),
        )
        return (
            combined.withColumn("score", score)
            .orderBy(F.desc("score"), F.asc("product_id"))
            .limit(top_n)
            .select("product_id", "score", *STRATEGY_WEIGHTS,
                    F.lit(None).cast("double").alias("global_pagerank"))
        )

    def strategy_breakdown(self, customer_id: str,
                           top_n: int = 3) -> dict[str, DataFrame]:
        """Q2 (recommendation.py:70-89): RAW per-strategy scores, top-n
        with exclusion; empty seeds → {"global_pagerank": top-n}."""
        self._ensure_known_customer(customer_id)
        purchased, interacted, seeds = self._seed_context(customer_id)
        if seeds.isEmpty():
            return {"global_pagerank": (
                self.global_pagerank
                .select(F.col("id").alias("product_id"),
                        F.col("rank").alias("score"))
                .orderBy(F.desc("score"), F.asc("product_id")).limit(top_n))}

        exclude = purchased.unionByName(interacted).distinct()
        out = {}
        for name, scores in {
            "co_occurrence": self._co_occurrence_scores(seeds),
            "similarity": self._similarity_scores(seeds),
            "personalized_pagerank": self._personalized_pagerank(seeds),
        }.items():
            out[name] = (
                scores.join(exclude, "product_id", "left_anti")
                .orderBy(F.desc("score"), F.asc("product_id")).limit(top_n))
        return out
