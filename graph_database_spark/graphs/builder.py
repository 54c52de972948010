"""Property-graph builder — the ETL-equivalent of tp2's Postgres→Neo4j load
(SURVEY §3.2, tp2/app/etl.py:167-332), re-expressed as set-at-a-time Spark
jobs instead of one Bolt round-trip per row.

Shape (tp2/app/etl.py:176-184):
- vertices(id, label, name, price, join_date, ts) for Category / Product /
  Customer / Order nodes (absent props null).
- edges(src, dst, rel_type, quantity, ts, event_id) for IN_CATEGORY /
  PLACED / CONTAINS / VIEWED / CLICKED / ADDED_TO_CART.

Semantics preserved:
- MERGE upserts → last-write-wins dedupe by natural key (etl.py:295-296,
  320-321 `SET` overwrites) via a row_number window ordered by the recency
  column descending.
- Cypher MATCH+MERGE drops FK-orphans silently (inner-join semantics,
  etl.py:240-242,274) → edges are built with INNER joins to the endpoint
  tables.
- dynamic event edge types: event_type → rel_type column via a literal map,
  unknown types default to VIEWED (etl.py:307-314). A rel_type COLUMN, not
  a type system — the idiomatic columnar answer to Neo4j's dynamic labels.
- Neo4j uniqueness constraints (queries.cypher:2-9) have no Spark analog;
  `assert_unique` is the data-quality assertion replacing them.

Ids are prefixed per label so the union'd vertex table has a global key.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import DataFrame, Window, functions as F

# tp2/app/etl.py:307-311; unknown → VIEWED (etl.py:314)
EVENT_REL_TYPES = {
    "view": "VIEWED",
    "click": "CLICKED",
    "add_to_cart": "ADDED_TO_CART",
}


def _lww(df: DataFrame, keys: list[str], order_col: str,
         tiebreak: list[str] | None = None) -> DataFrame:
    """Last-write-wins dedupe: keep the latest row per natural key —
    MERGE ... SET semantics (tp2/app/etl.py:295-296).

    `tiebreak` makes the winner deterministic when `order_col` ties
    (dirty data can repeat the recency key); without it, row_number
    picks an engine-dependent row and results aren't reproducible.
    """
    order = [F.desc(order_col)] + [F.desc(c) for c in (tiebreak or [])]
    w = Window.partitionBy(*keys).orderBy(*order)
    return (df.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") == 1).drop("__rn"))


def rel_type_col(event_type, default: str = "VIEWED"):
    mapping = F.create_map(
        *[F.lit(x) for x in chain.from_iterable(EVENT_REL_TYPES.items())])
    return F.coalesce(F.element_at(mapping, event_type), F.lit(default))


def _vtx(df: DataFrame, label: str, id_col, name=None, price=None,
         join_date=None, ts=None) -> DataFrame:
    return df.select(
        F.concat(F.lit(label), F.lit(":"), id_col.cast("string")).alias("id"),
        F.lit(label).alias("label"),
        (name if name is not None else F.lit(None).cast("string")).alias("name"),
        (price if price is not None else F.lit(None).cast("double")).alias("price"),
        (join_date if join_date is not None else F.lit(None).cast("date")).alias("join_date"),
        (ts if ts is not None else F.lit(None).cast("timestamp")).alias("ts"),
    ).distinct()


def build_vertices(customers: DataFrame, categories: DataFrame,
                   products: DataFrame, orders: DataFrame) -> DataFrame:
    """Union of the four node tables (stage order Categories→Products→
    Customers→Orders, tp2/app/etl.py:211-218 — order is irrelevant under
    set-at-a-time construction)."""
    return (
        _vtx(categories, "Category", F.col("id"), name=F.col("name"))
        .unionByName(_vtx(products, "Product", F.col("id"),
                          name=F.col("name"), price=F.col("price")))
        .unionByName(_vtx(customers, "Customer", F.col("id"),
                          name=F.col("name"), join_date=F.col("join_date")))
        .unionByName(_vtx(orders, "Order", F.col("id"), ts=F.col("ts")))
    )


def build_edges(products: DataFrame, categories: DataFrame,
                customers: DataFrame, orders: DataFrame,
                order_items: DataFrame,
                events: DataFrame | None = None,
                item_recency_col: str | None = None) -> DataFrame:
    """FK-validated edge table (inner joins drop orphans, matching Cypher
    MATCH+MERGE, tp2/app/etl.py:240-242,274)."""

    def eid(label: str, col) -> F.Column:
        return F.concat(F.lit(label), F.lit(":"), col.cast("string"))

    in_category = (
        products.join(categories.select(F.col("id").alias("__cat")),
                      products["category_id"] == F.col("__cat"))
        .select(eid("Product", F.col("id")).alias("src"),
                eid("Category", F.col("__cat")).alias("dst"),
                F.lit("IN_CATEGORY").alias("rel_type"),
                F.lit(None).cast("int").alias("quantity"),
                F.lit(None).cast("timestamp").alias("ts"),
                F.lit(None).cast("string").alias("event_id"))
    )
    placed = (
        orders.join(customers.select(F.col("id").alias("__c")),
                    orders["customer_id"] == F.col("__c"))
        .select(eid("Customer", F.col("__c")).alias("src"),
                eid("Order", orders["id"]).alias("dst"),
                F.lit("PLACED").alias("rel_type"),
                F.lit(None).cast("int").alias("quantity"),
                F.lit(None).cast("timestamp").alias("ts"),
                F.lit(None).cast("string").alias("event_id"))
    )
    items = order_items
    if item_recency_col is not None:
        items = _lww(items, ["order_id", "product_id"], item_recency_col,
                     tiebreak=["quantity"])
    contains = (
        items
        .join(orders.select(F.col("id").alias("__o")),
              items["order_id"] == F.col("__o"))
        .join(products.select(F.col("id").alias("__p")),
              items["product_id"] == F.col("__p"))
        .select(eid("Order", F.col("__o")).alias("src"),
                eid("Product", F.col("__p")).alias("dst"),
                F.lit("CONTAINS").alias("rel_type"),
                F.col("quantity").cast("int").alias("quantity"),
                F.lit(None).cast("timestamp").alias("ts"),
                F.lit(None).cast("string").alias("event_id"))
    )
    out = in_category.unionByName(placed).unionByName(contains)

    if events is not None:
        # MERGE on (customer, rel_type, product) then SET ts/event_id ⇒
        # last-write-wins per (src, rel_type, dst) (tp2/app/etl.py:316-328)
        ev = (
            events
            .join(customers.select(F.col("id").alias("__c")),
                  events["customer_id"] == F.col("__c"))
            .join(products.select(F.col("id").alias("__p")),
                  events["product_id"] == F.col("__p"))
            .select(eid("Customer", F.col("__c")).alias("src"),
                    eid("Product", F.col("__p")).alias("dst"),
                    rel_type_col(F.col("event_type")).alias("rel_type"),
                    F.lit(None).cast("int").alias("quantity"),
                    F.col("ts"),
                    events["id"].cast("string").alias("event_id"))
        )
        # event_id tiebreak: equal-ts events would otherwise pick a
        # partitioning-dependent winner (see _lww's docstring warning)
        ev = _lww(ev, ["src", "rel_type", "dst"], "ts",
                  tiebreak=["event_id"])
        out = out.unionByName(ev)
    return out


def assert_unique(df: DataFrame, keys: list[str]) -> None:
    """Replacement for Neo4j uniqueness constraints (queries.cypher:2-9):
    raise if any natural key repeats."""
    dupes = (df.groupBy(*keys).count().filter(F.col("count") > 1))
    sample = dupes.take(5)
    if sample:
        raise ValueError(f"uniqueness violated on {keys}: {sample}")
