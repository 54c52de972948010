"""Streaming property-graph updates: the events stream as live edges.

The reference replays its whole ETL to refresh the graph
(tp2/README.md:479-484 frames re-running `etl.py` as "replaying"
events); its event edges land one Bolt round-trip at a time
(tp2/app/etl.py:313-328). This module is the streaming-native
replacement: `readStream` over the append-only events surface →
stream-static joins against the dimension tables (FK validation, same
inner-join orphan-dropping as Cypher MATCH) → watermarked streaming
dedup per edge key → append sink.

Semantics note: batch MERGE is last-write-wins per (src, rel_type, dst)
(builder._lww). An append-only stream can't retract an already-emitted
edge, so the streaming form keeps the FIRST event per key within the
watermark horizon (`dropDuplicatesWithinWatermark`) and relies on the
downstream LWW compaction (builder) at read time for exact batch parity
— the standard lambda split: cheap streaming dedup bounds state, the
batch view stays authoritative.

Scale: stream-static joins broadcast the dimension side per micro-batch;
dedup state is keyed by (src, rel_type, dst) and expires at the
watermark, so state size is bounded by the horizon's distinct-edge count,
not the stream length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..graphs.builder import rel_type_col


def event_edges_stream(events: DataFrame, customers: DataFrame,
                       products: DataFrame,
                       watermark: str = "1 hour") -> DataFrame:
    """events: STREAMING (customer_id, product_id, event_type, ts, id);
    customers/products: static dims. Returns the streaming edge frame
    (src, dst, rel_type, ts, event_id), FK-validated and deduped per
    edge key within the watermark."""
    ev = events.withWatermark("ts", watermark)
    validated = (
        ev.join(F.broadcast(customers.select(F.col("id").alias("__c"))),
                ev["customer_id"] == F.col("__c"))
        .join(F.broadcast(products.select(F.col("id").alias("__p"))),
              ev["product_id"] == F.col("__p"))
        .select(
            F.concat(F.lit("Customer:"), F.col("__c").cast("string"))
             .alias("src"),
            F.concat(F.lit("Product:"), F.col("__p").cast("string"))
             .alias("dst"),
            rel_type_col(F.col("event_type")).alias("rel_type"),
            F.col("ts"),
            F.col("id").cast("string").alias("event_id"),
        )
    )
    return validated.dropDuplicatesWithinWatermark(["src", "rel_type", "dst"])
