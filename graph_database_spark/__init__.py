"""graph_database_spark — a PySpark-native analytics engine.

Brand-new implementation of the query/data-processing capabilities of the
reference repo ArthurrMrv/graph_database (e-commerce graph recommendation
workload: co-occurrence, customer-overlap similarity, PageRank), expressed
Spark-first: DataFrame/SQL logical plans optimized by Catalyst, a driver-side
Pregel loop only where iteration is genuinely required, and Structured
Streaming for the append-only events surface.

Layout:
  session      -- SparkSession bootstrap tuned for local[32] and scale-out
  sources      -- typed loaders (driver parquet testdata + reference toy seed)
  operators    -- relational building blocks (co-occurrence, weights, top-k,
                  similarity, dedup, ANN, text analysis, multimodal plumbing)
  graphs       -- property-graph builder + PageRank (exact reference semantics)
  recommend    -- the composite recommendation pipelines (Q1/Q2/Q3/Q4/Q5)
  streaming    -- Structured Streaming event-weight pipeline
"""

__version__ = "0.1.0"
