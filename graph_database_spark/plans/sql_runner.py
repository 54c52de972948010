"""SQL script runner — the Spark analog of the reference's Cypher runners
(SURVEY §2.1 S5/S6).

- run_sql: one statement with named parameters (tp2/app/etl.py:108-119,
  `run_cypher(query, parameters)`), via Spark's parameterized spark.sql.
- run_sql_script: a `;`-separated script executed statement-by-statement,
  tolerating "already exists" (tp2/app/etl.py:122-150 splits naively on ';'
  and swallows EquivalentSchemaRuleAlreadyExists — here the analog is
  TABLE_OR_VIEW_ALREADY_EXISTS) so DDL scripts are idempotent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

_ALREADY_EXISTS_MARKERS = (
    "ALREADY_EXISTS",      # Spark error classes (TABLE_OR_VIEW_ALREADY_EXISTS …)
    "already exists",
)


def run_sql(spark: SparkSession, query: str,
            parameters: dict | None = None) -> DataFrame:
    """Run one SQL statement; `parameters` bind to :name placeholders."""
    if parameters:
        return spark.sql(query, args=parameters)
    return spark.sql(query)


def run_sql_script(spark: SparkSession, script: str,
                   tolerate_exists: bool = True) -> list[DataFrame]:
    """Execute a `;`-separated script; returns the result of each statement.

    Mirrors the reference's naive split (statements must not embed literal
    semicolons — same limitation as tp2/app/etl.py:135) and its idempotent
    'already exists' tolerance.
    """
    results: list[DataFrame] = []
    for stmt in (s.strip() for s in script.split(";")):
        if not stmt:
            continue
        try:
            results.append(spark.sql(stmt))
        except Exception as exc:  # noqa: BLE001 — classify then re-raise
            msg = str(exc)
            if tolerate_exists and any(m in msg for m in _ALREADY_EXISTS_MARKERS):
                continue
            raise
    return results
