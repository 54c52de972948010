"""Query registry: name → (Spark callable, DuckDB oracle SQL).

Every operator from SURVEY.md §2 that is implemented gets an entry here;
`__spark_entry__.queries()` / `oracle_sql()` re-export these dicts. Each
Spark callable takes (spark, sf_dir) and returns a DataFrame over the
driver testdata tables (TESTDATA.md); the oracle is ANSI SQL DuckDB runs
on the same parquet.

The definitions live in the per-domain modules under `queries/`
(relational / events / graph / recommend / dedup_ann / text) — this
module is the stable import surface (`from ..registry import QUERIES`)
and re-exports the assembled, window-ordered dicts.

Hash-stability conventions (the driver compares row-count + schema +
order-insensitive value-hash):
- integer aggregates: CAST to BIGINT in SQL (DuckDB SUM(BIGINT)→HUGEINT).
- double sums over data columns: sum DECIMAL(18,4) (exact, order-free)
  then ROUND + CAST AS DOUBLE on both sides.
- ratios: integer-derived doubles rounded to 6dp on both sides.
- every computed column aliased identically on both sides.
"""

from __future__ import annotations

from .queries import (  # noqa: F401
    AB_ORACLES, AB_QUERIES, ORACLES, QUERIES, QueryFn, register,
    register_ab, _DRIVER_WINDOW_PRIORITY,
)
