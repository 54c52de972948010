"""Fleet-wide physical-plan audit: explain EVERY registry entry and flag
scale smells the per-query pins in tests/test_plans.py don't cover.

Rules (each finding is (rule, detail)):
  cartesian        — a CartesianProduct node (non-broadcast cross join):
                     never acceptable; at scale this is |A|x|B| shuffle IO.
  nlj-non-cross    — BroadcastNestedLoopJoin with a join type other than
                     Cross: Spark's fallback for a non-equi join predicate.
                     Fine only when the broadcast side is provably tiny
                     (1-row aggregates use Cross; anything else must be
                     allowlisted with a reason).
  global-sort      — Exchange rangepartitioning outside a top-k
                     (TakeOrderedAndProject handles those): a total order
                     of the corpus never survives 100 TB.
  unpruned-scan    — a parquet scan whose ReadSchema carries EVERY column
                     of a wide (>=5-col) table: column pruning failed or
                     the operator genuinely needs the full row (allowlist
                     with the reason).
  exchange-storm   — more than MAX_EXCHANGES shuffles in one plan: usually
                     a missed reuse or a join that should broadcast.
                     (Iterative entries checkpoint per superstep, so only
                     their FINAL frame's plan is visible here — their
                     per-iteration shape is pinned separately.)

Run:  python scripts/plan_audit.py            (writes PLAN_AUDIT.json)
Exit: 0 when every finding is allowlisted, 1 otherwise.
"""

from __future__ import annotations

import json
import re
import sys

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.001"
MAX_EXCHANGES = 14

# full column counts of the driver tables (TESTDATA.md); scans reading
# every column of a >=5-col table are flagged
TABLE_WIDTHS = {"lineitem": 11, "orders": 6, "events": 6, "part": 6,
                "documents": 5, "customer": 5, "supplier": 4,
                "embeddings": 3, "nation": 3, "region": 2}
WIDE = {t for t, w in TABLE_WIDTHS.items() if w >= 5}

# entry -> {(rule, detail)} with the justification in the comment.
# exchange-storm allowances are multi-arm COMPOSITES: the count is over
# the whole DAG, every individual arm is pinned lean in tests/test_plans
# and each exchange moves an arm-local (k-row / aggregate-sized) frame.
ALLOWED: dict[str, set[tuple[str, str]]] = {
    # ANALYZE-style profiling reads every column BY DESIGN
    "orders_profile": {("unpruned-scan", "orders")},
    # curation composite consumes every documents column (text + lang +
    # source + n_chars feed the quality gates, doc_id keys the output)
    "documents_curated": {("unpruned-scan", "documents")},
    # Q1 composite: three strategy arms + max-normalize + blend + exclusion
    "recommend_focal_blend": {("exchange-storm", "*")},
    # banding (per-table buckets) + exact-Jaccard verify + survivor pick
    "dedup_minhash_lsh": {("exchange-storm", "*")},
    "dedup_incremental_minhash": {("exchange-storm", "*")},
    # shingle tf + df guard + candidate join + verify
    "dedup_ngram_jaccard": {("exchange-storm", "*")},
    # four ranking arms (full + 3 prefix dims), each top-k + recall agg
    "embedding_truncation_recall": {("exchange-storm", "*")},
    # pooled-quantile lookup is a histogram x histogram inequality join —
    # both sides are bounded-bin aggregates, never corpus-sized
    "doc_quality_quantile_norm": {("nlj-non-cross", "Inner")},
}


def _formatted(df) -> str:
    spark = df.sparkSession
    return df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))


def _scan_findings(plan: str) -> list[tuple[str, str]]:
    """Pair each ReadSchema with its scan's table (from the Location
    detail line) and flag full-width reads of wide tables."""
    out = []
    loc = None
    for line in plan.split("\n"):
        if "Location:" in line:
            m = re.search(r"/(\w+)\.parquet", line)
            loc = m.group(1) if m else None
        elif "ReadSchema:" in line and loc in WIDE:
            n_cols = len(re.findall(r"[<,](\w+):", line))
            if n_cols >= TABLE_WIDTHS[loc]:
                out.append(("unpruned-scan", loc))
    return out


def audit_plan(plan: str) -> list[tuple[str, str]]:
    findings: list[tuple[str, str]] = []
    if "CartesianProduct" in plan:
        findings.append(("cartesian", ""))
    for line in plan.split("\n"):
        m = re.search(r"BroadcastNestedLoopJoin (\w+)", line)
        if m and m.group(1) != "Cross":
            findings.append(("nlj-non-cross", m.group(1)))
    if "Exchange rangepartitioning" in plan:
        findings.append(("global-sort", ""))
    n_ex = len(re.findall(r"\(\d+\) Exchange", plan))
    if n_ex > MAX_EXCHANGES:
        findings.append(("exchange-storm", str(n_ex)))
    findings.extend(_scan_findings(plan))
    return sorted(set(findings))


def main() -> int:
    from graph_database_spark.registry import QUERIES
    from graph_database_spark.session import get_spark

    spark = get_spark("plan-audit", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")

    report, bad = {}, {}
    for name, fn in QUERIES.items():
        try:
            findings = audit_plan(_formatted(fn(spark, SF_DIR)))
        except Exception as exc:  # surface, don't mask
            findings = [("error", str(exc)[:120])]
        if findings:
            report[name] = findings
        allowed = ALLOWED.get(name, set())
        extra = [f for f in findings
                 if f not in allowed and (f[0], "*") not in allowed]
        if extra:
            bad[name] = extra

    with open("/root/repo/PLAN_AUDIT.json", "w") as fh:
        json.dump({"checked": len(QUERIES),
                   "flagged": report,
                   "unexplained": bad}, fh, indent=1, default=list)
    print(f"audited {len(QUERIES)} plans; "
          f"{len(report)} flagged, {len(bad)} unexplained")
    for name, f in bad.items():
        print("UNEXPLAINED", name, f)
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
