"""Dump explain('formatted') for the r12-touched graph-family queries.

Iterative loops truncate lineage per superstep (localCheckpoint), so the
final DataFrame's plan only shows checkpoint scans. To expose the
superstep plans — where the edge pin vs row-format checkpoint difference
lives — we wrap DataFrame.localCheckpoint and record the plan of every
frame at the moment it is checkpointed (first N per query), then the
final plan.

Usage: python dump_r12_plans.py <repo_root> <suffix>
Writes /root/repo/plans/r12/<query>_<suffix>.txt
"""
import os
import re
import sys

repo, suffix = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)

SF_DIR = "/root/testdata/sf0.001"
OUT = "/root/repo/plans/r12"
HEAD_PLANS, TAIL_PLANS = 4, 2
NAMES = [
    "pagerank_global", "pagerank_fixed20", "pagerank_converged_check",
    "ppr_batch_focal", "ppr_fixed20_batch", "ppr_converged_check",
    "hits_fixed10", "graph_hyperanf_nf", "graph_hyperanf_diameter",
    "connected_components", "connected_components_star",
    "graph_lpa_communities",
]

os.makedirs(OUT, exist_ok=True)

from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from graph_database_spark.session import get_spark  # noqa: E402
from graph_database_spark.registry import QUERIES  # noqa: E402

spark = get_spark("plans-r12")
spark.sparkContext.setLogLevel("ERROR")


def fmt(df):
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    plan = re.sub(r" \[codegen id : \d+\]", "", plan)
    # keep only the tree + operator details, drop nothing else
    return plan.rstrip()


captured = []
_orig_ckpt = DataFrame.localCheckpoint
_orig_persist = DataFrame.persist


def _ckpt(self, eager=True):
    captured.append(("localCheckpoint", fmt(self)))
    return _orig_ckpt(self, eager)


def _persist(self, *a, **kw):
    captured.append(("persist", fmt(self)))
    return _orig_persist(self, *a, **kw)


DataFrame.localCheckpoint = _ckpt
DataFrame.persist = _persist

for name in NAMES:
    captured.clear()
    df = QUERIES[name](spark, SF_DIR)
    final = fmt(df)
    path = os.path.join(OUT, f"{name}_{suffix}.txt")
    with open(path, "w") as f:
        f.write(f"# {name} — explain('formatted') at {SF_DIR}\n")
        f.write(f"# code: {suffix} "
                f"({'round start f91e07f' if suffix == 'before' else 'r12 HEAD'})\n")
        f.write("# Iterative loop: the first plans below are the frames "
                "captured at the moment\n# they were localCheckpoint()ed or "
                "persist()ed (setup + first supersteps —\n# the loop body "
                "shape); the last is the returned DataFrame's final plan.\n")
        idxs = list(range(min(HEAD_PLANS, len(captured))))
        idxs += [i for i in range(len(captured) - TAIL_PLANS, len(captured))
                 if i >= HEAD_PLANS]
        prev = -1
        for i in idxs:
            kind, plan = captured[i]
            gap = " (...intermediate supersteps elided...)" if i > prev + 1 else ""
            prev = i
            f.write(f"\n{'='*72}\n== captured {kind} #{i + 1} of "
                    f"{len(captured)} (loop-internal plan){gap}\n{'='*72}\n")
            f.write(plan + "\n")
        f.write(f"\n{'='*72}\n== FINAL returned plan\n{'='*72}\n")
        f.write(final + "\n")
    print("wrote", path, f"({len(captured)} inner plans captured)")
print("done")
