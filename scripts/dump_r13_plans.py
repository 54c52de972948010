"""Dump explain('formatted') for the r13-touched queries.

Same capture technique as dump_r12_plans.py: iterative/composite queries
truncate lineage at localCheckpoint/persist boundaries, so we record the
plan of every frame at the moment it is checkpointed or persisted (first
N per query + last 2), then the final returned plan.

Usage: python dump_r13_plans.py <repo_root> <suffix>
  <repo_root>: the checkout whose code to import (round-start export for
  "before", /root/repo for "after")
Writes /root/repo/plans/r13/<query>_<suffix>.txt

NOTE (same caveat as r12): plans are captured at sf0.001 so the dump is
cheap; size-derived partition COUNTS therefore differ from bench scale,
but the plan SHAPES under comparison (exchange count/keys, join strategy,
checkpoint-vs-cache scan nodes) are gate-stable between sf0.001 and
sf0.1 for every query below — recommend_batch's broadcast-anti-join gate
and the hyperanf saturation gate pick the same branch at both scales
(branch probes in OPTIMIZATION_r13.md).
"""
import os
import re
import sys

repo, suffix = sys.argv[1], sys.argv[2]
sys.path.insert(0, repo)

SF_DIR = "/root/testdata/sf0.001"
OUT = "/root/repo/plans/r13"
HEAD_PLANS, TAIL_PLANS = 4, 2
NAMES = [
    "recommend_batch",
    "pipeline_curate_pack",
    "graph_hyperanf_nf",
    "graph_hyperanf_diameter",
]
if os.environ.get("R13_PLAN_NAMES"):
    NAMES = os.environ["R13_PLAN_NAMES"].split(",")

os.makedirs(OUT, exist_ok=True)

from pyspark.sql.classic.dataframe import DataFrame  # noqa: E402
from graph_database_spark.session import get_spark  # noqa: E402
from graph_database_spark.registry import QUERIES  # noqa: E402

spark = get_spark("plans-r13")
spark.sparkContext.setLogLevel("ERROR")


def fmt(df):
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    plan = re.sub(r" \[codegen id : \d+\]", "", plan)
    return plan.rstrip()


captured = []
_orig_ckpt = DataFrame.localCheckpoint
_orig_persist = DataFrame.persist


def _ckpt(self, eager=True):
    captured.append((f"localCheckpoint(eager={eager})", fmt(self)))
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
                f"({'round start 355bd2c' if suffix == 'before' else 'r13 HEAD'})\n")
        f.write("# The first plans below are the frames captured at the "
                "moment they were\n# localCheckpoint()ed or persist()ed "
                "(setup + loop body shape); the last is\n# the returned "
                "DataFrame's final plan.\n")
        idxs = list(range(min(HEAD_PLANS, len(captured))))
        idxs += [i for i in range(len(captured) - TAIL_PLANS, len(captured))
                 if i >= HEAD_PLANS]
        prev = -1
        for i in idxs:
            kind, plan = captured[i]
            gap = " (...intermediate captures elided...)" if i > prev + 1 else ""
            prev = i
            f.write(f"\n{'='*72}\n== captured {kind} #{i + 1} of "
                    f"{len(captured)} (internal plan){gap}\n{'='*72}\n")
            f.write(plan + "\n")
        f.write(f"\n{'='*72}\n== FINAL returned plan\n{'='*72}\n")
        f.write(final + "\n")
    print("wrote", path, f"({len(captured)} inner plans captured)")
print("done")
