"""Synthesize an sf1-equivalent dataset (10× sf0.1) at /tmp/sf1 for the
second-decade scaling run (SCALING.md, VERDICT r4 #5).

/root/testdata is read-only and tops out at sf0.1, so the 10× corpus is
built here, deterministically (seed 42), from public structure only:

- relational tables + events: 10 key-shifted copies of sf0.1 (shard
  semantics — baskets/sessions never span copies, so per-key fan-out,
  basket-size and per-user densities are EXACTLY the sf0.1 ones while
  rows and key cardinality grow 10×; this is how horizontally-ingested
  production data actually scales). nation/region stay fixed (25/5-row
  dims by spec).
- documents: 50k FRESH docs sampled from the sf0.1 corpus's measured
  unigram distribution (keeps the zipf/stop-word shape that drives
  shingle/LSH costs) — key-shifted copies would plant 10-way exact
  duplicates and quadratically inflate every near-dup candidate set,
  which a real 10× corpus does not do. Exact duplicates are injected at
  the measured sf0.1 rate (~0.16%).
- embeddings: 20k unit-norm 64-dim vectors, 10 labels, with perturbed
  twins planted at ~10% so ANN/near-dup queries keep a neighbor
  structure comparable to the driver corpus (true-neighbor cosine ~0.5
  on near-orthogonal vectors).

Run: python scripts/gen_sfbig.py   (~1 min, writes /tmp/sf1/*.parquet)
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"
OUT = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/sf1")
COPIES = 10
SHIFT = 10_000_000  # > every sf0.1 key; keeps shards disjoint

# key columns to shift per table; all other columns pass through
SHIFT_COLS = {
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "events": ["event_id", "user_id"],
}
COPY_AS_IS = ["nation", "region"]


def shard_concat(con: duckdb.DuckDBPyConnection, table: str) -> None:
    cols = [c[0] for c in con.execute(
        f"DESCRIBE SELECT * FROM '{SRC}/{table}.parquet'").fetchall()]
    selects = []
    for k in range(COPIES):
        exprs = []
        for c in cols:
            if c in SHIFT_COLS[table]:
                exprs.append(f"{c} + {k * SHIFT} AS {c}")
            else:
                exprs.append(c)
        selects.append(
            f"SELECT {', '.join(exprs)} FROM '{SRC}/{table}.parquet'")
    con.execute(
        f"COPY ({' UNION ALL '.join(selects)}) TO '{OUT}/{table}.parquet' "
        f"(FORMAT PARQUET)")


def gen_documents(con: duckdb.DuckDBPyConnection, n: int = 50_000) -> None:
    rng = np.random.RandomState(42)
    # measured unigram distribution of the sf0.1 corpus
    freq = con.execute(f"""
        WITH toks AS (
          SELECT unnest(string_split_regex(trim(lower(text)), '\\s+')) AS t
          FROM '{SRC}/documents.parquet')
        SELECT t, COUNT(*) c FROM toks WHERE t <> '' GROUP BY t
        ORDER BY c DESC""").fetchall()
    words = np.array([w for w, _ in freq])
    p = np.array([c for _, c in freq], dtype=np.float64)
    p /= p.sum()
    langs, lp = zip(*[(r[0], r[1]) for r in con.execute(
        f"SELECT lang, COUNT(*) FROM '{SRC}/documents.parquet' GROUP BY 1"
    ).fetchall()])
    lp = np.array(lp, dtype=np.float64) / sum(lp)
    # doc length (in words) distribution from the source corpus
    lens = [r[0] for r in con.execute(f"""
        SELECT len(string_split_regex(trim(lower(text)), '\\s+'))
        FROM '{SRC}/documents.parquet'""").fetchall()]
    lens = np.asarray(lens)

    texts, lang_col, src_col = [], [], []
    for i in range(n):
        if i > 0 and rng.rand() < 0.0016:  # measured exact-dup rate
            texts.append(texts[i - 1])
        else:
            m = int(lens[rng.randint(len(lens))])
            texts.append(" ".join(words[rng.choice(len(words), size=m, p=p)]))
        lang_col.append(str(np.random.RandomState(i).choice(langs, p=lp)))
        src_col.append(f"src{i % 20}")
    tbl = pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(lang_col, pa.string()),
        "source": pa.array(src_col, pa.string()),
        "n_chars": pa.array([len(t) for t in texts], pa.int64()),
    })
    pq.write_table(tbl, f"{OUT}/documents.parquet")


def gen_embeddings(n: int = 20_000, dim: int = 64) -> None:
    rng = np.random.RandomState(42)
    v = rng.normal(size=(n, dim)).astype(np.float32)
    # plant perturbed twins at ~10%: row i (i%10==1) twins row i-1
    twin = np.arange(n) % 10 == 1
    noise = rng.normal(size=(n, dim)).astype(np.float32)
    v[twin] = v[np.flatnonzero(twin) - 1] + 1.0 * noise[twin]
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(range(n), pa.int64()),
        "embedding": pa.array(list(v), pa.list_(pa.float32())),
        "label": pa.array((np.arange(n) * 7919 % 10).astype(np.int32)),
    })
    pq.write_table(tbl, f"{OUT}/embeddings.parquet")


def main() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    for t in COPY_AS_IS:
        con.execute(f"COPY (SELECT * FROM '{SRC}/{t}.parquet') "
                    f"TO '{OUT}/{t}.parquet' (FORMAT PARQUET)")
    for t in SHIFT_COLS:
        shard_concat(con, t)
        print(f"{t}: sharded ×{COPIES}", file=sys.stderr)
    gen_documents(con)
    print("documents: 50k synthesized", file=sys.stderr)
    gen_embeddings()
    print("embeddings: 20k synthesized", file=sys.stderr)
    for t in list(SHIFT_COLS) + COPY_AS_IS + ["documents", "embeddings"]:
        n = con.execute(
            f"SELECT COUNT(*) FROM '{OUT}/{t}.parquet'").fetchone()[0]
        print(f"{OUT}/{t}.parquet rows={n}")


if __name__ == "__main__":
    main()
