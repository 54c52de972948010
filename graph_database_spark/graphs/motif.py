"""Motif finding: Cypher-shaped pattern matching compiled to DataFrame joins.

The reference's tp2 expresses every query as a Cypher pattern
(tp2/app/main.py:98-105,144-154); Neo4j compiles patterns to joins
internally. This module restores that surface Spark-first: a minimal
pattern language compiled to equi-joins over the (vertices, edges)
DataFrames built by graphs.builder — so a reference user's pattern queries
keep working, with Catalyst choosing the physical join strategy.

Pattern grammar (GraphFrames-style, plus Cypher chains/back-arrows):

    "(a)-[r:CONTAINS]->(b); (c)-[s:CONTAINS]->(b)"
    "(p1)<-[:CONTAINS]-(o)-[:CONTAINS]->(p2)"       # chain form

- `(name)` — vertex variable; repeated names mean the same vertex.
- `[name]` / `[name:REL_TYPE]` — edge variable, optional rel_type filter;
  repeated edge names are rejected. `[:REL_TYPE]`/`[]` are anonymous.
- nodes chain left-to-right; `<-[...]-` flips edge direction, so the
  reference's Cypher patterns paste in unchanged (tp2/app/main.py:100).
- `;` separates chains. Matches are NOT forced distinct on vertices
  (Cypher semantics: different edge bindings may share vertices; add
  `!=` filters on the result for isomorphism, as the reference's Cypher
  does with `WHERE p1 <> p2`).

Output: one row per match, a column per named variable — vertex columns
hold ids, edge columns hold (src, dst, rel_type) structs.

Execution shape: each term scans the (rel_type-partitioned) edge table
with its filter pushed down, then terms chain via equi-joins on the
shared vertex variables — exactly the plan a pattern of hash joins
should be; AQE broadcasts small filtered terms.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, functions as F

_NODE = re.compile(r"\(\s*(?P<name>\w*)\s*\)")
# forward `-[e:REL]->` or backward `<-[e:REL]-` connector between nodes
_CONN = re.compile(
    r"(?P<back><)?-\s*\[\s*(?P<edge>\w*)(?::\s*(?P<rel>\w+))?\s*\]\s*-"
    r"(?P<fwd>>)?")


def _parse(pattern: str) -> list[dict]:
    """Cypher-shaped chains, `;`-separated: each chain is
    (a)-[e:REL]->(b)<-[:REL2]-(c)…; a backward arrow flips src/dst."""
    terms = []
    anon = 0
    for raw in (t.strip() for t in pattern.split(";")):
        if not raw:
            continue
        pos = 0
        m = _NODE.match(raw, pos)
        if not m:
            raise ValueError(f"unparseable pattern term: {raw!r}")
        prev = m.group("name")
        if not prev:
            prev, anon = f"__anon_{anon}", anon + 1
        pos = m.end()
        while pos < len(raw):
            c = _CONN.match(raw, pos)
            if not c:
                raise ValueError(f"unparseable connector at: {raw[pos:]!r}")
            if bool(c.group("back")) == bool(c.group("fwd")):
                raise ValueError(
                    f"connector needs exactly one arrowhead: {raw[pos:]!r}")
            pos = c.end()
            m = _NODE.match(raw, pos)
            if not m:
                raise ValueError(f"expected node at: {raw[pos:]!r}")
            nxt = m.group("name")
            if not nxt:
                nxt, anon = f"__anon_{anon}", anon + 1
            pos = m.end()
            src, dst = (nxt, prev) if c.group("back") else (prev, nxt)
            terms.append({"src": src, "dst": dst,
                          "edge": c.group("edge"), "rel": c.group("rel")})
            prev = nxt
    if not terms:
        raise ValueError("empty pattern")
    edge_names = [t["edge"] for t in terms if t["edge"]]
    if len(edge_names) != len(set(edge_names)):
        raise ValueError("edge variables must be unique")
    vertex_names = {t["src"] for t in terms} | {t["dst"] for t in terms}
    clash = vertex_names & set(edge_names)
    if clash:
        raise ValueError(
            f"edge variables collide with vertex variables: {sorted(clash)}")
    return terms


def find_motif(edges: DataFrame, pattern: str,
               vertices: DataFrame | None = None,
               allow_cartesian: bool = False) -> DataFrame:
    """Match `pattern` against the edge DataFrame (src, dst, rel_type, …).

    Returns a DataFrame with a column per named vertex variable (the
    vertex id) and per named edge variable (struct of the edge row). When
    `vertices` is given, vertex variables join against it so patterns
    can't bind ids absent from the vertex table.

    A pattern term sharing no vertex variable with the terms before it
    is a DISCONNECTED pattern — Cypher semantics make that a cartesian
    product, which at scale is almost always a typo'd variable name, so
    it raises unless `allow_cartesian=True` is passed explicitly.
    """
    terms = _parse(pattern)

    # Greedy connectivity ordering: always join next a term sharing a
    # variable with what's already bound (inner joins commute, so this
    # never changes the answer — it only avoids building a cartesian
    # product for patterns that are connected but written out of order,
    # e.g. 'a→b; c→d; b→c'). Only when NO remaining term connects is the
    # pattern truly disconnected.
    ordered: list[dict] = []
    remaining = list(terms)
    pre_bound: set[str] = set()
    while remaining:
        idx = next((i for i, t in enumerate(remaining)
                    if not pre_bound
                    or t["src"] in pre_bound or t["dst"] in pre_bound),
                   None)
        if idx is None:
            if not allow_cartesian:
                t = remaining[0]
                raise ValueError(
                    f"pattern term ({t['src']})-->({t['dst']}) shares no "
                    f"vertex variable with any connected term — a "
                    f"disconnected pattern is a cartesian product (bound "
                    f"so far: "
                    f"{sorted(v for v in pre_bound if not v.startswith('__anon'))})"
                    f". Check for a typo'd variable name, or pass "
                    f"allow_cartesian=True if the product is intended.")
            idx = 0
        t = remaining.pop(idx)
        ordered.append(t)
        pre_bound |= {t["src"], t["dst"]}
    terms = ordered

    result: DataFrame | None = None
    bound: set[str] = set()

    for i, t in enumerate(terms):
        e = edges
        if t["rel"]:
            e = e.filter(F.col("rel_type") == t["rel"])
        if t["src"] == t["dst"]:
            # self-loop term '(x)-[...]->(x)': one bound column + an
            # src=dst restriction — two same-alias columns would make
            # every later reference to x ambiguous
            e = e.filter(F.col("src") == F.col("dst"))
            cols = [F.col("src").alias(t["src"])]
        else:
            cols = [F.col("src").alias(t["src"]),
                    F.col("dst").alias(t["dst"])]
        if t["edge"]:
            cols.append(F.struct("src", "dst", "rel_type").alias(t["edge"]))
        term_df = e.select(*cols)
        if result is None:
            result = term_df
            bound |= {t["src"], t["dst"]}
            continue
        join_keys = [v for v in dict.fromkeys((t["src"], t["dst"]))
                     if v in bound]
        if join_keys:
            result = result.join(term_df, join_keys)
        else:
            # unreachable unless allow_cartesian let a disconnected
            # component through the ordering pre-pass above
            result = result.crossJoin(term_df)
        bound |= {t["src"], t["dst"]}

    assert result is not None
    if vertices is not None:
        v_ids = vertices.select(F.col("id"))
        for v in sorted(bound):
            if v.startswith("__anon"):
                continue
            result = result.join(
                v_ids.withColumnRenamed("id", v), v, "left_semi")
    keep = [c for c in result.columns if not c.startswith("__anon")]
    return result.select(*keep)
