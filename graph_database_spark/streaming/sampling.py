"""Streaming exact-n sampling: the deterministic reservoir.

The batch eval-set builder (`operators/sampling.stratified_exact_n`)
keeps each stratum's n rows with the smallest portable-md5 key hash. That
selection is a running top-n by a STABLE per-row score, so it streams
with bounded state: one reservoir of ≤ n (hash, key) pairs per stratum,
updated per micro-batch — the classic reservoir sample, but with the
hash as the "random" key, so the result is bit-identical to the batch
operator on the same rows regardless of batch boundaries or arrival
order (a true A-ES-style bottom-n sketch; RNG reservoirs can't promise
replay equality).

Each update emits the stratum's full current reservoir stamped with a
`version` (rows seen so far): downstream consumers — or the equivalence
test — keep each stratum's highest version. State is O(n) per stratum.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType, LongType, StringType, StructField, StructType,
)

OUT_SCHEMA = StructType([
    StructField("source", StringType()),
    StructField("doc_id", LongType()),
    StructField("version", LongType()),
])

STATE_SCHEMA = StructType([
    StructField("hashes", ArrayType(LongType())),
    StructField("keys", ArrayType(LongType())),
    StructField("seen", LongType()),
])


def _md5_long(key: int) -> int:
    """BIGINT of the first 15 hex chars of md5(str(key)) — the exact
    JVM-side `dedup.md5_long(CAST(key AS STRING))` value."""
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16)


def exact_n_sample_stream(docs: DataFrame, n: int = 20) -> DataFrame:
    """Streaming (source, doc_id, version): per-source reservoir of the
    n smallest-hash doc_ids seen so far. docs needs (source, doc_id)."""

    def _update(key, pdfs: Iterator[pd.DataFrame],
                state: GroupState) -> Iterator[pd.DataFrame]:
        if state.exists:
            hashes, keys, seen = state.get
            pairs = list(zip(hashes, keys))
        else:
            pairs, seen = [], 0
        for pdf in pdfs:
            seen += len(pdf)
            pairs.extend((_md5_long(int(k)), int(k)) for k in pdf["doc_id"])
        pairs.sort()
        pairs = pairs[:n]
        state.update(([h for h, _ in pairs], [k for _, k in pairs], seen))
        yield pd.DataFrame({"source": [key[0]] * len(pairs),
                            "doc_id": [k for _, k in pairs],
                            "version": [seen] * len(pairs)})

    return (docs.groupBy("source")
            .applyInPandasWithState(
                _update,
                outputStructType=OUT_SCHEMA,
                stateStructType=STATE_SCHEMA,
                outputMode="update",
                timeoutConf=GroupStateTimeout.NoTimeout,
            ))
