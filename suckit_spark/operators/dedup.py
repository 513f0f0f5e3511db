"""Distributed URL-seen membership: bloom prefilter + exact left-anti join.

The reference keeps an exact in-memory ``HashMap`` behind a mutex
(scraper.rs:44,76-85). At the 10^10-URL design point that becomes a
distributed structure: the correctness backstop is a left-anti join against
the ``seen`` table; in front of it sits a broadcast bloom filter built with
JVM-side ``xxhash64`` so that candidates the bloom proves unseen (no false
negatives) skip the shuffle entirely and only the might-contain minority pays
for the exact join (north_rule: bloom/cuckoo seen-set).

The bloom's bit positions are computed with Spark built-ins (``xxhash64`` +
``pmod`` — whole-stage codegen'd), the bit array itself is a numpy buffer
broadcast to executors, and the membership probe is a vectorized pandas UDF
over the precomputed position columns. At true 10^10 scale one bloom per
url-hash range (aligned with the seen table's bucketing) keeps each filter
broadcast-able; the sandbox uses a single filter.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import BooleanType


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for the target false-positive rate."""
    n = max(n_items, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 8)


def _position_cols(col: Column, m: int, k: int) -> list[Column]:
    return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m)) for i in range(k)]


def build_bloom(seen: DataFrame, url_col: str, n_items: int, fpp: float):
    """Aggregate the seen table's bit positions and return (bits, m, k).

    ``bits`` is a packed numpy uint8 array of m bits. The distinct-positions
    aggregation runs fully on executors; only the set bits come to the driver.
    """
    m, k = bloom_params(n_items, fpp)
    positions = (
        seen.select(F.explode(F.array(*_position_cols(F.col(url_col), m, k))).alias("p"))
        .distinct()
        .toPandas()["p"]
        .to_numpy()
    )
    bits = np.zeros((m + 7) // 8, dtype=np.uint8)
    np.bitwise_or.at(bits, positions // 8, (1 << (positions % 8)).astype(np.uint8))
    return bits, m, k


def might_contain_udf(spark, bits: np.ndarray, k: int):
    """Vectorized membership probe over k precomputed position columns."""
    bc = spark.sparkContext.broadcast(bits)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BooleanType())
    def might_contain(*pos_cols: pd.Series) -> pd.Series:
        b = bc.value
        acc = np.ones(len(pos_cols[0]), dtype=bool)
        for p in pos_cols:
            pv = p.to_numpy()
            acc &= (b[pv // 8] & (1 << (pv % 8)).astype(np.uint8)) != 0
        return pd.Series(acc)

    return might_contain


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame,
    url_col: str = "url",
    seen_count: int | None = None,
    bloom_threshold: int | None = None,
    bloom_fpp: float = 0.03,
) -> DataFrame:
    """candidates minus seen, on ``url_col``.

    When the seen side is large enough, splits candidates with a bloom filter:
    proven-new rows bypass the join (no shuffle); only might-contain rows are
    anti-joined exactly.
    """
    spark = candidates.sparkSession
    use_bloom = (
        bloom_threshold is not None
        and seen_count is not None
        and seen_count >= bloom_threshold
    )
    if not use_bloom:
        return candidates.join(seen.select(url_col), on=url_col, how="left_anti")

    bits, m, k = build_bloom(seen, url_col, seen_count, bloom_fpp)
    probe = might_contain_udf(spark, bits, k)
    pos_cols = _position_cols(F.col(url_col), m, k)
    tagged = candidates.withColumn("__maybe_seen", probe(*pos_cols))
    definite_new = tagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    maybe = tagged.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    survivors = maybe.join(seen.select(url_col), on=url_col, how="left_anti")
    return definite_new.unionByName(survivors)


def first_wins(candidates: DataFrame, key_col: str, order_col: str) -> DataFrame:
    """Order-preserving within-batch dedup: keep the row with the smallest
    ``order_col`` per ``key_col`` (reference P8: the first discoverer inserts
    into path_map and wins; ``dropDuplicates`` would pick a nondeterministic
    winner)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(key_col).orderBy(F.col(order_col))
    return (
        candidates.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
