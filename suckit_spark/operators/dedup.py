"""Distributed URL-seen membership: bloom prefilter + exact left-anti join.

The reference keeps an exact in-memory ``HashMap`` behind a mutex
(scraper.rs:44,76-85). At the 10^10-URL design point that becomes a
distributed structure: the correctness backstop is a left-anti join against
the ``seen`` table; in front of it sits a broadcast bloom filter built with
JVM-side ``xxhash64`` so that candidates the bloom proves unseen (no false
negatives) skip the shuffle entirely and only the might-contain minority pays
for the exact join (north_rule: bloom/cuckoo seen-set).

The bloom is RANGE-PARTITIONED and built ON EXECUTORS: urls hash into
``num_ranges`` ranges (aligned with any url-hash bucketing of the seen
table), each range owning an independent filter of ``m`` bits, so every
filter stays broadcastable at the 10^10 design point. The build never
materializes positions on the driver: bit positions are computed with Spark
built-ins (``xxhash64`` + ``pmod``, whole-stage codegen'd), OR-combined into
64-bit words by a hash aggregation WITH map-side partial combine (so the
shuffle carries at most the distinct set words per range, bounded by m/64),
then packed to bytes in one Arrow stage per range. The driver only ever
receives the finished filter blobs — exactly the bytes it must broadcast
anyway. The membership probe is a vectorized pandas UDF over the
precomputed position columns plus the range id.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import BooleanType

#: Cap on a single range's filter size (bits). 2^30 bits = 128 MiB per
#: filter keeps each blob comfortably under Spark's broadcast limits;
#: ``num_ranges`` scales up automatically past this.
MAX_BITS_PER_RANGE = 1 << 30


def bloom_params(n_items: int, fpp: float) -> tuple[int, int]:
    """(m bits, k hashes) for the target false-positive rate."""
    n = max(n_items, 1)
    m = max(64, int(-n * math.log(fpp) / (math.log(2) ** 2)))
    k = max(1, round(m / n * math.log(2)))
    return m, min(k, 8)


def num_ranges_for(n_items: int, fpp: float) -> int:
    """Number of url-hash ranges so each range's filter fits the size cap."""
    m_total, _ = bloom_params(n_items, fpp)
    return max(1, -(-m_total // MAX_BITS_PER_RANGE))


def _range_col(col: Column, num_ranges: int) -> Column:
    return F.pmod(F.xxhash64(col), F.lit(num_ranges)).cast("int")


def _position_cols(col: Column, m: int, k: int) -> list[Column]:
    return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m)) for i in range(k)]


def _build_blobs(df: DataFrame, url_col: str, m: int, k: int,
                 num_ranges: int) -> dict:
    """Executor-side blob build for fixed filter geometry. Dataflow:
    positions (JVM exprs) -> (range, word) OR aggregation (map-side combine;
    shuffle bounded by distinct set words, <= m/64 per range) -> per-range
    Arrow pack -> driver collects only the finished blobs."""
    col = F.col(url_col)
    pos = df.select(
        _range_col(col, num_ranges).alias("rg"),
        F.explode(F.array(*_position_cols(col, m, k))).alias("p"),
    )
    words = pos.groupBy(
        "rg", (F.col("p") / 64).cast("long").alias("w")
    ).agg(F.expr(
        "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT)))"
    ).alias("word"))

    n_bytes = _blob_bytes(m)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        bits = np.zeros(n_bytes // 8, dtype=np.uint64)
        np.bitwise_or.at(
            bits, pdf["w"].to_numpy().astype(np.int64),
            pdf["word"].to_numpy().astype(np.int64).view(np.uint64))
        return pd.DataFrame({"rg": [int(pdf["rg"].iloc[0])],
                             "bits": [bits.tobytes()]})

    parts = words.groupBy("rg").applyInPandas(
        pack, "rg int, bits binary").collect()
    return {r.rg: np.frombuffer(bytes(r.bits), dtype=np.uint8)
            for r in parts}


def _blob_bytes(m: int) -> int:
    """Blob length for an m-bit filter, padded to whole 64-bit words so the
    sparse delta path can OR words in place via a uint64 view."""
    return ((m + 63) // 64) * 8


def _delta_words(df: DataFrame, url_col: str, m: int, k: int,
                 num_ranges: int):
    """Sparse build: the (range, word_idx, word) rows a delta sets — O(delta)
    driver traffic instead of the full O(m) blob, for incremental OR-in."""
    col = F.col(url_col)
    pos = df.select(
        _range_col(col, num_ranges).alias("rg"),
        F.explode(F.array(*_position_cols(col, m, k))).alias("p"),
    )
    return pos.groupBy(
        "rg", (F.col("p") / 64).cast("long").alias("w")
    ).agg(F.expr(
        "bit_or(shiftleft(CAST(1 AS BIGINT), CAST(pmod(p, 64) AS INT)))"
    ).alias("word")).toPandas()  # Arrow transfer; vectorized OR at the caller


def build_bloom(seen: DataFrame, url_col: str, n_items: int, fpp: float,
                num_ranges: int | None = None):
    """Build the range-partitioned bloom fully executor-side.

    Returns ``(blobs, m, k, num_ranges)`` where ``blobs`` maps range id ->
    packed numpy uint8 array of ``m`` bits (ranges with no seen urls are
    absent = all-zero).
    """
    if num_ranges is None:
        num_ranges = num_ranges_for(n_items, fpp)
    m, k = bloom_params(-(-max(n_items, 1) // num_ranges), fpp)
    blobs = _build_blobs(seen, url_col, m, k, num_ranges)
    return blobs, m, k, num_ranges


class BloomState:
    """Incrementally-maintained seen-set bloom (the crawl's steady state).

    The seen table is append-only, so the filter never needs rebuilding from
    the full table: size the geometry once for ``capacity`` items, then OR
    each superstep's (small) seen delta into the blobs — per-superstep build
    cost is proportional to the DELTA, not the accumulated seen set. When
    the item count outgrows capacity, rebuild from the full table at 8x —
    geometric growth keeps total rebuild work O(final build).
    """

    GROWTH = 8

    def __init__(self, url_col: str, capacity: int, fpp: float):
        self.url_col = url_col
        self.capacity = max(capacity, 1)
        self.fpp = fpp
        self.count = 0
        self.num_ranges = num_ranges_for(self.capacity, fpp)
        self.m, self.k = bloom_params(
            -(-self.capacity // self.num_ranges), fpp)
        self.blobs: dict = {}
        self._bc = None  # cached broadcast of the current filter version

    def broadcast(self, spark):
        """Broadcast of the current blobs, cached until the next ``add``."""
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(self.blobs)
        return self._bc

    def _invalidate(self) -> None:
        if self._bc is not None:
            self._bc.unpersist()
            self._bc = None

    def add(self, delta: DataFrame, delta_count: int,
            full_seen: DataFrame | None = None) -> None:
        """OR a seen delta into the filter; rebuild from ``full_seen`` if
        capacity is exceeded (growth without ``full_seen`` raises — see
        below; the delta alone cannot reconstruct the filter).

        The incremental path collects only the delta's SET WORDS (sparse,
        O(delta·k) rows) and ORs them into the driver-held blobs through a
        uint64 view — never the full O(m) blob per superstep.
        """
        if self.count + delta_count > self.capacity and full_seen is None:
            # Raise BEFORE mutating any state — the caller can retry with
            # full_seen and the filter is still exactly what it was.
            raise ValueError(
                "BloomState growth triggered (count "
                f"{self.count + delta_count} > capacity {self.capacity}) "
                "but no full_seen DataFrame was passed; rebuilding from the "
                "delta would drop every previously-added url")
        self.count += delta_count
        self._invalidate()
        if self.count > self.capacity:
            if full_seen is None:
                # Rebuilding from the delta alone would silently DISCARD every
                # previously-added url: the new filter would report them
                # unseen (false negatives) and the crawl would re-visit them.
                # Growth needs the full accumulated table.
                raise ValueError(
                    "BloomState growth triggered (count "
                    f"{self.count} > capacity {self.capacity}) but no "
                    "full_seen DataFrame was passed; rebuilding from the "
                    "delta would drop every previously-added url")
            self.capacity = max(self.count, self.capacity * self.GROWTH)
            self.num_ranges = num_ranges_for(self.capacity, self.fpp)
            self.m, self.k = bloom_params(
                -(-self.capacity // self.num_ranges), self.fpp)
            self.blobs = _build_blobs(
                full_seen, self.url_col, self.m, self.k, self.num_ranges)
            return
        if delta_count * self.k <= 4_000_000:
            # Small delta: one narrow job (no shuffle) collecting the raw
            # positions via Arrow beats a groupBy over ~all-distinct words.
            col = F.col(self.url_col)
            pdf = delta.select(
                _range_col(col, self.num_ranges).alias("rg"),
                F.explode(F.array(*_position_cols(
                    col, self.m, self.k))).alias("p"),
            ).toPandas()
            for rg, grp in pdf.groupby("rg"):
                blob = self._writable_blob(int(rg))
                p = grp["p"].to_numpy().astype(np.int64)
                np.bitwise_or.at(
                    blob.view(np.uint64), p // 64,
                    np.uint64(1) << (p % 64).astype(np.uint64))
            return
        pdf = _delta_words(delta, self.url_col, self.m, self.k,
                           self.num_ranges)
        for rg, grp in pdf.groupby("rg"):
            blob = self._writable_blob(int(rg))
            np.bitwise_or.at(
                blob.view(np.uint64),
                grp["w"].to_numpy().astype(np.int64),
                grp["word"].to_numpy().astype(np.int64).view(np.uint64))

    def _writable_blob(self, rg: int) -> np.ndarray:
        blob = self.blobs.get(rg)
        if blob is None:
            blob = np.zeros(_blob_bytes(self.m), dtype=np.uint8)
            self.blobs[rg] = blob
        elif not blob.flags.writeable:
            blob = blob.copy()
            self.blobs[rg] = blob
        return blob

    def might_contain_col(self, spark, col: Column) -> Column:
        """Vectorized membership probe column over this filter version."""
        probe = might_contain_udf(spark, self.broadcast(spark), self.k)
        return probe(_range_col(col, self.num_ranges),
                     *_position_cols(col, self.m, self.k))


def might_contain_udf(spark, blobs, k: int):
    """Vectorized membership probe: range id column + k position columns.
    ``blobs`` is the dict of range blobs or an existing Broadcast of one."""
    from pyspark.broadcast import Broadcast

    bc = blobs if isinstance(blobs, Broadcast) \
        else spark.sparkContext.broadcast(blobs)

    from pyspark.sql.functions import pandas_udf

    @pandas_udf(BooleanType())
    def might_contain(rg: pd.Series, *pos_cols: pd.Series) -> pd.Series:
        filters = bc.value
        rgv = rg.to_numpy()
        acc = np.zeros(len(rgv), dtype=bool)
        for r in np.unique(rgv):
            b = filters.get(int(r))
            if b is None:
                continue  # no seen urls in this range -> definitely new
            sel = rgv == r
            sub = np.ones(sel.sum(), dtype=bool)
            for p in pos_cols:
                pv = p.to_numpy()[sel]
                sub &= (b[pv // 8] & (1 << (pv % 8)).astype(np.uint8)) != 0
            acc[sel] = sub
        return pd.Series(acc)

    return might_contain


def anti_join_seen(
    candidates: DataFrame,
    seen: DataFrame,
    url_col: str = "url",
    seen_count: int | None = None,
    bloom_threshold: int | None = None,
    bloom_fpp: float = 0.03,
    num_ranges: int | None = None,
    bloom_state: "BloomState | None" = None,
) -> DataFrame:
    """candidates minus seen, on ``url_col``.

    When the seen side is large enough, splits candidates with a bloom filter:
    proven-new rows bypass the join (no shuffle); only might-contain rows are
    anti-joined exactly. Pass a :class:`BloomState` to probe an incrementally
    maintained filter (the crawl loop's steady state) instead of paying a
    full rebuild per call.
    """
    spark = candidates.sparkSession
    if bloom_state is not None and bloom_state.blobs:
        # any seen-sketch exposing might_contain_col (BloomState/CuckooState)
        maybe_col = bloom_state.might_contain_col(spark, F.col(url_col))
    else:
        use_bloom = (
            bloom_threshold is not None
            and seen_count is not None
            and seen_count >= bloom_threshold
        )
        if not use_bloom:
            return candidates.join(
                seen.select(url_col), on=url_col, how="left_anti")
        blobs, m, k, num_ranges = build_bloom(
            seen, url_col, seen_count, bloom_fpp, num_ranges)
        probe = might_contain_udf(spark, blobs, k)
        maybe_col = probe(_range_col(F.col(url_col), num_ranges),
                          *_position_cols(F.col(url_col), m, k))
    tagged = candidates.withColumn("__maybe_seen", maybe_col)
    definite_new = tagged.filter(~F.col("__maybe_seen")).drop("__maybe_seen")
    maybe = tagged.filter(F.col("__maybe_seen")).drop("__maybe_seen")
    survivors = maybe.join(seen.select(url_col), on=url_col, how="left_anti")
    return definite_new.unionByName(survivors)


def probe_unseen(candidates: DataFrame, bloom_state: BloomState,
                 url_col: str = "url") -> DataFrame:
    """APPROXIMATE seen-test: candidates the bloom proves unseen — NO exact
    residual join. This is the 10^10-scale mode (north_rule bloom/cuckoo
    seen-set): per-superstep cost is O(candidates) probe work with zero
    shuffle of the seen side, at the price of dropping false-positive
    candidates (bounded by the filter's fpp — a coverage loss, never a
    duplicate visit). The exact-backstop path (:func:`anti_join_seen`) stays
    the default correctness contract."""
    spark = candidates.sparkSession
    return candidates.filter(
        ~bloom_state.might_contain_col(spark, F.col(url_col)))


def first_wins(candidates: DataFrame, key_col: str, order_col: str) -> DataFrame:
    """Order-preserving within-batch dedup: keep the row with the smallest
    ``order_col`` per ``key_col`` (reference P8: the first discoverer inserts
    into path_map and wins; ``dropDuplicates`` would pick a nondeterministic
    winner).

    Shape: ``min_by`` hash aggregation, NOT a window — partial (map-side)
    combine shrinks the shuffle to one winner per key per map partition and
    needs no per-partition sort; a window would shuffle every candidate row
    and sort each hash partition. order_col values are unique per key in the
    crawl (order_key = parent chain + link position), so the winner is
    deterministic."""
    others = [c for c in candidates.columns if c != key_col]
    return (
        candidates.groupBy(key_col)
        .agg(F.min_by(F.struct(*others), F.col(order_col)).alias("__w"))
        .select(key_col, *[F.col(f"__w.{c}").alias(c) for c in others])
    )
