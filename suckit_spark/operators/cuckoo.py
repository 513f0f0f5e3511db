"""Deletion-capable URL-seen sketch: a range-partitioned cuckoo filter.

The bloom filter (operators/dedup.py) is the crawl's default approximate
seen-set; it cannot DELETE. A cuckoo filter can (north_star: "partitioned
bloom-filter URL-seen set, cuckoo fallback for deletions") — which is what
a re-crawl / retryable-error workflow needs: un-see a URL so a later
superstep may fetch it again.

Design mirrors the bloom's dataflow language exactly:

* urls hash into ``num_ranges`` ranges; each range owns an independent
  table of ``m`` buckets (m a power of two) × ``SLOTS`` 16-bit
  fingerprints, so every table stays broadcastable at the 10^10 design
  point (range count grows with capacity).
* the BULK build runs executor-side: (range, fingerprint, bucket) columns
  are JVM ``xxhash64`` expressions; ``applyInPandas`` per range runs the
  sequential insert/evict loop where the data lives and the driver only
  collects the finished tables (one blob per range).
* deltas and deletes collect O(delta) (range, fp, i1) triples via Arrow
  and mutate the driver-held tables — the same sparse-maintenance shape as
  ``BloomState.add``.
* the membership probe is one vectorized pandas UDF over the precomputed
  (range, fp, i1) columns; bucket 2 is derived in numpy via the standard
  partial-key involution ``i2 = i1 XOR h(fp)`` (valid because m is a power
  of two), so a probe needs no second Spark-side hash.

False-positive rate ≈ 2·SLOTS / 2^16 ≈ 1.2e-4 per lookup; false negatives
never (as long as inserts succeeded — an insert that exhausts MAX_KICKS
raises, the filter is over capacity).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import BooleanType

SLOTS = 4
MAX_KICKS = 500
#: odd multiplier for the fingerprint->offset hash (Knuth-style)
_FP_MIX = 0x5BD1E995


def _next_pow2(n: int) -> int:
    return 1 << max(1, (n - 1).bit_length())


def _geometry(capacity: int, num_ranges: int) -> int:
    """Buckets per range table (power of two, sized for ~84% max load —
    cuckoo filters with 4 slots stay insertable to ~95%, 84% leaves evict
    headroom)."""
    per_range = -(-max(capacity, 1) // num_ranges)
    return _next_pow2(max(8, int(per_range / (SLOTS * 0.84)) + 1))


def _cols(col: Column, m: int, num_ranges: int) -> list[Column]:
    """(range, fingerprint, primary bucket) as JVM expressions."""
    rg = F.pmod(F.xxhash64(col), F.lit(num_ranges)).cast("int")
    fp = (F.pmod(F.xxhash64(col, F.lit(1)), F.lit(65535)) + 1).cast("int")
    i1 = F.pmod(F.xxhash64(col, F.lit(2)), F.lit(m)).cast("int")
    return [rg.alias("rg"), fp.alias("fp"), i1.alias("i1")]


def _alt_bucket(fp, i1, m: int):
    """Partial-key involution, int64 throughout (fp<=65535 so fp*mix fits;
    numpy promotes uint64 op int to float, hence the explicit dtype)."""
    fpv = np.asarray(fp, dtype=np.int64)
    i1v = np.asarray(i1, dtype=np.int64)
    mask = np.int64(m - 1)
    return (i1v ^ ((fpv * np.int64(_FP_MIX)) & mask)) & mask


def _insert_into(table: np.ndarray, fp: int, i1: int, m: int) -> None:
    """Classic cuckoo insert with deterministic eviction (slot = kick % SLOTS
    — no RNG, so builds are reproducible)."""
    i2 = int(_alt_bucket(fp, i1, m))
    for i in (i1, i2):
        row = table[i]
        empty = np.flatnonzero(row == 0)
        if empty.size:
            row[empty[0]] = fp
            return
    cur_fp, cur_i = fp, i1
    for kick in range(MAX_KICKS):
        slot = kick % SLOTS
        cur_fp, table[cur_i, slot] = int(table[cur_i, slot]), cur_fp
        cur_i = int(_alt_bucket(cur_fp, cur_i, m))
        row = table[cur_i]
        empty = np.flatnonzero(row == 0)
        if empty.size:
            row[empty[0]] = cur_fp
            return
    raise RuntimeError(
        "cuckoo filter over capacity (MAX_KICKS exhausted) — grow the state")


class CuckooState:
    """Incrementally-maintained, deletable seen-set sketch. Interface matches
    :class:`dedup.BloomState` (add / blobs / might_contain_col) so the crawl
    loop and ``probe_unseen``/``anti_join_seen`` accept either."""

    GROWTH = 8

    def __init__(self, url_col: str, capacity: int, fpp: float = 0.0):
        # fpp accepted for interface parity; the 16-bit fingerprint fixes it
        self.url_col = url_col
        self.capacity = max(capacity, 1)
        self.num_ranges = max(1, self.capacity // 50_000_000)
        self.m = _geometry(self.capacity, self.num_ranges)
        self.count = 0
        self.blobs: dict[int, np.ndarray] = {}   # rg -> (m, SLOTS) uint16
        self._bc = None

    # -- build / maintain ---------------------------------------------------
    def _build_full(self, df: DataFrame) -> None:
        """Executor-side per-range build (the bulk path)."""
        m = self.m

        def build_range(pdf: pd.DataFrame) -> pd.DataFrame:
            table = np.zeros((m, SLOTS), dtype=np.uint16)
            for fp, i1 in zip(pdf["fp"].to_numpy(), pdf["i1"].to_numpy()):
                _insert_into(table, int(fp), int(i1), m)
            return pd.DataFrame({"rg": [int(pdf["rg"].iloc[0])],
                                 "tbl": [table.tobytes()]})

        parts = (df.select(*_cols(F.col(self.url_col), m, self.num_ranges))
                 .groupBy("rg").applyInPandas(build_range, "rg int, tbl binary")
                 .collect())
        self.blobs = {
            r.rg: np.frombuffer(bytes(r.tbl), dtype=np.uint16)
            .reshape(m, SLOTS).copy()
            for r in parts}

    def add(self, delta: DataFrame, delta_count: int,
            full_seen: DataFrame | None = None) -> None:
        """Insert a delta. ``delta`` must hold urls not previously inserted
        (the crawl's deltas are exactly the newly-seen urls): re-inserting a
        url adds a second copy of its fingerprint, which drifts the
        count/capacity accounting and makes a later :meth:`delete` of the
        OTHER copy leave a stale positive."""
        if (self.count + delta_count > self.capacity and full_seen is None
                and self.blobs):
            # Rebuilding the grown geometry from the delta alone would drop
            # every previously-inserted url (false negatives). Raise BEFORE
            # mutating state so the caller can retry with full_seen.
            raise ValueError(
                "CuckooState growth triggered (count "
                f"{self.count + delta_count} > capacity {self.capacity}) "
                "but no full_seen DataFrame was passed; rebuilding from the "
                "delta would drop every previously-added url")
        self.count += delta_count
        self._invalidate()
        if self.count > self.capacity:
            # grow + rebuild (bucket geometry changes with m)
            self.capacity = max(self.count, self.capacity) * self.GROWTH
            self.num_ranges = max(1, self.capacity // 50_000_000)
            self.m = _geometry(self.capacity, self.num_ranges)
            self._build_full(full_seen if full_seen is not None else delta)
            return
        if not self.blobs:
            # first engagement: bulk build executor-side
            self._build_full(full_seen if full_seen is not None else delta)
            return
        pdf = delta.select(
            *_cols(F.col(self.url_col), self.m, self.num_ranges)).toPandas()
        for rg, grp in pdf.groupby("rg"):
            table = self._writable(int(rg))
            for fp, i1 in zip(grp["fp"].to_numpy(), grp["i1"].to_numpy()):
                _insert_into(table, int(fp), int(i1), self.m)

    def delete(self, df: DataFrame) -> int:
        """Un-see urls: remove one matching fingerprint per url (bucket i1
        first, then i2). Returns how many were found and removed (and
        decrements ``count`` by that many, keeping the growth accounting
        honest). O(delete set) driver traffic — deletions are the small path
        (re-crawl a failed page), the bulk stays executor-side.

        Standard cuckoo-filter caveat: deletion is only safe for urls that
        were actually inserted, at most once per insertion — deleting a url
        that was never added can evict a DIFFERENT url sharing its
        (fingerprint, bucket) pair, creating a false negative. The bloom
        sketch's "false negatives never" promise therefore holds here only
        under that discipline (the crawl's re-crawl workflow satisfies it:
        it deletes exactly the urls it marked seen)."""
        self._invalidate()
        pdf = df.select(
            *_cols(F.col(self.url_col), self.m, self.num_ranges)).toPandas()
        removed = 0
        for rg, grp in pdf.groupby("rg"):
            table = self.blobs.get(int(rg))
            if table is None:
                continue
            table = self._writable(int(rg))
            for fp, i1 in zip(grp["fp"].to_numpy(), grp["i1"].to_numpy()):
                for i in (int(i1), int(_alt_bucket(fp, i1, self.m))):
                    hit = np.flatnonzero(table[i] == fp)
                    if hit.size:
                        table[i, hit[0]] = 0
                        removed += 1
                        break
        self.count = max(0, self.count - removed)
        return removed

    def _writable(self, rg: int) -> np.ndarray:
        t = self.blobs.get(rg)
        if t is None:
            t = np.zeros((self.m, SLOTS), dtype=np.uint16)
            self.blobs[rg] = t
        elif not t.flags.writeable:
            t = t.copy()
            self.blobs[rg] = t
        return t

    # -- probe --------------------------------------------------------------
    def _invalidate(self) -> None:
        if self._bc is not None:
            self._bc.unpersist()
            self._bc = None

    def broadcast(self, spark):
        if self._bc is None:
            self._bc = spark.sparkContext.broadcast(self.blobs)
        return self._bc

    def might_contain_col(self, spark, col: Column) -> Column:
        bc = self.broadcast(spark)
        m = self.m

        from pyspark.sql.functions import pandas_udf

        @pandas_udf(BooleanType())
        def probe(rg: pd.Series, fp: pd.Series, i1: pd.Series) -> pd.Series:
            tables = bc.value
            rgv = rg.to_numpy()
            fpv = fp.to_numpy().astype(np.uint64)
            i1v = i1.to_numpy().astype(np.uint64)
            i2v = _alt_bucket(fpv, i1v, m)
            acc = np.zeros(len(rgv), dtype=bool)
            for r in np.unique(rgv):
                t = tables.get(int(r))
                if t is None:
                    continue
                sel = rgv == r
                f = fpv[sel].astype(np.uint16)[:, None]
                hit = (t[i1v[sel].astype(np.int64)] == f).any(axis=1)
                hit |= (t[i2v[sel].astype(np.int64)] == f).any(axis=1)
                acc[sel] = hit
            return pd.Series(acc)

        rg, fp, i1 = _cols(col, m, self.num_ranges)
        return probe(rg, fp, i1)
