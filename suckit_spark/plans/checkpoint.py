"""Per-superstep snapshot commits with exact resume.

The reference has no state saving (README.md:24 lists it as TODO). The
north_rule requires every superstep to commit frontier + seen + lineage +
metrics atomically so a killed crawl resumes exactly. With the Iceberg runtime
jar this would be table snapshots tagged ``superstep=s``; the sandbox has no
Iceberg jars, so the documented fallback gives the same semantics with plain
Parquet: each superstep writes its state under ``<dir>/step=<s>/`` and then
atomically publishes a JSON manifest (``_manifest_<s>.json`` via rename).
A superstep is committed iff its manifest exists; resume re-enters at the
highest committed superstep. Supersteps are deterministic, so resume is exact.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession


class CrawlCheckpoint:
    def __init__(self, spark: SparkSession, directory: str):
        self.spark = spark
        self.dir = directory
        os.makedirs(directory, exist_ok=True)

    # -- manifest helpers ---------------------------------------------------
    def _manifest_path(self, step: int) -> str:
        return os.path.join(self.dir, f"_manifest_{step:06d}.json")

    def last_superstep(self) -> int | None:
        steps = []
        for name in os.listdir(self.dir):
            if name.startswith("_manifest_") and name.endswith(".json"):
                steps.append(int(name[len("_manifest_"):-len(".json")]))
        return max(steps) if steps else None

    # -- commit -------------------------------------------------------------
    def commit(self, step: int, frontier: DataFrame, seen_delta: DataFrame,
               log_delta: DataFrame,
               metrics_delta: DataFrame, stats: dict) -> None:
        """Publish superstep ``step``. ``seen_delta`` is only this superstep's
        newly-seen URLs — the seen set is stored append-only (the Iceberg
        shape), so a commit is O(delta), never O(total). The mirror delta is
        written by the crawl loop itself (it doubles as the loop's
        memory-spill of content bytes); the manifest publishing below is what
        makes it part of the committed snapshot."""
        base = os.path.join(self.dir, f"step={step:06d}")
        frontier.write.mode("overwrite").parquet(os.path.join(base, "frontier"))
        seen_delta.write.mode("overwrite").parquet(os.path.join(base, "seen"))
        log_delta.write.mode("overwrite").parquet(os.path.join(base, "crawl_log"))
        metrics_delta.write.mode("overwrite").parquet(os.path.join(base, "metrics"))

        # Per-partition lineage: how many rows each task produced (north_rule).
        from pyspark.sql import functions as F
        lineage = [
            r.asDict()
            for r in frontier.groupBy(F.spark_partition_id().alias("partition"))
            .count().collect()
        ]
        manifest = {
            "superstep": step,
            "committed_at": time.time(),
            "stats": stats,
            "frontier_partition_lineage": lineage,
        }
        tmp = self._manifest_path(step) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
        os.replace(tmp, self._manifest_path(step))  # atomic publish

    # -- resume -------------------------------------------------------------
    def load(self) -> dict:
        step = self.last_superstep()
        if step is None:
            raise FileNotFoundError(f"no committed superstep under {self.dir}")
        base = os.path.join(self.dir, f"step={step:06d}")
        read = self.spark.read
        out = {
            "superstep": step,
            "frontier": read.parquet(os.path.join(base, "frontier")),
        }
        # Seen/result/log/metrics deltas accumulate across steps; union all
        # committed steps' deltas. "result" is the loop's per-superstep page
        # store (content + links + log columns in one parquet; the crawl
        # derives its mirror view from it).
        for name in ("seen", "result", "crawl_log", "metrics"):
            parts = []
            for s in range(step + 1):
                p = os.path.join(self.dir, f"step={s:06d}", name)
                if os.path.exists(p):
                    parts.append(read.parquet(p))
            df = None
            for part in parts:
                df = part if df is None else df.unionByName(part)
            out[name] = df
        return out

    def manifests(self) -> list[dict]:
        out = []
        step = self.last_superstep()
        if step is None:
            return out
        for s in range(step + 1):
            path = self._manifest_path(s)
            if os.path.exists(path):
                with open(path) as f:
                    out.append(json.load(f))
        return out
