"""robots.txt rules as broadcast state OR a distributed rules table
(north_rule extension — the reference has no robots support).

Two gates, same semantics, chosen by host count (``CrawlConfig.
robots_join_threshold``):

* **broadcast dict** (the default, small host counts): rules are collected
  once from the pages table, parsed on the driver, broadcast to executors;
  candidate filtering is a vectorized pandas UDF over the broadcast dict.
* **rules-table join** (the 10^8-host design point, where the dict itself
  is GBs): robots bodies are parsed executor-side into a ``(host,
  prefixes)`` DataFrame and candidates are gated by ONE equi-join on host
  plus a JVM-side prefix predicate — no driver collect of the rules at all.

Disallowed URLs are dropped at discovery time — never enqueued, never added
to the seen set (they remain eligible if the rules change on a later crawl).

Agent sections: a rule group applies to the crawl when one of its
``User-agent`` tokens is a case-insensitive substring of the configured UA;
groups for ``*`` are the fallback used only when no specific group matches
(the standard robots exclusion semantics). Consecutive ``User-agent`` lines
share the group that follows them.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import BooleanType

from ..functions import urlkit


def parse_robots(content: str, user_agent: str | None = None) -> list[str]:
    """Extract the Disallow path prefixes that apply to this crawl.

    Groups whose agent token matches ``user_agent`` by case-insensitive
    substring win; ``*`` groups apply only when no specific group matched.
    ``user_agent=None`` keeps only the ``*`` groups (an anonymous probe).
    """
    groups: list[tuple[list[str], list[str]]] = []  # (agent tokens, prefixes)
    agents: list[str] = []
    prefixes: list[str] = []
    in_agent_run = False
    for raw_line in content.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_agent_run:
                if agents:
                    groups.append((agents, prefixes))
                agents, prefixes = [], []
                in_agent_run = True
            agents.append(value.lower())
        else:
            in_agent_run = False
            if key == "disallow" and value:
                prefixes.append(value)
    if agents:
        groups.append((agents, prefixes))

    ua = (user_agent or "").lower()
    specific: list[str] = []
    star: list[str] = []
    for toks, pfx in groups:
        if ua and any(t and t != "*" and t in ua for t in toks):
            specific.extend(pfx)
        if "*" in toks:
            star.extend(pfx)
    return specific if specific else star


def parse_crawl_delay(content: str,
                      user_agent: str | None = None) -> float | None:
    """Extract the ``Crawl-delay`` (seconds) that applies to this crawl —
    same group-selection semantics as :func:`parse_robots` (specific-agent
    groups win, ``*`` is the fallback; the directive is a de-facto standard,
    not in RFC 9309, but honored by most polite crawlers). Returns ``None``
    when no applicable group sets one or the value does not parse."""
    groups: list[tuple[list[str], float | None]] = []
    agents: list[str] = []
    delay: float | None = None
    in_agent_run = False
    for raw_line in content.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, value = line.partition(":")
        key = key.strip().lower()
        value = value.strip()
        if key == "user-agent":
            if not in_agent_run:
                if agents:
                    groups.append((agents, delay))
                agents, delay = [], None
                in_agent_run = True
            agents.append(value.lower())
        else:
            in_agent_run = False
            if key == "crawl-delay":
                try:
                    parsed = float(value)
                    delay = parsed if parsed >= 0 else None
                except ValueError:
                    pass
    if agents:
        groups.append((agents, delay))

    ua = (user_agent or "").lower()
    specific: float | None = None
    star: float | None = None
    for toks, d in groups:
        if d is None:
            continue
        if ua and any(t and t != "*" and t in ua for t in toks):
            specific = max(specific or 0.0, d)
        if "*" in toks:
            star = max(star or 0.0, d)
    return specific if specific is not None else star


def collect_robots_rules(pages: DataFrame,
                         user_agent: str | None = None) -> dict[str, list[str]]:
    """One pass over the corpus for ``*/robots.txt`` rows -> host -> prefixes.
    Driver-side (broadcast-dict mode) — use :func:`robots_rules_df` when the
    host count makes the dict unreasonable."""
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
        rules[host] = parse_robots(
            bytes(r.html).decode("utf-8", errors="replace"), user_agent)
    return rules


def robots_rules_df(pages: DataFrame,
                    user_agent: str | None = None) -> DataFrame:
    """Distributed rules table ``(host string, prefixes array<string>)``:
    robots bodies are parsed where they live (one Arrow stage; the parse is
    inherently per-document) and the result never touches the driver. The
    scale path behind :func:`apply_robots_join`."""
    import pyarrow  # noqa: F401  (arrow transport for the parse stage)

    raw = (pages.filter(F.col("url").endswith("/robots.txt"))
           .select("url", "html"))

    def parse_batch(batches):
        for pdf in batches:
            hosts, prefixes = [], []
            for u, body in zip(pdf["url"], pdf["html"]):
                host = urlkit.url_host(u)
                if host is None or body is None:
                    continue
                hosts.append(host)
                prefixes.append(parse_robots(
                    bytes(body).decode("utf-8", errors="replace"),
                    user_agent))
            yield pd.DataFrame({"host": hosts, "prefixes": prefixes})

    return raw.mapInPandas(parse_batch, "host string, prefixes array<string>")


def apply_robots_join(candidates: DataFrame, rules_df: DataFrame,
                      url_col: str = "url") -> DataFrame:
    """Join-based robots gate: ONE left equi-join of candidates against the
    rules table on host, then a JVM-side prefix predicate — the shape that
    survives a rules table too big to broadcast (Catalyst still broadcasts a
    small one on its own). Hosts with no rules row pass (allow-by-default,
    same as the dict gate)."""
    host = F.lower(F.parse_url(F.col(url_col), F.lit("HOST")))
    path = F.coalesce(
        F.nullif(F.parse_url(F.split(F.col(url_col), "#", 2).getItem(0),
                             F.lit("PATH")), F.lit("")),
        F.lit("/"))
    tagged = candidates.withColumn("__rhost", host).withColumn("__rpath", path)
    joined = tagged.join(
        rules_df.select(F.col("host").alias("__rhost"), "prefixes"),
        on="__rhost", how="left")
    blocked = F.exists(
        "prefixes", lambda p: F.col("__rpath").startswith(p))
    return (joined.filter(F.col("prefixes").isNull() | ~blocked)
            .drop("__rhost", "__rpath", "prefixes"))


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
