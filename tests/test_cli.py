"""CLI parity: ``python -m suckit_spark`` accepts the reference binary's
exact flag surface (args.rs:8-162 — same long/short names and defaults) and
drives the same crawl the library API does, writing a real mirror tree.
"""

import json
import os

import pytest

from suckit_spark.__main__ import build_parser, main
from suckit_spark.schemas import PAGES_SCHEMA

from .test_live_fetch import site_server, _pages_rows  # noqa: F401  (fixture)


def test_defaults_match_reference():
    # args.rs defaults: jobs=1, depth=-1, ext_depth=0, tries=20, delay=0,
    # random_range=0, user_agent="suckit", cookie="", include=".*",
    # exclude="$^", flags off.
    a = build_parser().parse_args(["http://example.com/"])
    assert a.url == "http://example.com/"
    assert a.output is None and a.jobs == 1 and a.depth == -1
    assert a.ext_depth == 0 and a.tries == 20
    assert a.delay == 0 and a.random_range == 0
    assert a.user_agent == "suckit" and a.cookie == ""
    assert a.include_visit == ".*" and a.exclude_visit == "$^"
    assert a.include_download == ".*" and a.exclude_download == "$^"
    assert not a.visit_filter_is_download_filter
    assert a.auth == [] and not a.continue_on_error
    assert not a.dry_run and not a.disable_certs_checks and not a.verbose


def test_every_reference_flag_parses():
    # one invocation exercising all 19 reference fields, shorts included
    a = build_parser().parse_args([
        "http://example.com/", "-o", "out", "-j", "4", "-d", "2",
        "--ext-depth", "1", "-t", "3", "-v", "--delay", "1",
        "--random-range", "2", "-u", "myua", "--cookie", "k=v;s=1",
        "--include-visit", "iv", "--exclude-visit", "ev",
        "-i", "idl", "-e", "edl", "--visit-filter-is-download-filter",
        "-a", "u1 p1 h1", "-a", "u2", "p2", "h2",
        "-c", "--dry-run", "--disable-certs-checks",
    ])
    assert (a.output, a.jobs, a.depth, a.ext_depth, a.tries) == \
        ("out", 4, 2, 1, 3)
    assert (a.delay, a.random_range) == (1, 2)
    assert a.user_agent == "myua" and a.cookie == "k=v;s=1"
    assert (a.include_visit, a.exclude_visit) == ("iv", "ev")
    assert (a.include_download, a.exclude_download) == ("idl", "edl")
    assert a.visit_filter_is_download_filter and a.continue_on_error
    assert a.dry_run and a.disable_certs_checks and a.verbose
    # both quoted-triple and separate-token auth forms survive chunking
    flat = [t for g in a.auth for item in g for t in item.split()]
    assert flat == ["u1", "p1", "h1", "u2", "p2", "h2"]


def _mirror_files(root):
    out = {}
    for dirpath, _dirs, files in os.walk(root):
        for f in files:
            p = os.path.join(dirpath, f)
            out[os.path.relpath(p, root)] = open(p, "rb").read()
    return out


def test_cli_live_crawl_writes_mirror(spark, site_server, tmp_path, capsys):  # noqa: F811
    out = tmp_path / "mirror"
    rc = main([f"{site_server}/index.html", "-o", str(out), "-j", "2", "-c",
               "-u", "cli-ua"], spark=spark)
    assert rc == 0
    stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert stats["crawl"]["urls_visited"] >= 3
    files = _mirror_files(out)
    # to_path drops the port (reference url.host_str() parity)
    host = site_server.split("//")[1].split(":")[0]
    names = set(files)
    assert any(p.endswith("index.html") and p.startswith(host) for p in names)
    assert any(p.endswith("a.html") for p in names)
    assert any(p.endswith("b.html") for p in names)
    # intra-site links rewritten to local relative paths
    index = next(files[p] for p in names if p.endswith("index.html"))
    assert b"ext.example/x.html" in index  # cross-host rewrite target


def test_cli_dry_run_writes_nothing(spark, site_server, tmp_path):  # noqa: F811
    out = tmp_path / "mirror"
    rc = main([f"{site_server}/index.html", "-o", str(out), "-c",
               "--dry-run"], spark=spark)
    assert rc == 0
    assert not out.exists() or _mirror_files(out) == {}


def test_cli_pages_parquet_replay_equals_live(spark, site_server, tmp_path, capsys):  # noqa: F811
    rows = _pages_rows(site_server)
    pq = str(tmp_path / "pages")
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(pq)

    live_out = tmp_path / "live"
    assert main([f"{site_server}/index.html", "-o", str(live_out), "-c"],
                spark=spark) == 0
    replay_out = tmp_path / "replay"
    assert main([f"{site_server}/index.html", "-o", str(replay_out), "-c",
                 "--pages-parquet", pq], spark=spark) == 0
    capsys.readouterr()
    assert _mirror_files(live_out) == _mirror_files(replay_out)


def test_cli_abort_without_continue_on_error_exits_nonzero(spark, site_server, tmp_path, capsys):  # noqa: F811
    # Replay corpus missing b.html: its fetch fails, and without -c the
    # reference panics on a download error (scraper.rs:275-281) — the CLI
    # returns rc 1.
    rows = [r for r in _pages_rows(site_server) if not r["url"].endswith("b.html")]
    pq = str(tmp_path / "pages")
    spark.createDataFrame(rows, PAGES_SCHEMA).write.parquet(pq)
    rc = main([f"{site_server}/index.html", "-o", str(tmp_path / "m"),
               "--pages-parquet", pq], spark=spark)
    assert rc == 1
    assert "ERROR" in capsys.readouterr().err


def test_cli_resume_from_checkpoint(spark, site_server, tmp_path, capsys):  # noqa: F811
    pq = str(tmp_path / "pages")
    spark.createDataFrame(_pages_rows(site_server), PAGES_SCHEMA).write.parquet(pq)
    ck = str(tmp_path / "ck")
    url = f"{site_server}/index.html"

    # straight run for the expected mirror
    full_out = tmp_path / "full"
    assert main([url, "-o", str(full_out), "-c", "--pages-parquet", pq],
                spark=spark) == 0

    # interrupted run (one superstep), then resume to completion
    part_out = tmp_path / "part"
    assert main([url, "-o", str(part_out), "-c", "--pages-parquet", pq,
                 "--checkpoint-dir", ck, "--max-supersteps", "1"],
                spark=spark) == 0
    resumed_out = tmp_path / "resumed"
    assert main([url, "-o", str(resumed_out), "-c", "--pages-parquet", pq,
                 "--checkpoint-dir", ck, "--resume"], spark=spark) == 0
    capsys.readouterr()

    assert _mirror_files(resumed_out) == _mirror_files(full_out)
    assert set(_mirror_files(part_out)) < set(_mirror_files(full_out))

    # --resume without --checkpoint-dir is a usage error
    assert main([url, "-c", "--pages-parquet", pq, "--resume"],
                spark=spark) == 2
