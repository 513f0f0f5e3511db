"""Deterministic fixture corpora mirroring the reference's integration-test
sites (/root/reference/tests/fixtures/, FIXTURES.md §2-3).

Rows follow schemas.PAGES_SCHEMA; builders return plain dicts so the oracle
consumes them directly and ``pages_df`` lifts them into Spark.
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame, SparkSession

from ..functions import htmlkit
from ..schemas import PAGES_SCHEMA

WARC_TS = datetime.datetime(2026, 1, 1, 0, 0, 0)

INDEX_HTML = b"""<!DOCTYPE html>
<html lang="en">
<head>
    <meta charset="UTF-8">
    <meta name="viewport" content="width=device-width, initial-scale=1.0">
    <title>Test page for suckit</title>
</head>
<body>
    <a href="jpeg.jpg" download>JPG File</a>
    <a href="mp3.mp3" download="">MP3 File</a>
    <a href="file.txt" download="">Text File</a>
    <a href="https://google.com" download="">Google</a>
    <a href="no_download_no_visit.html">No download</a>
</body>
</html>
"""

NO_DOWNLOAD_HTML = b"""<!DOCTYPE html>
<html lang="en">
<body>
    <a href="should_not_get_visited.html">Hidden</a>
</body>
</html>
"""

# 1x1 JFIF-ish bytes (content is opaque to the crawl; only byte identity matters)
JPEG_BYTES = bytes.fromhex("ffd8ffe000104a46494600010100000100010000ffd9")

#: windows-1252 page with a meta charset declaration; non-ASCII bytes 0xF8 (ø)
#: and 0xE5 (å); no trailing newline (charset_test_html.html).
CHARSET_META_HTML = (
    b'<html><head><meta content="text/html; charset=windows-1252" '
    b'http-equiv="Content-Type"></head>'
    b"<body>Gamle Valeb\xf8 kirke. Arbeid p\xe5g\xe5r.</body></html>"
)

#: same body, no meta charset (charset_test_html_no_meta.html).
CHARSET_NO_META_HTML = (
    b"<html><head></head>"
    b"<body>Gamle Valeb\xf8 kirke. Arbeid p\xe5g\xe5r.</body></html>"
)


def _row(url: str, body: bytes, content_type: str | None, *,
         content_disposition: str | None = None,
         requires_auth: bool = False,
         auth_user: str | None = None, auth_pass: str | None = None,
         lang: str = "en") -> dict:
    text = None
    if content_type and "text/html" in content_type or content_type is None:
        try:
            text = htmlkit.extract_text(body.decode("utf-8", errors="replace"))
        except Exception:
            text = None
    return {
        "url": url,
        "warc_ts": WARC_TS,
        "html": body,
        "text": text,
        "lang": lang,
        "content_type": content_type,
        "content_disposition": content_disposition,
        "requires_auth": requires_auth,
        "auth_user": auth_user,
        "auth_pass": auth_pass,
        "status": 200,
    }


def site_a(requires_auth: bool = False) -> list[dict]:
    """Filter/external/auth site on an IP host (FIXTURES.md §2). The IP host
    exercises the Url::domain()==None rule (scraper.rs:393)."""
    auth = dict(requires_auth=requires_auth,
                auth_user="username" if requires_auth else None,
                auth_pass="password" if requires_auth else None)
    return [
        _row("http://0.0.0.0/", INDEX_HTML, "text/html", **auth),
        _row("http://0.0.0.0/jpeg.jpg", JPEG_BYTES, "image/jpeg", **auth),
        _row("http://0.0.0.0/mp3.mp3", b"", "audio/mpeg", **auth),
        _row("http://0.0.0.0/file.txt", b"Hello", "text/plain", **auth),
        _row("http://0.0.0.0/no_download_no_visit.html", NO_DOWNLOAD_HTML,
             "text/html", **auth),
        _row("http://0.0.0.0/should_not_get_visited.html", b"<html></html>",
             "text/html", **auth),
        _row("https://google.com/", b"<html><body>g</body></html>", "text/html"),
    ]


def site_charset(meta: bool, header_charset: bool) -> list[dict]:
    """Charset round-trip single-page sites (FIXTURES.md §3)."""
    body = CHARSET_META_HTML if meta else CHARSET_NO_META_HTML
    ctype = "text/html; charset=windows-1252" if header_charset else "text/html"
    return [_row("http://0.0.0.0/charset.html", body, ctype, lang="no")]


def site_disposition() -> list[dict]:
    """A page linking a non-html asset served with content-disposition, to
    exercise the filename + symlink sink (scraper.rs:263-271)."""
    index = (b'<html><body><a href="track.mp3">dl</a></body></html>')
    return [
        _row("http://0.0.0.0/", index, "text/html"),
        _row("http://0.0.0.0/track.mp3", b"MP3DATA", "audio/mpeg",
             content_disposition='attachment; filename=named_track.mp3'),
    ]


def pages_dict(rows: list[dict]) -> dict[str, dict]:
    """Oracle-side corpus: fragment-free url -> row."""
    return {r["url"]: r for r in rows}


def pages_df(spark: SparkSession, rows: list[dict]) -> DataFrame:
    return spark.createDataFrame(rows, PAGES_SCHEMA)
