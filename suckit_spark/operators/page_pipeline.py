"""The fused per-page map stage (reference P1-P11) as one Arrow-vectorized UDF.

The reference runs, per fetched page: charset detect -> decode to UTF-8 ->
HTML parse -> link extraction in document order -> visit filter -> URL
normalize/resolve -> path mapping -> in-place link rewrite -> serialize ->
re-encode to the original charset (scraper.rs:144-228). All of that is pure
(no shared state: the only map lookup, source path, equals ``to_path(url,
False)``), so the whole pipeline fuses into a single ``mapInPandas`` stage —
no shuffle between P1 and P11, Arrow batches in and out, zero per-row Python
on the Spark side (BASELINE.json:input_hint).

``process_page`` is the scalar core; the oracle (oracle.py) calls it directly,
which keeps the distributed engine and the golden single-threaded
implementation byte-for-byte aligned.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from ..config import CrawlConfig
from ..functions import htmlkit, urlkit


class LinkResolutionError(ValueError):
    """URL join failure — the reference panics here unconditionally
    (scraper.rs:195)."""


def fetch_result(cfg: CrawlConfig, row: dict) -> tuple[bytes | None, str | None, int, bool]:
    """Simulate the fetch against the pages table (sandbox realization of
    downloader.rs:116-171): returns (body, content_type, http_status, found).

    * URL absent from the corpus -> (None, None, 0, False): fetch error after
      retries (downloader.rs:174-184); the join can never transiently fail, so
      the retry loop collapses.
    * 401 when the page requires auth and the broadcast auth map has no
      matching-host entry with matching credentials: the reference receives the
      (empty, text/html-defaulted) 401 body and processes it like any response
      (auth.rs:13-40 — "only the 401 body saved").
    """
    if not row.get("found"):
        return None, None, 0, False
    if row.get("requires_auth"):
        host = urlkit.url_host(row["fetch_url"])
        cred = cfg.auth_map().get(host) if host else None
        expected = (row.get("auth_user"), row.get("auth_pass") or None)
        if cred is None or (cred[0], cred[1]) != expected:
            return b"", None, 401, True
    status = row.get("status") or 200
    return row.get("html") or b"", row.get("content_type"), int(status), True


def process_page(cfg: CrawlConfig, url: str, body: bytes,
                 content_type: str | None) -> dict:
    """Run P1-P11 for one page. Returns a dict with:

    kind ('html'|'other'), content (output bytes), filename, charset,
    page_text, links: list of {raw, url, pos, external} for candidates that
    passed the visit filter (scraper.rs:187-219 — note every passing candidate
    is rewritten in the output, even when it is already seen or depth-gated).
    """
    data_type = htmlkit.header_data_type(content_type)
    if not htmlkit.is_html_type(data_type):
        return {
            "kind": "other",
            "content": body,
            "filename": htmlkit.content_disposition_filename(None),
            "charset": None,
            "page_text": None,
            "links": [],
        }

    http_charset = htmlkit.header_charset(content_type)
    charset = htmlkit.find_charset(body, http_charset) or "utf-8"
    convert = htmlkit.needs_charset_conversion(charset)
    if convert:
        text = htmlkit.decode_html(body, charset)
    else:
        # Reference path: bytes assumed UTF-8, lossy decode for parsing
        # (scraper.rs:181) — this is what makes undeclared-charset pages
        # round-trip lossily (charset_*_not_found.rs negative controls).
        text = body.decode("utf-8", errors="replace")

    source_path = urlkit.to_path(url, False)
    links: list[dict] = []
    replacements: list[tuple[int, int, str]] = []
    # ONE parser pass yields both the link spans (P4) and the visible text
    # (the engine's text-column contract) — parsing twice would double the
    # dominant per-page cost.
    scanned_links, page_text = htmlkit.scan_page(text)
    for pos, link in enumerate(scanned_links):
        raw = link["value"]
        if not cfg.visit_ok(raw):
            continue
        normalized = urlkit.normalize_url(raw)
        full = urlkit.resolve(url, normalized)
        if full is None:
            raise LinkResolutionError(f"Failed to parse url: {raw!r} (page {url})")
        dest_path = urlkit.to_path(full, True)
        rel = urlkit.relative_link(source_path, dest_path)
        replacements.append((link["start"], link["end"], rel))
        links.append({
            "raw": raw,
            "url": full,
            "pos": pos,
            "external": urlkit.is_on_another_domain(raw, url),
        })

    out_text = htmlkit.splice(text, replacements)
    if convert:
        out = htmlkit.encode_html(out_text, charset)
    else:
        out = out_text.encode("utf-8")

    return {
        "kind": "html",
        "content": out,
        "filename": None,  # content-disposition applies to non-html only
        "charset": charset,
        "page_text": page_text,
        "links": links,
    }


def make_page_pipeline(cfg: CrawlConfig, emit_page_text: bool = True):
    """Build the ``mapInPandas`` function for one superstep's fetched frontier.

    Input batches carry the frontier columns plus the left-joined pages columns
    and a ``found`` flag; output matches schemas.PAGE_RESULT_SCHEMA.

    ``emit_page_text=False`` nulls the page_text column (the text is still
    extracted — it falls out of the single parse pass — but is not shipped
    through Arrow; the crawl loop consumes links/content only, and for an
    HTML-heavy superstep the text roughly doubles the Arrow payload).
    """

    def pipeline(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_rows = []
            for row in pdf.to_dict("records"):
                body, ctype, http_status, found = fetch_result(cfg, row)
                base = {
                    "url": row["url"],
                    "fetch_url": row["fetch_url"],
                    "depth": row["depth"],
                    "ext_depth": row["ext_depth"],
                    "superstep": row["superstep"],
                    "order_key": row["order_key"],
                    "http_status": http_status,
                    "download": cfg.download_ok(row["url"]),
                    # live mode: response Set-Cookie rides through to the
                    # driver's relay store (None in corpus mode)
                    "set_cookie": row.get("set_cookie"),
                }
                if not found:
                    out_rows.append({
                        **base, "status": "error", "kind": None, "path": None,
                        "filename": None, "content": None, "page_text": None,
                        "charset": None, "links": [],
                    })
                    continue
                res = process_page(cfg, row["url"], bytes(body), ctype)
                out_rows.append({
                    **base,
                    "status": "ok",
                    "kind": res["kind"],
                    "path": urlkit.to_path(row["url"], False),
                    "filename": htmlkit.content_disposition_filename(
                        row.get("content_disposition"))
                    if res["kind"] == "other" else None,
                    "content": res["content"],
                    "page_text": res["page_text"] if emit_page_text else None,
                    "charset": res["charset"],
                    "links": res["links"],
                })
            yield pd.DataFrame(out_rows) if out_rows else pd.DataFrame(
                columns=["url", "fetch_url", "depth", "ext_depth", "superstep",
                         "order_key", "status", "http_status", "kind", "path",
                         "filename", "content", "page_text", "charset",
                         "download", "links", "set_cookie"])

    return pipeline
