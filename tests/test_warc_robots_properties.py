"""Property-based hardening of the WARC and robots.txt parsers — the same
treatment the URL kernel got (test_urlkit_properties.py). Both parsers eat
UNTRUSTED bytes (a crawled host's robots.txt; Common-Crawl-style archives),
executor-side, inside tasks: one uncaught exception fails a whole task, so
totality is a correctness property, not a nicety. The WARC writer->reader
round-trip is the source/sink contract on arbitrary record sets, not just
the handcrafted fixtures.
"""

import string

from hypothesis import given, settings, strategies as st

from suckit_spark.operators import robots
from suckit_spark.sources import warc

_SETTINGS = dict(max_examples=200, deadline=None)

# robots-shaped garbage: directive-ish lines, weird whitespace, non-ASCII
_ROBOTS_TEXT = st.text(
    alphabet=string.printable + "é中文",
    max_size=400)
_AGENT = st.one_of(st.none(), st.text(alphabet=string.ascii_letters + "-*",
                                      max_size=20))


@settings(**_SETTINGS)
@given(_ROBOTS_TEXT, _AGENT)
def test_robots_parser_total(content, agent):
    """parse_robots / parse_crawl_delay never raise on arbitrary text and
    return their declared shapes."""
    prefixes = robots.parse_robots(content, user_agent=agent)
    assert isinstance(prefixes, list)
    assert all(isinstance(p, str) for p in prefixes)
    delay = robots.parse_crawl_delay(content, user_agent=agent)
    assert delay is None or (isinstance(delay, float) and delay >= 0)


@settings(**_SETTINGS)
@given(st.binary(max_size=600))
def test_warc_parser_total_on_arbitrary_bytes(raw):
    """iter_warc_records never raises on arbitrary bytes — it parses what
    frames correctly and drops the rest."""
    for wh, hh, body in warc.iter_warc_records(raw):
        assert isinstance(wh, dict) and isinstance(body, bytes)


# Arbitrary-but-valid record sets for the round-trip: bodies are arbitrary
# bytes (including CRLFs and WARC magic), urls printable without CR/LF
# (header lines are line-framed — a newline in a header value is a different
# record on the wire, not a parser bug).
_RECORD = st.fixed_dictionaries({
    "url": st.text(alphabet=string.digits + string.ascii_letters + ":/._-",
                   min_size=1, max_size=60).map(lambda s: "http://h/" + s),
    "status": st.sampled_from([200, 301, 404, 500]),
    "content_type": st.sampled_from(
        ["text/html", "text/html; charset=UTF-8", "application/pdf"]),
    "ts": st.none(),
    "body": st.binary(max_size=300),
})


@settings(**_SETTINGS)
@given(st.lists(_RECORD, max_size=8), st.booleans())
def test_warc_roundtrip_arbitrary_records(records, compress):
    raw = warc.build_warc_bytes(records, compress=compress)
    got = list(warc.iter_warc_records(raw))
    assert [wh["warc-target-uri"] for wh, _, _ in got] == [
        r["url"] for r in records]
    assert [body for _, _, body in got] == [r["body"] for r in records]
    assert [hh["__status"] for _, hh, _ in got] == [
        str(r["status"]) for r in records]
