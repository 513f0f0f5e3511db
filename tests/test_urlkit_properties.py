"""Property-based hardening of the pure URL kernel (functions/urlkit.py).

The golden vectors in test_urlkit.py pin reference parity; these properties
pin what a crawler needs on ADVERSARIAL input: the kernel must never raise
(every candidate string on the open web flows through it inside the Arrow
stage — one exception would fail a whole task), and its canonicalizers must
be idempotent (otherwise the seen-set key of a URL depends on how many times
it was normalized, breaking dedup).
"""

import string

from hypothesis import given, settings, strategies as st

from suckit_spark.functions import urlkit

# web-shaped garbage: printable ASCII plus non-ASCII codepoints
_URLISH = st.text(
    alphabet=string.printable + "\u00e9\u4e2d\u6587\u2026",
    max_size=80)
_BASE = st.one_of(
    st.just("http://example.com/a/b/index.html"),
    st.just("https://h.example:8080/x/"),
    st.just("http://127.0.0.1/"),
    _URLISH.map(lambda s: "http://example.com/" + s),
)

_SETTINGS = dict(max_examples=300, deadline=None)


@settings(**_SETTINGS)
@given(_URLISH)
def test_kernel_total_on_arbitrary_strings(s):
    # every public scalar must be total: no exception on any string
    urlkit.normalize_url(s)
    urlkit.has_scheme(s)
    urlkit.parse_url(s)
    urlkit.strip_fragment(s)
    urlkit.url_host(s)
    urlkit.url_domain(s)
    urlkit.visit_url_shape_ok(s)


@settings(**_SETTINGS)
@given(_BASE, _URLISH)
def test_resolve_total_and_schemed(base, cand):
    got = urlkit.resolve(base, cand)
    assert got is None or got.split(":", 1)[0] in ("http", "https")


@settings(**_SETTINGS)
@given(_URLISH)
def test_normalize_idempotent(s):
    once = urlkit.normalize_url(s)
    assert urlkit.normalize_url(once) == once


@settings(**_SETTINGS)
@given(_URLISH)
def test_strip_fragment_idempotent_and_fragment_free(s):
    once = urlkit.strip_fragment(s)
    assert "#" not in once
    assert urlkit.strip_fragment(once) == once


@settings(**_SETTINGS)
@given(_BASE, st.booleans())
def test_to_path_is_a_safe_relative_path(url, with_fragment):
    p = urlkit.to_path(url, with_fragment)
    assert isinstance(p, str) and p
    assert not p.startswith("/")          # stays inside the mirror root
    assert ".." not in p.split("/")       # cannot escape it


@settings(**_SETTINGS)
@given(_BASE, _BASE)
def test_relative_link_total(a, b):
    pa = urlkit.to_path(a, False)
    pb = urlkit.to_path(b, False)
    rel = urlkit.relative_link(pa, pb)
    assert isinstance(rel, str)
