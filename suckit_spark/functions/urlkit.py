"""Pure URL kernel: normalization, resolution, path mapping, domain classification.

These are from-scratch Python implementations of the URL semantics the reference
crawler exhibits (suckit: /root/reference/src/url_helper.rs, scraper.rs). They are
referentially transparent, which is what lets the Spark engine treat the entire
URL -> local-path mapping as a column expression instead of shared mutable state
(the reference keeps a global ``path_map`` under a mutex, scraper.rs:44; the value
stored there is always ``to_path(url, False)``, i.e. a pure function of the key,
so no distributed state is needed at all).

Every function here is used both by the vectorized Arrow UDFs (operators/) and by
the single-threaded pure-Python oracle (oracle.py) so the two stay in lockstep.
"""

from __future__ import annotations

import hashlib
import ipaddress
import posixpath
import re
from urllib.parse import urljoin, urlsplit

#: Max file name size supported by the file system (url_helper.rs:7)
FILE_NAME_MAX_LENGTH = 255

#: Schemes the WHATWG URL spec treats as "special" (always have a host,
#: empty path serializes as "/", default ports are elided).
SPECIAL_SCHEMES = {"http": 80, "https": 443, "ws": 80, "wss": 443, "ftp": 21}

_SCHEME_RE = re.compile(r"^[a-zA-Z][a-zA-Z0-9+.\-]*:")


def normalize_url(url: str) -> str:
    """Scheme-relative URL crash guard (scraper.rs:371-381).

    ``///rest`` -> ``https://rest``; ``//rest`` -> ``https://rest`` (first
    occurrence only, prefix anchored — exact ``replacen(..., 1)`` semantics).
    """
    if url.startswith("///"):
        return "https://" + url[3:]
    if url.startswith("//"):
        return "https://" + url[2:]
    return url


def has_scheme(url: str) -> bool:
    """True when the candidate would parse as an *absolute* URL (Url::parse Ok)."""
    return _SCHEME_RE.match(url) is not None


def _encode_byte(b: int) -> str:
    return "%%%02X" % b


def _percent_encode(s: str, extra_unsafe: str) -> str:
    """Minimal WHATWG-ish percent-encoding: controls, space, non-ASCII, plus
    ``extra_unsafe``. Existing ``%`` escapes are left untouched (no re-encode)."""
    out = []
    for ch in s:
        o = ord(ch)
        if o <= 0x20 or o > 0x7E or ch in extra_unsafe:
            out.append("".join(_encode_byte(b) for b in ch.encode("utf-8")))
        else:
            out.append(ch)
    return "".join(out)


class ParsedUrl:
    """Lightweight parsed/normalized URL mirroring the pieces of ``url::Url``
    the reference relies on: scheme, host (lowercased, port-free ``host_str``),
    port, percent-encoded path, query, fragment presence/value."""

    __slots__ = ("scheme", "host", "port", "userinfo", "path", "query", "fragment")

    def __init__(self, scheme, host, port, userinfo, path, query, fragment):
        self.scheme = scheme
        self.host = host
        self.port = port
        self.userinfo = userinfo
        self.path = path
        self.query = query  # None = absent; "" = present-but-empty ("?")
        self.fragment = fragment  # None = absent; "" = present-but-empty ("#")

    def serialize(self, with_fragment: bool = True) -> str:
        """Canonical string form, matching ``Url::as_str()`` normalization:
        lowercased scheme/host, default port elided, empty path -> "/" for
        special schemes."""
        netloc = self.host or ""
        if self.userinfo:
            netloc = self.userinfo + "@" + netloc
        if self.port is not None and SPECIAL_SCHEMES.get(self.scheme) != self.port:
            netloc = f"{netloc}:{self.port}"
        path = self.path
        if not path and self.scheme in SPECIAL_SCHEMES:
            path = "/"
        s = f"{self.scheme}://{netloc}{path}"
        if self.query is not None:
            s += "?" + self.query
        if with_fragment and self.fragment is not None:
            s += "#" + self.fragment
        return s


def parse_url(url: str) -> ParsedUrl | None:
    """Parse an absolute URL into normalized parts; ``None`` when it would not
    parse as absolute (mirrors ``Url::parse`` Err => treated as relative)."""
    if not has_scheme(url):
        return None
    sp = urlsplit(url)
    scheme = sp.scheme.lower()
    # Rust url parses "http:foo" leniently as http://foo/ for special schemes.
    rest = url[len(sp.scheme) + 1 :]
    if scheme in SPECIAL_SCHEMES and not rest.startswith("//"):
        stripped = rest.lstrip("/")
        sp = urlsplit(f"{scheme}://{stripped}")
    try:
        host = sp.hostname
        port = sp.port
    except ValueError:
        return None
    userinfo = ""
    if "@" in sp.netloc:
        userinfo = sp.netloc.rsplit("@", 1)[0]
    path = _percent_encode(sp.path, '"<>`{}')
    query = None
    if "?" in url.split("#", 1)[0]:
        query = _percent_encode(sp.query, '"<>`{}')
    fragment = None
    if "#" in url:
        fragment = _percent_encode(sp.fragment, '"<>`')
    if scheme in SPECIAL_SCHEMES and not path:
        path = "/"
    return ParsedUrl(scheme, host, port, userinfo, path, query, fragment)


def resolve(base_url: str, candidate: str) -> str | None:
    """RFC 3986 relative resolution of ``candidate`` against ``base_url`` then
    canonical re-serialization (``url.join`` call site, scraper.rs:191-196).
    Returns None on failure (the reference panics there; caller decides)."""
    joined = urljoin(base_url, candidate)
    p = parse_url(joined)
    if p is None or not p.host:
        return None
    return p.serialize(with_fragment=True)


def strip_fragment(url: str) -> str:
    return url.split("#", 1)[0]


def url_host(url: str) -> str | None:
    """Lowercased host without port (``Url::host_str``)."""
    p = parse_url(url)
    return p.host if p else None


def _domain_of_host(host: str | None) -> str | None:
    """``Url::domain()``: None for IP hosts (v4 dotted / bracketed v6)."""
    if not host:
        return None
    try:
        ipaddress.ip_address(host)
        return None
    except ValueError:
        return host


def url_domain(url: str) -> str | None:
    return _domain_of_host(url_host(url))


def is_on_another_domain(candidate: str, base_url: str) -> bool:
    """Domain classifier (scraper.rs:383-400): candidate is external iff it
    parses as an absolute URL (after normalize_url) and its ``domain()`` differs
    from the base page's. IP hosts have domain None, so two distinct IPs compare
    equal (None == None) — replicated deliberately: the reference integration
    tests crawl ``0.0.0.0`` and rely on ``google.com`` being the external one."""
    real = normalize_url(candidate)
    p = parse_url(real)
    if p is None:
        return False
    return _domain_of_host(p.host) != url_domain(base_url)


def visit_url_shape_ok(candidate: str) -> bool:
    """Pseudo-link filter (scraper.rs:357-368): an absolute candidate must have
    a host and be base-able (drops mailto:, javascript:, data:); strings that do
    not parse as absolute pass (they are relative paths, resolved later)."""
    if not has_scheme(candidate):
        return True
    sp = urlsplit(candidate)
    scheme = sp.scheme.lower()
    if scheme in SPECIAL_SCHEMES:
        # Rust parses special-scheme URLs leniently (so they have a host), and
        # an empty-host parse error means "treated as relative" — either way
        # the candidate passes this shape check.
        return True
    # Non-special scheme: has_host && !cannot_be_a_base requires an authority.
    rest = candidate[len(sp.scheme) + 1 :]
    return rest.startswith("//") and bool(sp.netloc)


def _rust_file_name(path_and_query: str) -> str:
    """``Path::file_name`` textual semantics on a URL path string: last
    component ignoring trailing slashes; '' for root/empty/'..'."""
    s = path_and_query.rstrip("/")
    if not s:
        return ""
    seg = s.rsplit("/", 1)[-1]
    if seg in ("..", "."):
        return ""
    return seg


def _rust_parent(path_and_query: str) -> str:
    """``Path::parent`` textual semantics: path minus its final component;
    parent of '/x' is '/', parent of root is ''."""
    s = path_and_query.rstrip("/")
    if not s:
        return ""
    head = s.rsplit("/", 1)[0]
    if head == "":
        return "/" if path_and_query.startswith("/") else ""
    return head


def _has_extension(filename: str) -> bool:
    """``Path::extension().is_some()``: a '.' after the first character."""
    return filename.rfind(".") > 0


def to_path(url: str, with_fragment: bool) -> str:
    """URL -> local mirror path. From-scratch reimplementation of the mapping in
    the reference (url_helper.rs:10-45): ``host + path[+ "__querystring__"+query]
    + filename``; trailing '/' -> index.html; extension-less final segment ->
    <seg>/index_no_slash.html; >255-char filename -> md5hex+'.html'; optional
    '#fragment' suffix. Pinned by the 8 golden vectors in url_helper.rs:47-127."""
    p = parse_url(url)
    if p is None or p.host is None:
        raise ValueError(f"to_path needs an absolute URL with host: {url!r}")
    pq = p.path or "/"
    if p.query is not None:
        pq += "__querystring__" + p.query

    filename = _rust_file_name(pq)
    parent = _rust_parent(pq)
    if pq.endswith("/"):
        filename = "index.html"
        parent = pq.rstrip("/")
    elif not _has_extension(filename):
        parent = pq.rstrip("/")
        filename = "index_no_slash.html"

    if len(filename) > FILE_NAME_MAX_LENGTH:
        filename = hashlib.md5(filename.encode("utf-8")).hexdigest() + ".html"

    if with_fragment and p.fragment is not None:
        return f"{p.host}{parent}/{filename}#{p.fragment}"
    return f"{p.host}{parent}/{filename}"


def relative_link(source_path: str, dest_path: str) -> str:
    """Relative path from the source page's directory to the destination path
    (fix_domtree, scraper.rs:94-102; pathdiff::diff_paths). Pure function of the
    two paths; '#fragment' suffixes ride along as ordinary characters."""
    source_parent = _rust_parent(source_path)
    rel = posixpath.relpath(dest_path, source_parent or ".")
    return rel


def canonical_origin(origin: str) -> str:
    """Normalize the configured origin exactly as ``Url::parse`` would."""
    p = parse_url(origin)
    if p is None or not p.host:
        raise ValueError(f"origin must be an absolute URL: {origin!r}")
    return p.serialize(with_fragment=True)
