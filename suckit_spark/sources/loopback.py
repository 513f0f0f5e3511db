"""In-process loopback HTTP site — the live-fetch bench/test surface.

The reference benchmarks by running the crawler against a real site for a
fixed wall time and counting downloaded pages (reference
/root/reference/tests/benchmark.py:21-77, RUN_TIME + page count). The
sandbox has no external network, so this module serves that role: a
deterministic single-host site of ``n_pages`` generated pages over a
``ThreadingHTTPServer`` bound to 127.0.0.1 (an OS-assigned port), which the
live-fetch crawl (``CrawlConfig(live_fetch=True)``) GETs over real sockets.

Page bodies use the same deterministic stride-link construction as the
synthetic corpus (sources/corpus.py): page ``j`` links ``fanout`` pages
``(j*k + k + seed) % n_pages``. Everything is a pure function of
(n_pages, fanout, seed) — no randomness, no external data.
"""

from __future__ import annotations

import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


def site_paths(n_pages: int, fanout: int = 3, seed: int = 42,
               body_kb: int = 0) -> dict[str, bytes]:
    """Deterministic path -> body map for an ``n_pages`` single-host site."""
    pages: dict[str, bytes] = {}
    filler = ""
    if body_kb > 0:
        para = ("<p>Deterministic loopback filler: the quick brown fox "
                "jumps over the lazy dog.</p>\n")
        filler = para * max(1, (body_kb * 1024) // len(para))
    for j in range(n_pages):
        links = "".join(
            f'<a href="p{(j * k + k + seed) % n_pages}.html">l{k}</a>\n'
            for k in range(1, fanout + 1))
        body = ("<!DOCTYPE html>\n<html><head><meta charset=\"UTF-8\">"
                f"<title>p{j}</title></head>\n<body>\n<p>loopback page {j} "
                f"seed {seed}.</p>\n" + filler + links + "</body></html>\n")
        pages[f"/p{j}.html"] = body.encode("utf-8")
    return pages


class LoopbackSite:
    """Context manager: serve a deterministic site on 127.0.0.1, yield the
    base URL (``http://127.0.0.1:<port>``)."""

    def __init__(self, n_pages: int, fanout: int = 3, seed: int = 42,
                 body_kb: int = 0, robots_txt: bytes | None = None,
                 tls_cert: tuple[str, str] | None = None):
        self.site = site_paths(n_pages, fanout, seed, body_kb)
        if robots_txt is not None:
            self.site["/robots.txt"] = robots_txt
        self.n_pages = n_pages
        #: ``(certfile, keyfile)`` paths: serve over TLS (self-signed in
        #: tests — clients opt out of verification via
        #: ``disable_certs_checks``, the reference's ``--disable-certs-checks``
        #: surface). Exercises the pooled HTTPS handler end-to-end.
        self.tls_cert = tls_cert
        self._srv: ThreadingHTTPServer | None = None
        self._thread: threading.Thread | None = None
        self.requests_served = 0
        #: Distinct TCP connections accepted — with keep-alive clients this
        #: stays far below ``requests_served``; tests assert connection
        #: reuse through it.
        self.connections_opened = 0

    def __enter__(self) -> str:
        outer = self

        class _Handler(BaseHTTPRequestHandler):
            # HTTP/1.1 + Content-Length == persistent connections, like any
            # real web server; the reference's pooled reqwest client (and our
            # pooled opener) reuses one TCP connection for a whole host.
            protocol_version = "HTTP/1.1"
            # Keep-alive + BaseHTTPRequestHandler's unbuffered small writes
            # (status line, each header, body are separate send()s) triggers
            # the Nagle/delayed-ACK interaction: ~40 ms stall PER REQUEST
            # once the connection is reused. Real servers set TCP_NODELAY;
            # so do we, or the bench measures kernel timers, not the engine.
            disable_nagle_algorithm = True

            def setup(self):
                outer.connections_opened += 1
                super().setup()

            def do_GET(self):
                outer.requests_served += 1
                body = outer.site.get(self.path)
                if body is None:
                    body = b"<html>404</html>"
                    self.send_response(404)
                else:
                    self.send_response(200)
                self.send_header("Content-Type", "text/html")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        self._srv = ThreadingHTTPServer(("127.0.0.1", 0), _Handler)
        scheme = "http"
        if self.tls_cert is not None:
            import ssl

            ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
            ctx.load_cert_chain(*self.tls_cert)
            # wrap the LISTENING socket: each accept() hands the handler
            # thread an SSLSocket (handshake runs per-connection there)
            self._srv.socket = ctx.wrap_socket(
                self._srv.socket, server_side=True)
            scheme = "https"
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True)
        self._thread.start()
        return f"{scheme}://127.0.0.1:{self._srv.server_address[1]}"

    def __exit__(self, *exc):
        if self._srv is not None:
            self._srv.shutdown()
            self._srv.server_close()
        return False
