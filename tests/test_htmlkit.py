"""HTML kit unit tests: link extraction order (dom.rs:56-76), charset regexes
(scraper.rs:467-489), header parsing (downloader.rs:89-147), span splicing."""

from suckit_spark.functions import htmlkit


def test_find_urls_document_order():
    # dom.rs:66-75 golden vector
    url1 = ("https://upload.wikimedia.org/wikipedia/commons/thumb/3/34/"
            "Anser_anser_1_%28Piotr_Kuczynski%29.jpg/800px-Anser_anser_1_"
            "%28Piotr_Kuczynski%29.jpg")
    html = f"<img src={url1}>\n            <img src=test>"
    links = htmlkit.scan_links(html)
    assert [l["value"] for l in links] == [url1, "test"]


def test_src_before_href_same_node():
    links = htmlkit.scan_links('<x href="b" src="a">')
    assert [l["value"] for l in links] == ["a", "b"]  # src first (dom.rs:8)


def test_quoted_and_unquoted_values():
    html = "<a href='single.html'>x</a><a href=unquoted.html>y</a>" \
           '<a href="double.html">z</a>'
    assert [l["value"] for l in htmlkit.scan_links(html)] == [
        "single.html", "unquoted.html", "double.html"]


def test_entities_unescaped_in_value():
    links = htmlkit.scan_links('<a href="a&amp;b.html">x</a>')
    assert links[0]["value"] == "a&b.html"
    assert links[0]["raw"] == "a&amp;b.html"


def test_script_and_comments_skipped():
    html = ('<script>var a = \'<a href="fake.html">\';</script>'
            '<!-- <a href="c.html"> --><a href="real.html">x</a>')
    assert [l["value"] for l in htmlkit.scan_links(html)] == ["real.html"]


def test_splice_preserves_everything_else():
    html = '<a href="old.html">x</a> tail'
    links = htmlkit.scan_links(html)
    out = htmlkit.splice(html, [(links[0]["start"], links[0]["end"], "new.html")])
    assert out == '<a href="new.html">x</a> tail'


def test_splice_escapes_replacement():
    html = '<a href="old">x</a>'
    links = htmlkit.scan_links(html)
    out = htmlkit.splice(html, [(links[0]["start"], links[0]["end"], "a&b")])
    assert out == '<a href="a&amp;b">x</a>'


def test_charset_meta_regex_double_quotes():
    # scraper.rs:467-477
    assert htmlkit.find_charset(b'<meta charset="UTF-8">', None) == "utf-8"
    assert htmlkit.find_charset(b'<meta charset="windows-1252">', None) == \
        "windows-1252"


def test_charset_meta_regex_single_quotes():
    assert htmlkit.find_charset(b"<meta charset='UTF-8'>", None) == "utf-8"
    assert htmlkit.find_charset(b"<meta charset='windows-1252'>", None) == \
        "windows-1252"


def test_charset_http_fallback():
    assert htmlkit.find_charset(b"<html></html>", "windows-1252") == "windows-1252"
    assert htmlkit.find_charset(b"<html></html>", None) is None
    # meta wins over the header charset
    assert htmlkit.find_charset(b'<meta charset="utf-8">', "windows-1252") == "utf-8"


def test_charset_meta_http_equiv_form():
    body = (b'<meta content="text/html; charset=windows-1252" '
            b'http-equiv="Content-Type">')
    assert htmlkit.find_charset(body, None) == "windows-1252"


def test_header_parsing():
    assert htmlkit.header_data_type("text/html; charset=utf-8") == "text/html"
    assert htmlkit.header_data_type("audio/mpeg") == "audio/mpeg"
    assert htmlkit.header_data_type(None) == "text/html"        # default
    assert htmlkit.header_data_type("garbage") == "text/html"   # unmatched
    assert htmlkit.header_charset("text/html; charset=Windows-1252") == \
        "windows-1252"
    assert htmlkit.header_charset("text/html") is None
    assert htmlkit.is_html_type("text/html")
    assert not htmlkit.is_html_type("text/plain")


def test_content_disposition_filename():
    assert htmlkit.content_disposition_filename(
        "attachment; filename=x.mp3") == "x.mp3"
    assert htmlkit.content_disposition_filename(None) is None


def test_charset_round_trip_windows_1252():
    body = "Gamle Valebø kirke. Arbeid pågår.".encode("cp1252")
    text = htmlkit.decode_html(body, "windows-1252")
    assert htmlkit.encode_html(text, "windows-1252") == body


def test_whatwg_label_latin1_is_cp1252():
    assert htmlkit.resolve_charset_label("latin1") == "cp1252"
    assert htmlkit.resolve_charset_label("ISO-8859-1") == "cp1252"
    assert htmlkit.resolve_charset_label("bogus-charset") is None


def test_extract_text():
    html = "<html><head><title>T</title><script>s()</script></head>" \
           "<body>Hello <b>world</b></body></html>"
    assert htmlkit.extract_text(html) == "THello world"
