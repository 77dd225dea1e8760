"""Binary mimetype classification (M4/M6) unit tests.

``test_reference_content_type_table`` mirrors the reference's own table test
(test/test_db.py:189-201); the rest pin the map edges, the URL-extension
fallback quirk, and link extraction."""

from __future__ import annotations

from ieps_crawler_ray.functions.binary import (
    binary_code,
    classify_page,
    extract_binary_links,
    url_ext_code,
)


def test_reference_content_type_table():
    # test/test_db.py:191-201 — the exact probe list and expected codes
    expected = {
        "text/html": None,
        "application/pdf": "PDF",
        "application/msword": "DOC",
        "image/jpeg": None,  # images are NOT in the binary map (only tiff is)
        "application/octet-stream": "BIN",
    }
    for ct, code in expected.items():
        assert binary_code(ct) == code, ct


def test_parameter_stripping_and_case():
    assert binary_code("Application/PDF; charset=binary") == "PDF"
    assert binary_code("application/zip;boundary=x") == "ZIP"
    assert binary_code("IMAGE/TIFF") == "TIFF"


def test_full_map_coverage():
    # all 15 entries of crawler.py:543-569
    cases = {
        "application/x-pdf": "PDF",
        "application/vnd.openxmlformats-officedocument.wordprocessingml.document": "DOCX",
        "application/vnd.ms-powerpoint": "PPT",
        "application/vnd.openxmlformats-officedocument.presentationml.presentation": "PPTX",
        "application/vnd.ms-excel": "XLS",
        "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet": "XLSX",
        "application/x-rar": "RAR",
        "application/x-rar-compressed": "RAR",
        "application/x-7z-compressed": "7Z",
        "application/x-tar": "TAR",
    }
    for ct, code in cases.items():
        assert binary_code(ct) == code


def test_url_extension_fallback_collapses_variants():
    # crawler.py:619-629: docx→DOC, pptx→PPT, xlsx→XLS in the fallback
    assert url_ext_code("https://x.org/a/report.DOCX") == "DOC"
    assert url_ext_code("https://x.org/deck.pptx") == "PPT"
    assert url_ext_code("https://x.org/sheet.xlsx") == "XLS"
    assert url_ext_code("https://x.org/page.html") is None
    assert url_ext_code("no-dot-url") is None


def test_text_html_at_pdf_url_is_binary():
    # the reference applies the extension fallback even when the server says
    # text/html (crawler.py:617-629)
    assert classify_page("text/html", "https://x.org/file.pdf") == ("BINARY", "PDF")
    assert classify_page("text/html; charset=utf-8", "https://x.org/p.html") == ("HTML", "")
    assert classify_page("text/plain", "https://x.org/p.txt") == ("UNKNOWN", "")
    assert classify_page("", "https://x.org/a.doc") == ("BINARY", "DOC")


def test_extract_binary_links_orders_and_filters():
    html = (
        "<html><body>"
        '<a href="https://f.org/1.pdf">one</a>'
        '<a href="https://f.org/skip.html">no</a>'
        '<embed src="https://f.org/2.docx"></embed>'
        '<object src="https://f.org/3.ppt"></object>'
        '<iframe src="https://f.org/4.pptx"></iframe>'
        "<a>no href</a>"
        '<a href="https://f.org/5.zip">not in pa1 5-entry map</a>'
        "</body></html>"
    )
    assert extract_binary_links(html) == [
        ("https://f.org/1.pdf", "PDF"),
        ("https://f.org/2.docx", "DOCX"),
        ("https://f.org/3.ppt", "PPT"),
        ("https://f.org/4.pptx", "PPTX"),
    ]


def test_extract_prefers_src_over_href():
    html = '<a src="https://f.org/a.pdf" href="https://f.org/b.docx">x</a>'
    assert extract_binary_links(html) == [("https://f.org/a.pdf", "PDF")]


def test_extract_empty_html():
    assert extract_binary_links("") == []
    assert extract_binary_links("<html><body><p>no links</p></body></html>") == []
