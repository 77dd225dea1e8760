"""Binary-content classification (M4/M6) — the reference's mimetype family.

* ``BINARY_TYPES`` — the 15-entry content-type → data_type_code map of
  ``oldstufffrompa1/crawler.py:543-569`` (``is_binary_content``), including
  the ``;parameter`` stripping + lowercasing.
* ``url_ext_code`` — the URL-extension fallback of ``crawler.py:619-629``
  (applies whenever the content-type lookup missed, even for text/html
  URLs; note the reference collapses docx→DOC, pptx→PPT, xlsx→XLS here).
* ``classify_page`` — page_type_code assignment: BINARY when a code is
  found, else HTML for ``text/html*``, else UNKNOWN (the page/page_type
  model of ``init-scripts/crawldb.sql:85-90`` + ``Estrella.py:241-262``).
* ``extract_binary_links`` — M4: walk ``a/embed/object/iframe`` tags,
  resolve src/href extension → mimetype → the 5-entry data_type map
  (``Estrella.py:259-328``; stdlib ``mimetypes.guess_type`` is replaced by
  an explicit extension map so results don't depend on host mime tables).
"""

from __future__ import annotations

from .html_clean import find_all, parse_html

# crawler.py:543-569
BINARY_TYPES = {
    "application/pdf": "PDF",
    "application/msword": "DOC",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document": "DOCX",
    "application/vnd.ms-powerpoint": "PPT",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation": "PPTX",
    "application/vnd.ms-excel": "XLS",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet": "XLSX",
    "application/zip": "ZIP",
    "application/x-rar": "RAR",
    "application/x-rar-compressed": "RAR",
    "application/octet-stream": "BIN",
    "application/x-7z-compressed": "7Z",
    "application/x-tar": "TAR",
    "application/x-pdf": "PDF",
    "image/tiff": "TIFF",
}

# crawler.py:619-629 — extension fallback collapses the x-variants
_EXT_FALLBACK = {
    "pdf": "PDF",
    "doc": "DOC",
    "docx": "DOC",
    "ppt": "PPT",
    "pptx": "PPT",
    "xls": "XLS",
    "xlsx": "XLS",
}

# Estrella.py:305-309 uses mimetypes.guess_type; pinned here for determinism
_LINK_EXT_MIME = {
    "pdf": "application/pdf",
    "doc": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "ppt": "application/vnd.ms-powerpoint",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
}

# Estrella.py:311-328 — the pa1 map is 5 entries only
LINK_DATA_TYPES = {
    "application/pdf": "PDF",
    "application/msword": "DOC",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document": "DOCX",
    "application/vnd.ms-powerpoint": "PPT",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation": "PPTX",
}

_LINK_TAGS = frozenset(["a", "embed", "object", "iframe"])


def clean_content_type(content_type: str) -> str:
    """Strip parameters and lowercase (crawler.py:563-567)."""
    if ";" in content_type:
        return content_type.split(";")[0].strip().lower()
    return content_type.lower()


def binary_code(content_type: str) -> str | None:
    return BINARY_TYPES.get(clean_content_type(content_type))


def url_ext_code(url: str) -> str | None:
    """crawler.py:619-629: last-'.'-suffix of the WHOLE url, lowercased."""
    if "." not in url:
        return None
    return _EXT_FALLBACK.get(url.split(".")[-1].lower())


def classify_page(content_type: str, url: str) -> tuple[str, str]:
    """→ (page_type_code, data_type_code or ''). The extension fallback runs
    whenever the content-type map misses — including for text/html pages at
    .pdf-style URLs, matching crawler.py:617-629 exactly."""
    code = binary_code(content_type)
    if code is None:
        code = url_ext_code(url)
    if code is not None:
        return "BINARY", code
    if clean_content_type(content_type).startswith("text/html"):
        return "HTML", ""
    return "UNKNOWN", ""


def link_code(src: str) -> str | None:
    if "." not in src:
        return None
    mime = _LINK_EXT_MIME.get(src.split(".")[-1].lower())
    return LINK_DATA_TYPES.get(mime) if mime else None


def extract_binary_links(html: str) -> list[tuple[str, str]]:
    """M4: (src_url, data_type_code) for every a/embed/object/iframe whose
    src-or-href extension maps to a binary data type, in document order
    (Estrella.py:259-302; src wins over href as in the reference)."""
    if not html:
        return []
    out = []
    for node in find_all(parse_html(html), _LINK_TAGS):
        src = node.attrs.get("src") or node.attrs.get("href")
        if not src:
            continue
        code = link_code(src)
        if code is not None:
            out.append((src, code))
    return out
