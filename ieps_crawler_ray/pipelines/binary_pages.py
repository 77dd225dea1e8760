"""Binary page-type pipelines (M4/M6) over the documents table.

Every doc becomes one synthetic "fetched page" with a deterministic
content-type (cycling through the full 15-entry binary map plus html /
parameterized / empty / unknown variants) and URL extension, so the
classification operator (functions/binary.py, from crawler.py:543-629) is
exercised on every branch and stays DuckDB-expressible:

* ``pages_by_type``    — page_type_code × data_type_code histogram (the
  page/page_type model of init-scripts/crawldb.sql:85-90) with a BINARY
  bucket, incl. the text/html-at-.pdf-URL fallback quirk.
* ``page_data_rows``   — the page_data-table analogue: one row per BINARY
  page (crawldb.sql:37-43).
* ``binary_links_docs`` — M4: a/embed/object/iframe link extraction from
  rendered HTML → (doc_id, link_idx, url, data_type_code) rows
  (Estrella.py:259-328, 5-entry map).

Scale: stateless map_batches over pruned columns; the histogram does a
per-batch partial group-count before the tiny final groupby.
"""

from __future__ import annotations

import os

import pandas as pd
import pyarrow as pa

from ..functions.binary import classify_page, extract_binary_links
from .clean import _sentences

# indexed by doc_id % 20 — covers all 15 map entries + edge variants
CONTENT_TYPES = [
    "text/html",
    "text/html; charset=utf-8",
    "application/pdf",
    "application/x-pdf",
    "application/msword",
    "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "application/vnd.ms-powerpoint",
    "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "application/vnd.ms-excel",
    "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "application/zip",
    "application/x-rar",
    "application/x-rar-compressed",
    "application/octet-stream",
    "application/x-7z-compressed",
    "application/x-tar",
    "image/tiff",
    "Application/PDF; charset=binary",
    "",
    "text/plain",
]

URL_EXTS = ["html", "pdf", "docx", "ppt", "xlsx", "txt", "doc", "xls"]  # doc_id % 8

LINK_EXTS = ["pdf", "docx", "html", "ppt", "doc", "pptx"]  # (doc_id + j) % 6
_LINK_TAGS = ["a", "embed", "object", "iframe"]  # j % 4


def page_url(doc_id: int) -> str:
    return f"https://example.org/d{doc_id}/file.{URL_EXTS[doc_id % len(URL_EXTS)]}"


def page_content_type(doc_id: int) -> str:
    return CONTENT_TYPES[doc_id % len(CONTENT_TYPES)]


def synth_link_html(doc_id: int, text: str) -> str:
    """One binary-ish link per sentence, cycling tag kinds; <a> uses href,
    the embedded kinds use src (Estrella.py:277-283 reads src or href)."""
    parts = []
    for j, _ in enumerate(_sentences(text)):
        src = f"https://files.example.org/{doc_id}/{j}.{LINK_EXTS[(doc_id + j) % len(LINK_EXTS)]}"
        tag = _LINK_TAGS[j % len(_LINK_TAGS)]
        if tag == "a":
            parts.append(f'<a href="{src}">file {j}</a>')
        else:
            parts.append(f'<{tag} src="{src}"></{tag}>')
    return "<html><body>" + "".join(parts) + "</body></html>"


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _classified(b: pa.Table) -> pa.Table:
    ids, ptypes, dtypes, urls = [], [], [], []
    for i in b["doc_id"].to_numpy():
        i = int(i)
        url = page_url(i)
        ptype, dtype = classify_page(page_content_type(i), url)
        ids.append(i)
        ptypes.append(ptype)
        dtypes.append(dtype)
        urls.append(url)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "page_type": pa.array(ptypes, pa.string()),
            "data_type": pa.array(dtypes, pa.string()),
            "url": pa.array(urls, pa.string()),
        }
    )


def q_pages_by_type(sf_dir: str) -> pd.DataFrame:
    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        return _classified(b).group_by(["page_type", "data_type"]).aggregate([([], "count_all")])

    out = (
        _docs(sf_dir, ["doc_id"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["page_type", "data_type"])
        .aggregate(Sum("count_all", alias_name="n"))
        .to_pandas()
        .sort_values(["page_type", "data_type"])
        .reset_index(drop=True)
    )
    return out[["page_type", "data_type", "n"]]


def q_page_data_rows(sf_dir: str) -> pd.DataFrame:
    def binaries(b: pa.Table) -> pa.Table:
        t = _classified(b)
        import pyarrow.compute as pc

        return t.filter(pc.equal(t["page_type"], "BINARY")).select(
            ["doc_id", "url", "data_type"]
        )

    out = (
        _docs(sf_dir, ["doc_id"])
        .map_batches(binaries, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def q_binary_links_docs(sf_dir: str) -> pd.DataFrame:
    def links(b: pa.Table) -> pa.Table:
        ids, idxs, urls, codes = [], [], [], []
        for i, text in zip(b["doc_id"].to_numpy(), b["text"].to_pylist()):
            i = int(i)
            found = extract_binary_links(synth_link_html(i, text))
            # recover the sentence index from the URL path (the uncoded
            # 'html' links were dropped by the extractor, so enumerate()
            # over the result would misnumber)
            for src, code in found:
                j = int(src.rsplit("/", 1)[1].split(".")[0])
                ids.append(i)
                idxs.append(j)
                urls.append(src)
                codes.append(code)
        return pa.table(
            {
                "doc_id": pa.array(ids, pa.int64()),
                "link_idx": pa.array(idxs, pa.int64()),
                "url": pa.array(urls, pa.string()),
                "data_type": pa.array(codes, pa.string()),
            }
        )

    out = (
        _docs(sf_dir, ["doc_id", "text"])
        .map_batches(links, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["doc_id", "link_idx"]).reset_index(drop=True)


# -- oracles ------------------------------------------------------------------

# classification mirrored in SQL over doc_id arithmetic (see CONTENT_TYPES /
# URL_EXTS): ct_code from doc_id%20, extension fallback from doc_id%8
_CODE_SQL = (
    "COALESCE("
    " CASE WHEN doc_id % 20 IN (2, 3, 17) THEN 'PDF'"
    "      WHEN doc_id % 20 = 4 THEN 'DOC'"
    "      WHEN doc_id % 20 = 5 THEN 'DOCX'"
    "      WHEN doc_id % 20 = 6 THEN 'PPT'"
    "      WHEN doc_id % 20 = 7 THEN 'PPTX'"
    "      WHEN doc_id % 20 = 8 THEN 'XLS'"
    "      WHEN doc_id % 20 = 9 THEN 'XLSX'"
    "      WHEN doc_id % 20 = 10 THEN 'ZIP'"
    "      WHEN doc_id % 20 IN (11, 12) THEN 'RAR'"
    "      WHEN doc_id % 20 = 13 THEN 'BIN'"
    "      WHEN doc_id % 20 = 14 THEN '7Z'"
    "      WHEN doc_id % 20 = 15 THEN 'TAR'"
    "      WHEN doc_id % 20 = 16 THEN 'TIFF'"
    "      ELSE NULL END,"
    " CASE WHEN doc_id % 8 = 1 THEN 'PDF'"
    "      WHEN doc_id % 8 IN (2, 6) THEN 'DOC'"
    "      WHEN doc_id % 8 = 3 THEN 'PPT'"
    "      WHEN doc_id % 8 IN (4, 7) THEN 'XLS'"
    "      ELSE NULL END)"
)

_PAGE_SQL = (
    "SELECT doc_id,"
    f" {_CODE_SQL} AS code,"
    " 'https://example.org/d' || doc_id || '/file.' ||"
    " ['html','pdf','docx','ppt','xlsx','txt','doc','xls'][(doc_id % 8) + 1] AS url"
    " FROM documents"
)

ORACLE_SQL = {
    "pages_by_type": (
        f"WITH p AS ({_PAGE_SQL})"
        " SELECT CASE WHEN code IS NOT NULL THEN 'BINARY'"
        "        WHEN doc_id % 20 IN (0, 1) THEN 'HTML' ELSE 'UNKNOWN' END AS page_type,"
        " COALESCE(code, '') AS data_type, COUNT(*) AS n"
        " FROM p GROUP BY 1, 2 ORDER BY 1, 2"
    ),
    "page_data_rows": (
        f"WITH p AS ({_PAGE_SQL})"
        " SELECT doc_id, url, code AS data_type FROM p"
        " WHERE code IS NOT NULL ORDER BY doc_id"
    ),
    "binary_links_docs": (
        "WITH exploded AS ("
        "  SELECT doc_id, unnest(string_split(text, '.')) AS part,"
        "         unnest(range(1, len(string_split(text, '.')) + 1)) AS pos"
        "  FROM documents"
        "), sent AS ("
        "  SELECT doc_id,"
        "  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) - 1 AS j"
        "  FROM exploded WHERE trim(part, ' ') != ''"
        "), coded AS ("
        "  SELECT doc_id, j,"
        "  ['pdf','docx','html','ppt','doc','pptx'][((doc_id + j) % 6) + 1] AS ext,"
        "  CASE (doc_id + j) % 6 WHEN 0 THEN 'PDF' WHEN 1 THEN 'DOCX'"
        "       WHEN 3 THEN 'PPT' WHEN 4 THEN 'DOC' WHEN 5 THEN 'PPTX'"
        "       ELSE NULL END AS data_type"
        "  FROM sent)"
        " SELECT doc_id, j AS link_idx,"
        " 'https://files.example.org/' || doc_id || '/' || j || '.' || ext AS url,"
        " data_type"
        " FROM coded WHERE data_type IS NOT NULL ORDER BY doc_id, link_idx"
    ),
}

QUERIES = {
    "pages_by_type": q_pages_by_type,
    "page_data_rows": q_page_data_rows,
    "binary_links_docs": q_binary_links_docs,
}
