"""HTML-clean + segmentation pipelines (M11/M12/D6) over the documents table.

The documents table stores plain text, so the pipeline first renders each doc
into a deterministic HTML page (``synth_page_html`` — a stand-in for the raw
HTML a crawler would have stored; in production the ``html`` column feeds
``clean_html`` directly), then runs the real cleaning operator. Because the
renderer is a pure function of (doc_id, lang, text), every downstream result
is DuckDB-expressible from the original text, which gives the cleaner an
exact SQL oracle:

* ``html_clean_docs``     — per-doc summary (used_block, is_clean,
  n_paragraphs), exercising BOTH container paths: docs with
  ``doc_id % 7 == 3`` render WITHOUT a block-system container (fallback to
  whole-document extraction, ref html_cleaner.py:57-59).
* ``doc_paragraph_rows``  — the M12 segment-row output: one row per cleaned
  paragraph via flat-map explosion, with D6 order-preserving dedup
  (ref html_cleaner.py:75) visible in the row set.

Scale notes: the cleaner is per-document by nature (same as the reference's
per-page BeautifulSoup pass) — stateless ``map_batches`` tasks, pruned
columns, no shuffle anywhere; output order is re-derived per doc so the
row-set is deterministic regardless of block layout.
"""

from __future__ import annotations

import html as _html
import os

import pandas as pd
import pyarrow as pa

from ..functions.html_clean import PARAGRAPH_BREAK, clean_html

_FALLBACK_MOD = 7  # doc_id % 7 == 3 → no block-system container
_FALLBACK_REM = 3
_PROMO_TEXT = "unrelated promo text"


def _sentences(text: str) -> list[str]:
    """'.'-split, space-trimmed, non-empty — one <p> per sentence. Must stay
    in lockstep with the SQL oracle (string_split + trim(s, ' '))."""
    return [s for s in (p.strip(" ") for p in text.split(".")) if s]


def synth_page_html(doc_id: int, lang: str, text: str) -> str:
    """Deterministic text→HTML renderer (the corpus' stand-in for stored raw
    HTML). Exercises: breadcrumbs extraction, script/header/footer/nav
    stripping, block-system preference vs whole-document fallback."""
    body = "".join(f"<p>{_html.escape(s)}.</p>" for s in _sentences(text))
    crumb = f'<div class="breadcrumbs">home &gt; {_html.escape(lang)}</div>'
    chrome = "<header>site chrome</header>"
    promo = f'<div class="promo">{_PROMO_TEXT}</div>'
    footer = "<footer>footer junk</footer>"
    head = f"<head><title>doc {doc_id}</title><script>var x = 1;</script></head>"
    if doc_id % _FALLBACK_MOD == _FALLBACK_REM:
        main = f'<div class="content">{body}</div>'
    else:
        main = f'<div class="block block-system"><nav>menu junk</nav>{body}</div>'
    return f"<html>{head}<body>{crumb}{chrome}{promo}{main}{footer}</body></html>"


def _docs(sf_dir: str):
    import ray.data as rd

    return rd.read_parquet(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    )


def _clean_summary_batch(b: pa.Table) -> pa.Table:
    ids, used, ok, n_par = [], [], [], []
    for i, lang, text in zip(
        b["doc_id"].to_numpy(), b["lang"].to_pylist(), b["text"].to_pylist()
    ):
        cleaned, used_block = clean_html(synth_page_html(int(i), lang, text))
        ids.append(int(i))
        used.append(int(used_block))
        ok.append(int(cleaned is not None))
        n_par.append(len(cleaned.split(PARAGRAPH_BREAK)) if cleaned is not None else 0)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "used_block": pa.array(used, pa.int64()),
            "is_clean": pa.array(ok, pa.int64()),
            "n_paragraphs": pa.array(n_par, pa.int64()),
        }
    )


def _paragraph_rows_batch(b: pa.Table) -> pa.Table:
    ids, idxs, segs = [], [], []
    for i, lang, text in zip(
        b["doc_id"].to_numpy(), b["lang"].to_pylist(), b["text"].to_pylist()
    ):
        if int(i) % _FALLBACK_MOD == _FALLBACK_REM:
            continue  # block-system docs only (see q_doc_paragraph_rows)
        cleaned, _ = clean_html(synth_page_html(int(i), lang, text))
        if cleaned is None:
            continue
        for j, seg in enumerate(cleaned.split(PARAGRAPH_BREAK)):
            ids.append(int(i))
            idxs.append(j)
            segs.append(seg)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "seg_idx": pa.array(idxs, pa.int64()),
            "segment": pa.array(segs, pa.string()),
        }
    )


def q_html_clean_docs(sf_dir: str) -> pd.DataFrame:
    out = (
        _docs(sf_dir)
        .map_batches(_clean_summary_batch, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values("doc_id").reset_index(drop=True)


def q_doc_paragraph_rows(sf_dir: str) -> pd.DataFrame:
    """M12 as real segment rows: block-system docs only (doc_id%7 != 3) keep
    the oracle exact without modeling the fallback layout's extra paragraphs
    in SQL — the fallback path is covered by q_html_clean_docs + unit tests."""
    out = (
        _docs(sf_dir)
        .map_batches(_paragraph_rows_batch, batch_format="pyarrow")
        .to_pandas()
    )
    return out.sort_values(["doc_id", "seg_idx"]).reset_index(drop=True)


def q_shared_paragraphs(sf_dir: str) -> pd.DataFrame:
    """Cross-DOCUMENT paragraph dedup (the CCNet-style boilerplate detector,
    complementing D6's within-doc dedup): top-20 cleaned segments by the
    number of distinct documents containing them (≥ 2) — ALL cleaned
    segments, chrome included: on this corpus the detector correctly
    surfaces the per-lang breadcrumb trails as the only cross-document
    boilerplate (document bodies are unique below the near-dup threshold).
    Within one doc a segment appears once (D6), so a per-batch count partial
    per segment already counts distinct docs — the shuffle moves one
    (segment, n) partial per batch and the top-20 merge is driver-side on
    the result. At 100 TB this is the exact shape of a boilerplate-paragraph
    sweep: no joins, one groupby over segment-hash space."""
    from ray.data.aggregate import Sum

    def seg_counts(b: pa.Table) -> pa.Table:
        rows = _paragraph_rows_batch(b)
        return rows.group_by(["segment"]).aggregate([("doc_id", "count")])

    out = (
        _docs(sf_dir)
        .map_batches(seg_counts, batch_format="pyarrow")
        .groupby("segment")
        .aggregate(Sum("doc_id_count", alias_name="n_docs"))
        .to_pandas()
    )
    out = out[out["n_docs"] >= 2]
    out = out.sort_values(["n_docs", "segment"], ascending=[False, True]).head(20)
    return out.reset_index(drop=True)[["segment", "n_docs"]]


_BLACKLIST_SQL = (
    "(lower(text) LIKE '%page does not exist%'"
    " OR lower(text) LIKE '%zavrnjen dostop%'"
    " OR lower(text) LIKE '%page does not exsist!%'"
    " OR lower(text) LIKE '%pdf%')"
)

# per-doc sentence stats: n_total occurrences / n_distinct values of
# '.'-split, space-trimmed, non-empty sentences
_SENT_STATS_SQL = (
    "SELECT d.doc_id, d.lang,"
    f" {_BLACKLIST_SQL} AS is_err,"
    " (SELECT COUNT(*) FROM unnest(string_split(d.text, '.')) AS u(s)"
    "  WHERE trim(s, ' ') != '') AS n_total,"
    " (SELECT COUNT(DISTINCT trim(s, ' ')) FROM unnest(string_split(d.text, '.')) AS u(s)"
    "  WHERE trim(s, ' ') != '') AS n_distinct"
    " FROM documents d"
)

ORACLE_SQL = {
    # paragraph count per layout (see synth_page_html):
    #   block docs:    breadcrumb + distinct sentences
    #   fallback docs: breadcrumb + promo + combined-div paragraph + distinct
    #                  sentences, where the combined paragraph collapses into
    #                  the single sentence when n_total == 1 (D6 dedup) and
    #                  is absent when the doc has no sentences
    "html_clean_docs": (
        f"WITH s AS ({_SENT_STATS_SQL})"
        " SELECT doc_id,"
        " CASE WHEN doc_id % 7 = 3 THEN 0 ELSE 1 END::BIGINT AS used_block,"
        " CASE WHEN is_err THEN 0 ELSE 1 END::BIGINT AS is_clean,"
        " CASE WHEN is_err THEN 0"
        "      WHEN doc_id % 7 = 3 THEN"
        "        CASE WHEN n_total = 0 THEN 2"
        "             WHEN n_total = 1 THEN 3"
        "             ELSE 3 + n_distinct END"
        "      ELSE 1 + n_distinct END::BIGINT AS n_paragraphs"
        " FROM s ORDER BY doc_id"
    ),
    # segment rows for block-system docs: seg_idx 0 is the breadcrumb,
    # then sentences by first occurrence (order-preserving dedup, D6)
    "doc_paragraph_rows": (
        "WITH exploded AS ("
        "  SELECT doc_id, unnest(string_split(text, '.')) AS part,"
        "         unnest(range(1, len(string_split(text, '.')) + 1)) AS pos"
        "  FROM documents WHERE doc_id % 7 != 3"
        f"   AND NOT {_BLACKLIST_SQL}"
        "), sent AS ("
        "  SELECT doc_id, trim(part, ' ') || '.' AS segment, pos"
        "  FROM exploded WHERE trim(part, ' ') != ''"
        "), firsts AS ("
        "  SELECT doc_id, segment, MIN(pos) AS fpos FROM sent GROUP BY doc_id, segment"
        "), ranked AS ("
        "  SELECT doc_id, segment,"
        "  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY fpos) AS seg_idx"
        "  FROM firsts)"
        " SELECT doc_id, seg_idx::BIGINT AS seg_idx, segment FROM ranked"
        " UNION ALL"
        " SELECT doc_id, 0::BIGINT AS seg_idx, 'home > ' || lang AS segment"
        " FROM documents WHERE doc_id % 7 != 3"
        f"  AND NOT {_BLACKLIST_SQL}"
        " ORDER BY doc_id, seg_idx"
    ),
    # cross-document duplicated paragraphs (boilerplate sweep): distinct
    # (doc, segment) from the same sentence CTE plus the breadcrumb rows
    "shared_paragraphs": (
        "WITH exploded AS ("
        "  SELECT doc_id, unnest(string_split(text, '.')) AS part"
        "  FROM documents WHERE doc_id % 7 != 3"
        f"   AND NOT {_BLACKLIST_SQL}"
        "), sent AS ("
        "  SELECT DISTINCT doc_id, trim(part, ' ') || '.' AS segment"
        "  FROM exploded WHERE trim(part, ' ') != ''"
        "  UNION"
        "  SELECT doc_id, 'home > ' || lang AS segment"
        "  FROM documents WHERE doc_id % 7 != 3"
        f"   AND NOT {_BLACKLIST_SQL})"
        " SELECT segment, COUNT(*)::BIGINT AS n_docs FROM sent GROUP BY segment"
        " HAVING COUNT(*) >= 2 ORDER BY n_docs DESC, segment LIMIT 20"
    ),
}

QUERIES = {
    "html_clean_docs": q_html_clean_docs,
    "doc_paragraph_rows": q_doc_paragraph_rows,
    "shared_paragraphs": q_shared_paragraphs,
}
