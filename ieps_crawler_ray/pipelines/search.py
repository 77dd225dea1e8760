"""User-facing search API — the pa2 surface re-expressed on Ray Data.

Mirrors `pa2/implementation-extraction/Vector_db_querier.py` (SURVEY §2.10):
  * ``semantic_search(query, limit, threshold)``    (Vector_db_querier.py:50-92)
  * ``keyword_and_semantic_search(query, limit)``   (:100-124, 0.4·keyword + 0.6·cosine)
  * ``url_content_search(pattern, query, limit)``   (:130-187, LIKE + rank)
  * ``get_page_content(doc_id)``                    (:189-217)

The reference embeds queries with LaBSE and ranks in pgvector SQL; here the
encoder is the deterministic hashed-BoW stand-in (functions/text.embed_texts —
swap in a real model behind the same signature) and ranking is a streaming
``map_batches`` partial top-k over the documents table, merged on the driver.

CLI (mirrors the reference's argparse surface, Vector_db_querier.py:259-338)::

    python -m ieps_crawler_ray.pipelines.search semantic  "vector index"  --limit 5
    python -m ieps_crawler_ray.pipelines.search hybrid    "vector index"
    python -m ieps_crawler_ray.pipelines.search url       --pattern www2 --query "scan"
    python -m ieps_crawler_ray.pipelines.search page      --doc-id 42
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..functions.text import embed_texts

EMBED_DIM = 64


def _docs(sf_dir: str, columns):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _scored_ds(
    sf_dir: str,
    query: str,
    pattern: str | None = None,
    rank: str = "sim",
    limit: int = 10,
):
    """documents → (doc_id, sim, kw_hit) scores, streaming partial top-k.

    ``rank`` selects the per-batch pruning key and MUST be the same key the
    caller sorts by afterwards — partial top-k is only correct when the
    pruning key is the final ranking key (a batch may otherwise evict the
    globally best row under the caller's key before the driver merge):
      * ``"sim"``    — cosine similarity alone (semantic / url modes)
      * ``"hybrid"`` — 0.6·sim + 0.4·clip(kw_hits/n_kw, 1) (hybrid mode,
        the reference's weighting, Vector_db_querier.py:113)
    """
    import ray

    q = embed_texts([query], dim=EMBED_DIM)[0]
    kw_tokens = tuple(query.lower().split())
    n_kw = max(len(kw_tokens), 1)
    per_batch_k = max(32, int(limit))
    ref = ray.put((q, kw_tokens, pattern, rank, n_kw, per_batch_k))

    class Score:
        def __init__(self):
            (self.q, self.kw, self.pattern, self.rank, self.n_kw, self.k) = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            if self.pattern is not None:
                b = b.filter(pc.match_substring(b["source"], self.pattern))
                if b.num_rows == 0:
                    return pa.table(
                        {
                            "doc_id": pa.array([], pa.int64()),
                            "sim": pa.array([], pa.float64()),
                            "kw_hits": pa.array([], pa.int64()),
                        }
                    )
            texts = b["text"].to_pylist()
            vecs = embed_texts(texts, dim=EMBED_DIM)
            sims = (vecs @ self.q).astype(np.float64)
            hits = np.fromiter(
                (sum(k in t.lower() for k in self.kw) for t in texts),
                dtype=np.int64,
                count=len(texts),
            )
            if self.rank == "hybrid":
                key = 0.6 * sims + 0.4 * np.clip(hits / self.n_kw, None, 1.0)
            else:
                key = sims
            # per-batch partial top-k, ties broken by doc_id asc to match the
            # caller's final sort exactly (argpartition would keep arbitrary
            # tied rows and could evict the lowest-doc_id tie)
            k = min(self.k, len(texts))
            ids = b["doc_id"].to_numpy()
            top = np.lexsort((ids, -key))[:k]
            return pa.table(
                {
                    "doc_id": pc.take(b["doc_id"], pa.array(top)),
                    "sim": pa.array(sims[top], pa.float64()),
                    "kw_hits": pa.array(hits[top], pa.int64()),
                }
            )

    cols = ["doc_id", "text"] + (["source"] if pattern is not None else [])
    return _docs(sf_dir, cols).map_batches(
        Score, batch_format="pyarrow", batch_size=1024, concurrency=(1, 8)
    )


def semantic_search(
    query: str, limit: int = 10, threshold: float = 0.0, sf_dir: str = "/root/testdata/sf0.001"
) -> pd.DataFrame:
    df = _scored_ds(sf_dir, query, rank="sim", limit=limit).to_pandas()
    df = df[df["sim"] >= threshold]
    out = df.sort_values(["sim", "doc_id"], ascending=[False, True]).head(limit)
    return out[["doc_id", "sim"]].reset_index(drop=True)


def keyword_and_semantic_search(
    query: str, limit: int = 10, sf_dir: str = "/root/testdata/sf0.001"
) -> pd.DataFrame:
    """0.6·cosine + 0.4·normalized-keyword-hits (the reference's hybrid
    weighting, Vector_db_querier.py:113)."""
    df = _scored_ds(sf_dir, query, rank="hybrid", limit=limit).to_pandas()
    n_kw = max(len(query.split()), 1)
    df["score"] = 0.6 * df["sim"] + 0.4 * (df["kw_hits"] / n_kw).clip(upper=1.0)
    out = df.sort_values(["score", "doc_id"], ascending=[False, True]).head(limit)
    return out[["doc_id", "score", "sim"]].reset_index(drop=True)


def url_content_search(
    pattern: str, query: str, limit: int = 10, sf_dir: str = "/root/testdata/sf0.001"
) -> pd.DataFrame:
    """substring-filtered (J6 LIKE analogue on `source`) + semantic rank."""
    df = _scored_ds(sf_dir, query, pattern=pattern, rank="sim", limit=limit).to_pandas()
    out = df.sort_values(["sim", "doc_id"], ascending=[False, True]).head(limit)
    return out[["doc_id", "sim"]].reset_index(drop=True)


def get_page_content(doc_id: int, sf_dir: str = "/root/testdata/sf0.001") -> str:
    import pyarrow.parquet as pq

    t = pq.read_table(
        os.path.join(sf_dir, "documents.parquet"),
        columns=["doc_id", "text"],
        filters=[("doc_id", "=", doc_id)],
    )
    return t["text"][0].as_py() if t.num_rows else ""


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="search the documents corpus")
    ap.add_argument("mode", choices=["semantic", "hybrid", "url", "page"])
    ap.add_argument("query", nargs="?", default="")
    ap.add_argument("--pattern", default="")
    ap.add_argument("--doc-id", type=int, default=0)
    ap.add_argument("--limit", type=int, default=10)
    ap.add_argument("--threshold", type=float, default=0.0)
    ap.add_argument("--sf-dir", default=os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.001"))
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():  # standalone CLI owns its session
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    try:
        if args.mode == "semantic":
            print(semantic_search(args.query, args.limit, args.threshold, args.sf_dir))
        elif args.mode == "hybrid":
            print(keyword_and_semantic_search(args.query, args.limit, args.sf_dir))
        elif args.mode == "url":
            print(url_content_search(args.pattern, args.query, args.limit, args.sf_dir))
        else:
            print(get_page_content(args.doc_id, args.sf_dir))
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
