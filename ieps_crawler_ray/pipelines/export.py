"""Exemplar-export sink — S9 (reference: test/export_data.py:13-367).

Extracts one example of each content family from a crawl checkpoint into
plain files a human can open, mirroring the reference's extractor: an HTML
page + metadata JSON, a duplicate-pair info JSON, a decoded image file +
metadata, the page's site robots.txt and sitemap XML, and the page's
outgoing-links JSON. The reference pulls these from Postgres; here the
source of truth is the Lance-layout checkpoint written by the crawl.

BINARY-page exemplars (export_data.py:97-149): when the crawl classified
any page BINARY (CorpusSpec.binary_permille > 0), the sink writes that
page's info — rank, url, data-type code and mimetype — as
``binary_<rank>_info.json`` (the synthetic corpus carries no payload bytes
for binary URLs, so the exemplar is the metadata the reference's page_data
row would carry). The 15-entry data-type registry (crawldb.sql INSERT INTO
data_type) is always written as ``data_types.json`` alongside.

CLI::

    python -m ieps_crawler_ray.pipelines.export --root /tmp/ckpt --out /tmp/samples
"""

from __future__ import annotations

import json
import os

import numpy as np

from ..functions.binary import BINARY_TYPES
from ..functions.hashing import md5_hex
from ..sources import corpus as C
from ..sources import lance_table as lt


def _uh8(url: str) -> str:
    return md5_hex([url])[0][:8]


def export_content_samples(
    root: str, spec: C.CorpusSpec, corpus_path: str, out_dir: str
) -> dict:
    """→ {family: written path} for one exemplar per content family."""
    from .crawl import _gd, _gens_of

    os.makedirs(out_dir, exist_ok=True)
    written: dict[str, str] = {}

    import pyarrow as pa

    pages = pa.concat_tables(
        [lt.read_pyarrow(_gd(root, "pages", g)) for g in _gens_of(root, "pages")]
    ).to_pandas().sort_values("rank")

    # 1. HTML page + metadata (export_data.py:35-95)
    html = pages[pages["status"] == "html"]
    if len(html):
        row = html.iloc[0]
        tag = f"page_{int(row['rank'])}_{_uh8(row['url'])}"
        body = C.page_html_of_index(spec, int(row["idx"]))
        p = os.path.join(out_dir, f"{tag}.html")
        with open(p, "w") as f:
            f.write(body)
        with open(os.path.join(out_dir, f"{tag}_meta.json"), "w") as f:
            json.dump(
                {
                    "rank": int(row["rank"]),
                    "url": row["url"],
                    "gen": int(row["gen"]),
                    "status": row["status"],
                    "caption": row["caption"],
                    "content_length": len(body),
                },
                f,
                indent=2,
            )
        written["html"] = p

    # 2. duplicate pair (export_data.py:224-264)
    dup = pages[pages["status"] == "duplicate"]
    if len(dup):
        row = dup.iloc[0]
        winner = pages[pages["rank"] == int(row["dup_of"])]
        p = os.path.join(out_dir, f"duplicate_{int(row['rank'])}_info.json")
        with open(p, "w") as f:
            json.dump(
                {
                    "duplicate_rank": int(row["rank"]),
                    "duplicate_url": row["url"],
                    "original_rank": int(row["dup_of"]),
                    "original_url": winner.iloc[0]["url"] if len(winner) else None,
                },
                f,
                indent=2,
            )
        written["duplicate"] = p

    # 3. decoded image of the html page (export_data.py:151-222)
    if len(html):
        row = html.iloc[0]
        targets = C.page_image_targets(spec, int(row["idx"]))
        img_idx = int(targets[0])
        t = lt.read_pyarrow(
            corpus_path,
            columns=["image_id", "bytes", "fmt"],
            partitions=[int(C.bucket_of_host(spec, C.host_of_index(spec, np.array([img_idx])))[0])],
        )
        ids = [int(s[3:]) for s in t["image_id"].to_pylist()]
        pos = ids.index(img_idx)
        fmt = t["fmt"][pos].as_py()
        p = os.path.join(out_dir, f"image_{img_idx}.{fmt}")
        with open(p, "wb") as f:
            f.write(t["bytes"][pos].as_py())
        written["image"] = p

    # 4. site: robots.txt + sitemap XML (export_data.py:266-308)
    if len(pages):
        host = int(pages.iloc[0]["host_id"])
        p = os.path.join(out_dir, f"site_{host}_robots.txt")
        with open(p, "w") as f:
            f.write(C.robots_txt_for_host(spec, host))
        written["robots"] = p
        sm = C.sitemap_resource(spec, host, f"http://host{host}.example/sitemap-main.xml")
        if sm is None:
            from ..functions.sitemap import COMMON_SITEMAP_PATHS

            sm = C.sitemap_resource(
                spec, host, f"http://host{host}.example/" + COMMON_SITEMAP_PATHS[host % 9]
            )
        if sm is not None:
            p = os.path.join(out_dir, f"site_{host}_sitemap.xml")
            with open(p, "w") as f:
                f.write(sm)
            written["sitemap"] = p

    # 5. outgoing links of one page (export_data.py:310-357)
    link_gens = _gens_of(root, "links")
    if link_gens:
        lk = lt.read_pyarrow(_gd(root, "links", link_gens[0])).to_pandas()
        if len(lk):
            fr = int(lk.iloc[0]["from_rank"])
            sub = lk[lk["from_rank"] == fr]
            p = os.path.join(out_dir, f"links_page_{fr}_info.json")
            with open(p, "w") as f:
                json.dump(
                    {"from_rank": fr, "n_links": len(sub), "to_urls": list(sub["url"])},
                    f,
                    indent=2,
                )
            written["links"] = p

    # 6. BINARY page exemplar (export_data.py:97-149) — metadata of the first
    # BINARY-classified page; the registry below always completes the family
    binary = pages[pages["status"] == "binary"]
    if len(binary):
        row = binary.iloc[0]
        code = row["data_type"]
        mime = next((m for m, c in BINARY_TYPES.items() if c == code), None)
        p = os.path.join(out_dir, f"binary_{int(row['rank'])}_info.json")
        with open(p, "w") as f:
            json.dump(
                {
                    "rank": int(row["rank"]),
                    "url": row["url"],
                    "gen": int(row["gen"]),
                    "data_type": code,
                    "content_type": mime,
                },
                f,
                indent=2,
            )
        written["binary"] = p

    # 7. binary data-type registry
    p = os.path.join(out_dir, "data_types.json")
    with open(p, "w") as f:
        json.dump(BINARY_TYPES, f, indent=2)
    written["data_types"] = p

    return written


def main(argv=None) -> None:
    import argparse

    ap = argparse.ArgumentParser(description="export one exemplar per content family")
    ap.add_argument("--root", required=True, help="crawl checkpoint root")
    ap.add_argument("--corpus", required=True, help="corpus table path")
    ap.add_argument("--out", required=True, help="output directory")
    ap.add_argument("--n-images", type=int, default=1_000)
    ap.add_argument("--n-hosts", type=int, default=16)
    args = ap.parse_args(argv)
    spec = C.CorpusSpec(n_images=args.n_images, n_hosts=args.n_hosts)
    out = export_content_samples(args.root, spec, args.corpus, args.out)
    print(json.dumps(out, indent=2))


if __name__ == "__main__":
    main()
