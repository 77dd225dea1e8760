"""Acceptance-audit runner — the analogue of the reference's
test/validate_crawler.py:32-47 ``run_all_checks``: one command that runs the
non-emptiness / coverage / rate / invariant checks over a crawl checkpoint
and prints a pass/fail table (reference sections: page counts :49, HTML
content+hash :87, binary :129, duplicates :175, links :239, robots :270,
sitemap :299, domain distribution :329). The reference audits Postgres; here
the source of truth is the Lance-layout checkpoint written by
``pipelines.crawl``, so several checks strengthen into exact invariants
(dup_of points at an earlier HTML winner, politeness budgets were respected
per generation, per-partition lineage is complete).

CLI::

    python -m ieps_crawler_ray.pipelines.audit --root /tmp/ckpt \
        --n-images 500 --n-hosts 10 [--politeness-factor 3]

Exit code is non-zero when any check fails.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd

from ..functions.urls import paths_of
from ..sources import corpus as C
from ..sources import lance_table as lt


def _load_pages(root: str) -> pd.DataFrame:
    from .crawl import _gd, _gens_of

    gens = _gens_of(root, "pages")
    if not gens:
        return pd.DataFrame()
    import pyarrow as pa

    return (
        pa.concat_tables([lt.read_pyarrow(_gd(root, "pages", g)) for g in gens])
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )


def run_all_checks(
    root: str, spec: C.CorpusSpec, politeness_factor: int = 1, min_pages: int = 1
) -> list[dict]:
    """→ one row per check: {check, passed, detail}. Pure reads — safe to run
    against a live checkpoint between generations (readers only trust
    manifest-listed fragments)."""
    from .crawl import _gd, _gens_of, _load_state

    rows: list[dict] = []

    def check(name: str, passed: bool, detail: str) -> None:
        rows.append({"check": name, "passed": bool(passed), "detail": detail})

    st = _load_state(root)
    pages = _load_pages(root)
    n = len(pages)

    # 1. page counts (validate_crawler.py:49-85): total + per-status spread,
    # and the total must equal the committed state's rank counter (lineage)
    dist = (
        ", ".join(f"{k}={v}" for k, v in pages["status"].value_counts().items())
        if n
        else "empty"
    )
    check(
        "page_count",
        n >= min_pages and st is not None and n == int(st["rank"]),
        f"{n} pages (state rank={st['rank'] if st else '?'}); {dist}",
    )
    if not n:
        return rows

    html = pages[pages["status"] == "html"]

    # 2. HTML content coverage (:87-113): ≥90% of HTML pages carry content
    with_content = int((html["caption"].str.len() > 0).sum()) if len(html) else 0
    pct = 100.0 * with_content / len(html) if len(html) else 100.0
    check("html_content", pct >= 90.0, f"{with_content}/{len(html)} html pages with content ({pct:.1f}%)")

    # 3. content-hash / dedup-index coverage (:114-122): every HTML winner
    # has its signature row in the committed dedup index
    sig_ranks: set = set()
    for g in _gens_of(root, "sigs"):
        t = lt.read_pyarrow(_gd(root, "sigs", g), columns=["rank"])
        sig_ranks.update(t["rank"].to_numpy().tolist())
    missing = set(html["rank"].astype(int)) - sig_ranks
    check(
        "content_hash_index",
        not missing,
        f"{len(html) - len(missing)}/{len(html)} html pages indexed"
        + (f"; missing ranks {sorted(missing)[:5]}" if missing else ""),
    )

    # 4. binary detection (:129-148): every BINARY page carries a data-type code
    binary = pages[pages["status"] == "binary"]
    bad_bin = int((binary["data_type"].str.len() == 0).sum()) if len(binary) else 0
    check(
        "binary_pages",
        bad_bin == 0,
        f"{len(binary)} binary pages, {len(binary) - bad_bin} with data-type code",
    )

    # 5. duplicates (:175-189): dup_of points at an EARLIER page that is an
    # HTML winner, and duplicate pages carry no content
    dup = pages[pages["status"] == "duplicate"]
    ok_dup = True
    if len(dup):
        winners = pages.set_index("rank")
        earlier = (dup["dup_of"].to_numpy() < dup["rank"].to_numpy()).all()
        w_status = winners.loc[dup["dup_of"].astype(int), "status"]
        ok_dup = bool(earlier and (w_status == "html").all() and (dup["caption"].str.len() == 0).all())
    check("duplicates", ok_dup, f"{len(dup)} duplicates, winners are earlier html pages")

    # 6. links (:239-258): extracted, and only from HTML winners
    from .crawl import CrawlResult

    links = CrawlResult(root=root).links_table().to_pandas()
    html_ranks = set(html["rank"].astype(int))
    bad_src = (
        int((~links["from_rank"].astype(int).isin(html_ranks)).sum()) if len(links) else 0
    )
    check(
        "links",
        len(links) > 0 and bad_src == 0,
        f"{len(links)} links from {links['from_rank'].nunique() if len(links) else 0} pages; {bad_src} from non-html",
    )

    # 7. robots compliance (:270-292): no fetched page path matches its
    # host's disallow prefixes; every disallowed page does match one
    viol = obey = 0
    for h, grp in pages.groupby("host_id"):
        pol = C.robots_for_host(spec, int(h))
        pref = tuple(pol.disallow_prefixes)
        pp = np.array(paths_of(grp["url"].tolist()), dtype=str)
        hit = (
            np.any([np.char.startswith(pp, p) for p in pref], axis=0)
            if pref
            else np.zeros(len(pp), dtype=bool)
        )
        stt = grp["status"].to_numpy()
        viol += int((hit & (stt != "disallowed")).sum())
        obey += int((~hit & (stt == "disallowed")).sum())
    check("robots", viol == 0 and obey == 0, f"{viol} disallowed-path fetches, {obey} spurious blocks")

    # 8. domain distribution + politeness rate (:329-357 + :373): pages span
    # hosts, and no (generation, host) exceeded its politeness budget
    n_hosts_seen = pages["host_id"].nunique()
    per = pages.groupby(["gen", "host_id"]).size()
    over = 0
    for (g, h), cnt in per.items():
        budget = C.robots_for_host(spec, int(h)).crawl_delay_slots * politeness_factor
        if cnt > budget:
            over += 1
    check(
        "politeness",
        over == 0,
        f"{n_hosts_seen} hosts; {over} (gen,host) cells over budget",
    )

    # 9. lineage completeness: metrics for every generation, a frontier
    # manifest at the committed generation, and a bloom file for every
    # bucket at its bloom_gen entry (resumability, north_rule)
    gens = sorted(pages["gen"].unique())
    mgens = set(_gens_of(root, "metrics"))
    missing_m = [g for g in gens if g not in mgens]
    fr_ok = lt.exists(_gd(root, "frontier", int(st["gen"])))
    blooms_ok = all(
        os.path.exists(os.path.join(root, "blooms", f"gen{g}", f"bloom-{b}.bin"))
        for b, g in enumerate(st.get("bloom_gen", []))
    )
    check(
        "lineage",
        not missing_m and fr_ok and blooms_ok,
        f"metrics for {len(mgens)} gens (missing {missing_m or 'none'}), "
        f"frontier@gen{st['gen']} {'ok' if fr_ok else 'MISSING'}, blooms {'ok' if blooms_ok else 'MISSING'}",
    )
    return rows


def main(argv=None) -> int:
    import argparse

    ap = argparse.ArgumentParser(description="acceptance-audit a crawl checkpoint")
    ap.add_argument("--root", required=True, help="crawl checkpoint root")
    ap.add_argument("--n-images", type=int, default=1_000)
    ap.add_argument("--n-hosts", type=int, default=16)
    ap.add_argument("--num-buckets", type=int, default=4)
    ap.add_argument("--binary-permille", type=int, default=0)
    ap.add_argument("--neardup-permille", type=int, default=0)
    ap.add_argument("--politeness-factor", type=int, default=1)
    ap.add_argument("--min-pages", type=int, default=1)
    args = ap.parse_args(argv)
    spec = C.CorpusSpec(
        n_images=args.n_images,
        n_hosts=args.n_hosts,
        num_buckets=args.num_buckets,
        binary_permille=args.binary_permille,
        neardup_permille=args.neardup_permille,
    )
    rows = run_all_checks(
        args.root, spec, politeness_factor=args.politeness_factor, min_pages=args.min_pages
    )
    width = max(len(r["check"]) for r in rows)
    print(f"===== CRAWL ACCEPTANCE AUDIT: {args.root} =====")
    for r in rows:
        mark = "PASS" if r["passed"] else "FAIL"
        print(f"  [{mark}] {r['check']:<{width}}  {r['detail']}")
    n_fail = sum(not r["passed"] for r in rows)
    print(f"{len(rows) - n_fail}/{len(rows)} checks passed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
