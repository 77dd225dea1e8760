"""Driver contract for the graft builder (Ray Data target).

Ray is initialised by the driver BEFORE this module is imported: nothing here
(or in the library) calls ``ray.init()`` / ``ray.shutdown()``.

* ``entry()``      — flagship pipeline on /root/testdata/sf0.001.
* ``queries()``    — one callable per implemented operator (SURVEY.md §2).
* ``oracle_sql()`` — DuckDB-equivalent SQL for the SQL-expressible subset;
  rows-only entries (crawl loop, custom hashes, heuristics) are omitted.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from ieps_crawler_ray.pipelines import analytics


def entry() -> Any:
    """Flagship: crawl-engine image pipeline at sf0.001 scale.

    Builds the deterministic synthetic image+caption corpus (the mandated
    Lance-layout input table), runs the decode → verify-phash → caption
    fingerprint stage, and returns the verified-pages dataset.
    """
    from ieps_crawler_ray.pipelines import crawl_pipeline

    return crawl_pipeline.entry_flagship()


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = dict(analytics.QUERIES)
    from ieps_crawler_ray.pipelines import binary_pages, clean, crawl_pipeline, media

    q.update(crawl_pipeline.QUERIES)
    q.update(media.QUERIES)
    q.update(clean.QUERIES)
    q.update(binary_pages.QUERIES)
    return q


def oracle_sql() -> dict[str, str]:
    from ieps_crawler_ray.pipelines import binary_pages, clean

    sql = dict(analytics.ORACLE_SQL)
    sql.update(clean.ORACLE_SQL)
    sql.update(binary_pages.ORACLE_SQL)
    return sql
