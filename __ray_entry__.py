"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in bbcrawl_ray) initialises or shuts down Ray.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline: the full bbcrawl-parity crawl (seeds → pager
    expansion → URL-seen dedup → politeness-budgeted fetch → HTML parse →
    interleaved span documents) over the deterministic synthetic corpus,
    plus a relational sanity aggregate over sf0.001 testdata.

    Returns the documents table (input_hint shape + crawl lineage).
    """
    from bbcrawl_ray.pipelines.entry import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from bbcrawl_ray.pipelines.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for each SQL-expressible queries() entry."""
    from bbcrawl_ray.pipelines.queries import ORACLE_SQL

    return dict(ORACLE_SQL)
