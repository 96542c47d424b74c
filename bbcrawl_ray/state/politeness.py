"""Per-host politeness budgets + hot-host skew splitting.

The reference is strictly serial (api.go:104-113), which is implicit
politeness. A parallel frontier needs it explicit (north rule): each
epoch, every host gets at most ``per_host_budget`` fetches, chosen by
priority; the rest defer to the next epoch. Hot forums (hosts whose
selected rows exceed ``skew_split_threshold``) are salted into
sub-partitions (``host_shard``) so one giant host fans out across the
fetch actor pool instead of serializing one actor — rate limiting
stays correct because the per-host min-delay clock lives per actor and
sub-partitions of one host share the epoch budget chosen HERE, before
the split.

Implemented as a grouped transform (``groupby('host').map_groups``):
the budget decision needs all of a host's candidate rows together, so
this is a genuine shuffle keyed on host — the ONE partitioning key the
crawl reuses (seen-dedup shards on url_hash are actor-side lookups,
not Dataset shuffles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ray.data import Dataset


def budget_frontier(
    frontier: Dataset,
    per_host_budget: int | None,
    skew_split_threshold: int = 10_000,
) -> Dataset:
    """Adds ``selected`` (fetch this epoch?) and ``host_shard`` columns.

    Selection order within a host: priority desc, then page_num asc,
    then url (total, deterministic).

    Fast path: with no budget there is nothing to rank, so the
    host-keyed shuffle is skipped entirely — a vectorized map adds
    selected=True / host_shard=host (hot-host skew splitting only
    matters when a budget makes the per-host choice).
    """
    if per_host_budget is None:
        import pyarrow as pa

        def mark_all(t: "pa.Table") -> "pa.Table":
            return t.append_column(
                "selected", pa.array(np.ones(t.num_rows, dtype=bool))
            ).append_column("host_shard", t["host"])

        return frontier.map_batches(mark_all, batch_format="pyarrow")

    def per_host(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(
            ["priority", "page_num", "url"], ascending=[False, True, True], kind="mergesort"
        )
        n = len(g)
        k = n if per_host_budget is None else min(per_host_budget, n)
        selected = np.zeros(n, dtype=bool)
        selected[:k] = True
        g = g.assign(selected=selected)
        host = g["host"].iloc[0] if n else ""
        if k > skew_split_threshold:
            shards = int(np.ceil(k / skew_split_threshold))
            sub = (np.arange(n) % shards).astype(np.int64)
            g = g.assign(host_shard=[f"{host}#{s}" for s in sub])
        else:
            g = g.assign(host_shard=host)
        return g

    return frontier.groupby("host").map_groups(per_host, batch_format="pandas")
