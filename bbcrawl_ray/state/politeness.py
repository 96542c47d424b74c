"""Per-host politeness: cluster-wide rate clocks + per-host budgets.

The reference is strictly serial (api.go:104-113), which is implicit
politeness. A parallel frontier needs it explicit, and it must hold
ACROSS the fetch actor pool: frontier rows for one host scatter over
N actors, so a per-actor clock would hit a host N× faster than
min_host_delay_s / robots Crawl-delay allows.

Design (the seen-shard pattern, state/seen.py): a small set of
``HostClockShard`` actors keyed by ``hash(host) % num_shards``. A
fetcher RESERVES a time slot per (host, delay) before each hit — the
shard advances its stored ``next_free[host]`` by ``delay`` and
returns the previous value; the fetcher sleeps until its slot. One
tiny RPC per fetch, only when a delay is actually in force (delay=0
short-circuits with no RPC), so the idle-host fast path costs
nothing. Slots are issued against wall-clock time (``time.time()``),
which is the only clock comparable across workers/nodes; politeness
is therefore accurate to cluster clock skew, which is fine for
crawl-delay semantics.

Budgets: each epoch every host gets at most ``per_host_budget``
fetches, chosen by (priority desc, page_num, url); the rest defer to
the next epoch. The grouped per-host choice is preceded by a
PER-BLOCK top-(budget) prune — global top-k per host is a subset of
the union of per-block top-k (the order is total), so rows outside a
block's local top-k can be marked deferred immediately and never
enter the shuffle. No host ever materializes as one
all-of-its-rows pandas group; the grouped stage sees at most
budget × num_blocks rows per host.

Hot-host skew splitting: hosts whose SELECTED rows exceed
``skew_split_threshold`` are salted into ``host#N`` sub-shards so one
giant host fans out across the fetch pool; rate limiting stays
correct because the clock shards above are global, not per-actor.
"""

from __future__ import annotations

import time
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray
from ray.data import Dataset

# ---------------------------------------------------------------------------
# cluster-wide per-host rate clocks


@ray.remote(num_cpus=0)
class HostClockShard:
    """Slot reservation for a shard of the host space.

    num_cpus=0: the actor only does dict lookups; reserving a CPU slot
    would starve small test clusters (see BASELINE.md scaling notes).
    """

    def __init__(self):
        self.next_free: dict[str, float] = {}

    def reserve(self, host: str, delay: float, n: int = 1) -> float:
        """Reserve ``n`` consecutive slots spaced ``delay`` apart.

        Returns the wall-clock time of the FIRST reserved slot; the
        caller sleeps until then. Reservations from any number of
        concurrent fetchers serialize here, so the spacing guarantee
        is global.
        """
        now = time.time()
        start = max(self.next_free.get(host, 0.0), now)
        self.next_free[host] = start + n * delay
        return start

    def release(self, host: str, expected_end: float, unused_s: float) -> bool:
        """Roll back ``unused_s`` seconds of a reservation whose window
        ended at ``expected_end`` — compare-and-swap style: succeeds
        only while next_free still equals that window end (nobody
        reserved after us), else the abandoned slots stay burned
        (extra politeness, never a violation). Lets a drifting worker
        resynchronize without queueing behind its own phantom backlog.
        """
        cur = self.next_free.get(host, 0.0)
        if abs(cur - expected_end) < 1e-6:
            self.next_free[host] = cur - unused_s
            return True
        return False

    def clear(self) -> None:
        self.next_free.clear()


class HostClock:
    """Client handle set: routes reserve() to hash(host) % num_shards.

    Serializable into actor-pool constructor args (Ray actor handles
    travel by reference).
    """

    def __init__(self, num_shards: int = 4):
        self.shards = [HostClockShard.remote() for _ in range(num_shards)]
        self.n = num_shards

    def reserve(self, host: str, delay: float, n: int = 1) -> float:
        # builtin hash(str) is per-process randomized — crc32 keeps every
        # worker routing one host to the SAME shard
        shard = self.shards[zlib.crc32(host.encode()) % self.n]
        return ray.get(shard.reserve.remote(host, delay, n))

    def release(self, host: str, expected_end: float, unused_s: float) -> bool:
        shard = self.shards[zlib.crc32(host.encode()) % self.n]
        return ray.get(shard.release.remote(host, expected_end, unused_s))

    def wait_turn(self, host: str, delay: float) -> None:
        """Reserve one slot and sleep until it arrives (no-op at delay<=0)."""
        if delay <= 0:
            return
        slot = self.reserve(host, delay)
        now = time.time()
        if slot > now:
            time.sleep(slot - now)


# ---------------------------------------------------------------------------
# per-host budgets + skew split


def _sort_host_block(g: pd.DataFrame) -> pd.DataFrame:
    return g.sort_values(
        ["priority", "page_num", "url"], ascending=[False, True, True], kind="mergesort"
    )


def budget_frontier(
    frontier: Dataset,
    per_host_budget: int | None,
    skew_split_threshold: int = 10_000,
    group_size_probe=None,
) -> Dataset:
    """Adds ``selected`` (fetch this epoch?) and ``host_shard`` columns.

    Selection order within a host: priority desc, then page_num asc,
    then url (total, deterministic).

    Fast path: with no budget there is nothing to rank, so the
    host-keyed shuffle is skipped entirely — a vectorized map adds
    selected=True / host_shard=host.

    Budgeted path: per-block top-(budget) prune per host first (rows
    outside their block's local top-k defer immediately, skew-safely),
    then the host-keyed grouped choice over candidates only. NOTE:
    ``frontier`` is consumed twice (candidates + early-deferred
    branches); callers pass either a cheap seed expansion or a
    checkpointed parquet read, both re-executable for free.
    """
    if per_host_budget is None:

        def mark_all(t: pa.Table) -> pa.Table:
            return t.append_column(
                "selected", pa.array(np.ones(t.num_rows, dtype=bool))
            ).append_column("host_shard", t["host"])

        return frontier.map_batches(mark_all, batch_format="pyarrow")

    budget = int(per_host_budget)

    def local_mark(df: pd.DataFrame) -> pd.DataFrame:
        """Per-block: rank rows within each host; cand = local top-budget."""
        df = _sort_host_block(df)
        rank = df.groupby("host", sort=False).cumcount()
        return df.assign(cand=(rank < budget).to_numpy())

    # materialized: BOTH branches below (candidates + deferred) read the
    # same computed blocks — re-executing the lineage twice would make
    # row conservation depend on the source being deterministic
    marked = frontier.map_batches(local_mark, batch_format="pandas").materialize()

    def defer_block(df: pd.DataFrame) -> pd.DataFrame:
        df = df[~df["cand"]].drop(columns=["cand"])
        return df.assign(selected=False, host_shard=df["host"])

    deferred = marked.map_batches(defer_block, batch_format="pandas")

    def per_host(g: pd.DataFrame) -> pd.DataFrame:
        g = _sort_host_block(g.drop(columns=["cand"]))
        n = len(g)
        if group_size_probe is not None:
            # test hook: lets a test assert the skew-safety invariant
            # (no host's grouped input exceeds budget × num_blocks)
            group_size_probe.record.remote(n)
        k = min(budget, n)
        selected = np.zeros(n, dtype=bool)
        selected[:k] = True
        g = g.assign(selected=selected)
        host = g["host"].iloc[0] if n else ""
        # salt only the WINNERS: deferred rows never fetch this epoch, so
        # they keep the plain host key (matches the early-deferred branch)
        shard_col = np.full(n, host, dtype=object)
        if k > skew_split_threshold:
            shards = int(np.ceil(k / skew_split_threshold))
            shard_col[:k] = [f"{host}#{i % shards}" for i in range(k)]
        g = g.assign(host_shard=shard_col)
        return g

    candidates = marked.map_batches(
        lambda df: df[df["cand"]], batch_format="pandas"
    )
    chosen = candidates.groupby("host").map_groups(per_host, batch_format="pandas")
    return chosen.union(deferred)
