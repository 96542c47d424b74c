"""Seed-table readers: start a crawl from parquet/CSV/JSON seed files.

The reference has no file-format readers (one URL comes from argv);
the engine treats seeds as a table (FIXTURES.md §F1) so a 10^10-URL
crawl can be driven by a seed list too large for a command line.
Missing optional columns are filled with the pager defaults.
"""

from __future__ import annotations

import ray.data as rd
from ray.data import Dataset

import pyarrow as _pa

# (default value, explicit Arrow type — an untyped pa.array on an EMPTY
# batch would be null-typed and break cross-block schema unification)
_DEFAULTS = {
    "name": ("page", _pa.string()),
    "cut_index": (0, _pa.int64()),
    "cut_len": (0, _pa.int64()),
    "step": (1, _pa.int64()),
    "digits": (0, _pa.int64()),
    "adjust": (0, _pa.int64()),
    "startpage": ("", _pa.string()),
}

REQUIRED = ("seed_id", "pager", "blueprint_url", "start", "end")


def _fill_defaults(ds: Dataset) -> Dataset:
    import pyarrow as pa

    def fn(t: pa.Table) -> pa.Table:
        for col in REQUIRED:
            if col not in t.column_names:
                raise ValueError(f"seed table missing required column {col!r}")
        for col, (default, typ) in _DEFAULTS.items():
            if col not in t.column_names:
                t = t.append_column(col, pa.array([default] * t.num_rows, type=typ))
        return t

    return ds.map_batches(fn, batch_format="pyarrow")


def read_seeds(path: str, fmt: str = "parquet") -> Dataset:
    """Read a seeds table (parquet | csv | json) with defaults filled."""
    if fmt == "parquet":
        ds = rd.read_parquet(path)
    elif fmt == "csv":
        ds = rd.read_csv(path)
    elif fmt == "json":
        ds = rd.read_json(path)
    else:
        raise ValueError(f"unknown seeds format {fmt!r}")
    return _fill_defaults(ds)


def seed_rows_from_file(path: str, fmt: str = "parquet") -> list[dict]:
    """Driver-side convenience for CrawlConfig.seeds (small seed lists)."""
    return read_seeds(path, fmt).take_all()
