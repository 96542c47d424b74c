"""Storage adapter: Lance when available, Parquet fallback (one seam).

The north rule targets Lance tables for the interleaved span documents;
``pylance`` is not installed in this sandbox, so the adapter probes for
it once and falls back to Parquet. All checkpoint/table IO goes through
these two functions, so flipping the format is a config change, not a
refactor.
"""

from __future__ import annotations

import pyarrow as pa

from ray.data import Dataset


def lance_available() -> bool:
    try:
        import lance  # noqa: F401

        return True
    except ImportError:
        return False


DEFAULT_FORMAT = "lance" if lance_available() else "parquet"


def write_dataset(ds: Dataset, path: str, fmt: str | None = None, **kwargs) -> None:
    fmt = fmt or DEFAULT_FORMAT
    if fmt == "parquet":
        ds.write_parquet(path, **kwargs)
    elif fmt == "lance":
        if not lance_available():
            raise ImportError("pylance not installed — use fmt='parquet'")
        ds.write_lance(path, **kwargs)
    else:
        raise ValueError(f"unknown storage format {fmt!r}")


def read_dataset(paths: list[str], schema: pa.Schema, fmt: str | None = None, columns=None):
    """Empty-safe read over possibly-missing directories (mirrors
    pipelines.crawl.read_parquet_dirs, format-dispatched)."""
    fmt = fmt or DEFAULT_FORMAT
    if fmt == "parquet":
        from ..pipelines.crawl import read_parquet_dirs

        return read_parquet_dirs(paths, schema, columns=columns)
    if fmt == "lance":
        if not lance_available():
            raise ImportError("pylance not installed — use fmt='parquet'")
        import ray.data as rd

        ds = rd.read_lance(paths[0]) if len(paths) == 1 else rd.read_lance(paths)
        return ds.select_columns(list(columns)) if columns else ds
    raise ValueError(f"unknown storage format {fmt!r}")
