"""Seed-file reader tests."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_read_seeds_parquet_and_csv(ray_session, tmp_path):
    tbl = pa.table(
        {
            "seed_id": ["a", "b"],
            "pager": ["vb4", "query"],
            "blueprint_url": ["http://x.example/t", "http://y.example/t"],
            "start": [1, 1],
            "end": [3, 2],
        }
    )
    pq.write_table(tbl, tmp_path / "seeds.parquet")
    from bbcrawl_ray.sources.readers import seed_rows_from_file

    rows = seed_rows_from_file(str(tmp_path / "seeds.parquet"))
    assert len(rows) == 2
    assert rows[0]["name"] == "page" and rows[0]["step"] == 1  # defaults filled

    csv_path = tmp_path / "seeds.csv"
    csv_path.write_text(
        "seed_id,pager,blueprint_url,start,end\n"
        "c,vb4,http://z.example/t,1,2\n"
    )
    rows2 = seed_rows_from_file(str(csv_path), fmt="csv")
    assert rows2[0]["seed_id"] == "c" and rows2[0]["digits"] == 0

    # these seed rows drive the pipeline directly
    from bbcrawl_ray.sources.pagers import expand_seed

    assert len(expand_seed(rows2[0])) == 2


def test_read_seeds_missing_column(ray_session, tmp_path):
    pq.write_table(pa.table({"seed_id": ["a"]}), tmp_path / "bad.parquet")
    from bbcrawl_ray.sources.readers import seed_rows_from_file

    with pytest.raises(Exception, match="missing required column"):
        seed_rows_from_file(str(tmp_path / "bad.parquet"))


def test_storage_adapter_parquet_roundtrip(ray_session, tmp_path):
    """The one-seam storage adapter round-trips through its default
    (parquet in this sandbox) with column pruning."""
    import ray.data as rd

    from bbcrawl_ray.state.storage import read_dataset, write_dataset

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()), "b": pa.array(["x", "y", "z"])})
    write_dataset(rd.from_arrow(t), str(tmp_path / "tbl"), fmt="parquet")
    out = (
        read_dataset([str(tmp_path / "tbl")], t.schema, fmt="parquet")
        .to_pandas()
        .sort_values("a")
    )
    assert list(out["a"]) == [1, 2, 3] and list(out["b"]) == ["x", "y", "z"]
    pruned = read_dataset(
        [str(tmp_path / "tbl")], t.schema, fmt="parquet", columns=["a"]
    ).to_pandas()
    assert list(pruned.columns) == ["a"]


def test_storage_adapter_lance_roundtrip(ray_session, tmp_path):
    """Runs the moment pylance lands in the environment (the north rule
    names Lance tables); cleanly skipped until then so the lance branch
    cannot rot silently."""
    from bbcrawl_ray.state.storage import lance_available, read_dataset, write_dataset

    if not lance_available():
        pytest.skip("pylance not installed in this sandbox")
    import ray.data as rd

    t = pa.table({"a": pa.array([1, 2, 3], pa.int64()), "b": pa.array(["x", "y", "z"])})
    write_dataset(rd.from_arrow(t), str(tmp_path / "tbl.lance"), fmt="lance")
    out = (
        read_dataset([str(tmp_path / "tbl.lance")], t.schema, fmt="lance")
        .to_pandas()
        .sort_values("a")
    )
    assert list(out["a"]) == [1, 2, 3] and list(out["b"]) == ["x", "y", "z"]
    pruned = read_dataset(
        [str(tmp_path / "tbl.lance")], t.schema, fmt="lance", columns=["a"]
    ).to_pandas()
    assert list(pruned.columns) == ["a"]
