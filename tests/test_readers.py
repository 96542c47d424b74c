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
