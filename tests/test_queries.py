"""Driver-contract rehearsal: every queries() entry vs its DuckDB oracle.

Mirrors the driver's check (row-count + schema + order-insensitive
value comparison) at sf0.001 so CORRECTNESS_r{N}.json holds no surprises.
"""

import duckdb
import pandas as pd
import pytest

TABLES = [
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
]


def to_pandas(res):
    import pyarrow as pa

    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    df = df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def oracle_con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _names():
    from bbcrawl_ray.pipelines.queries import ORACLE_SQL

    return sorted(ORACLE_SQL)


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(ray_session, sf_dir, name):
    from bbcrawl_ray.pipelines.queries import ORACLE_SQL, QUERIES

    got = normalize(to_pandas(QUERIES[name](sf_dir)))
    exp = normalize(oracle_con(sf_dir).execute(ORACLE_SQL[name]).df())
    assert list(got.columns) == list(exp.columns)
    assert len(got) == len(exp), f"{name}: {len(got)} rows vs oracle {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, check_exact=True)


def test_all_queries_have_callables():
    from bbcrawl_ray.pipelines.queries import ORACLE_SQL, QUERIES

    assert set(ORACLE_SQL) <= set(QUERIES)


def test_knn_ivf_recall_entry(ray_session, sf_dir):
    """The self-measuring ANN gauge: recall@5 of IVF vs brute force is a
    valid fraction per query, and with n_probe=3 of 8 cells on the tiny
    corpus it should find at least some true neighbors overall."""
    from bbcrawl_ray.pipelines.queries_text import q_knn_ivf_recall

    df = q_knn_ivf_recall(sf_dir)
    assert list(df.columns) == ["query_id", "hits", "k", "recall"]
    assert len(df) == 5
    assert ((df["recall"] >= 0) & (df["recall"] <= 1)).all()
    assert df["hits"].sum() > 0


def test_auto_join_paths_agree(ray_session, sf_dir):
    """auto_join's broadcast and hash transports produce identical rows
    (the gate only picks transport, never semantics)."""
    import pandas as pd

    from bbcrawl_ray.pipelines import relops as R

    orders = R.read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = R.read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])

    def norm(ds):
        df = ds.to_pandas()[["o_orderkey", "c_nationkey"]].astype("int64")
        return df.sort_values(["o_orderkey", "c_nationkey"]).reset_index(drop=True)

    broadcast = norm(
        R.auto_join(orders, cust, left_on="o_custkey", right_on="c_custkey")
    )
    hashed = norm(
        R.auto_join(
            orders, cust, left_on="o_custkey", right_on="c_custkey",
            broadcast_bytes=0,
        )
    )
    assert len(broadcast) > 0
    pd.testing.assert_frame_equal(broadcast, hashed)


def test_auto_join_empty_right(ray_session):
    """An empty dimension side yields an empty inner join, not a
    KeyError from Ray's zero-column to_pandas on empty datasets."""
    import pyarrow as pa
    import ray.data as rd

    from bbcrawl_ray.pipelines import relops as R

    left = rd.from_arrow(pa.table({"a": pa.array([1, 2, 3], pa.int64())}))
    right = rd.from_arrow(
        pa.table({"b": pa.array([], pa.int64()), "c": pa.array([], pa.string())})
    )
    out = R.auto_join(left, right, left_on="a", right_on="b").to_pandas()
    assert len(out) == 0
