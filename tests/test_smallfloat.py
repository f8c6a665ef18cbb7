import duckdb
import numpy as np
import pytest

from neural_search_spark.index.smallfloat import (
    NUM_FREE_VALUES,
    byte4_to_int,
    int_to_byte4,
    quantize_length,
    quantize_length_np,
    quantize_length_sql,
)

EDGES = sorted(
    set(
        list(range(0, 200))
        + [2**k + d for k in range(4, 31) for d in (-1, 0, 1)]
        + [39, 40, 41, 1000, 4096, 123456, 2**31 - 1]
    )
)


def test_exact_below_40():
    # Lucene SmallFloat javadoc: values 0..NUM_FREE_VALUES+15 == 39 are exact
    assert NUM_FREE_VALUES == 24
    for i in range(0, 40):
        assert quantize_length(i) == i


def test_monotone_idempotent_byte_range():
    prev = -1
    for i in EDGES:
        b = int_to_byte4(i)
        assert 0 <= b <= 255
        q = byte4_to_int(b)
        assert q <= i  # truncation, never rounds up
        assert quantize_length(q) == q  # idempotent
        assert q >= prev
        prev = q


def test_numpy_matches_scalar():
    arr = np.array(EDGES, dtype=np.int64)
    got = quantize_length_np(arr)
    want = np.array([quantize_length(i) for i in EDGES], dtype=np.int64)
    np.testing.assert_array_equal(got, want)


def test_sql_expr_matches_scalar_duckdb():
    con = duckdb.connect()
    con.execute("CREATE TABLE t AS SELECT unnest(?) AS dl", [EDGES])
    rows = con.execute(f"SELECT dl, {quantize_length_sql('dl')} FROM t ORDER BY dl").fetchall()
    for dl, q in rows:
        assert q == quantize_length(dl), dl


@pytest.mark.usefixtures("spark")
def test_spark_column_matches_scalar(spark):
    from neural_search_spark.search.bm25 import quantize_length_col

    df = spark.createDataFrame([(i,) for i in EDGES], "dl long")
    rows = df.select("dl", quantize_length_col("dl").alias("q")).collect()
    for r in rows:
        assert r["q"] == quantize_length(r["dl"]), r["dl"]
