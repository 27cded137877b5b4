"""Driver-contract smoke tests (entry / queries / oracle_sql)."""

import __spark_entry__ as contract


def test_entry_returns_rows(spark):
    df = contract.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"l_returnflag", "count_order", "avg_price"} <= set(df.columns)


def test_registry_shape(spark):
    qs = contract.queries()
    oracles = contract.oracle_sql()
    assert len(qs) >= 60
    assert set(oracles) <= set(qs)
    # every oracle-less query is one of the documented engine-internal ops
    rows_only = set(qs) - set(oracles)
    assert rows_only == {
        "d4_simhash_neardup",
        "s3_knn_lsh",
        "s4_knn_ivf",
        "mm2_media_features",
        "mm3_frame_sample",
    }


def test_all_queries_run_sf0001(spark, sf_dir):
    """Every registered query executes and returns a well-formed result."""
    for name, fn in contract.queries().items():
        df = fn(spark, sf_dir)
        n = df.count()
        assert n >= 0, name
        assert len(df.columns) > 0, name
