"""Quality-audit harness + multimodal plumbing tests."""

from pyspark.sql import functions as F

from apache_iceberg_lakehouse_workshop_spark.operators import multimodal as MM
from apache_iceberg_lakehouse_workshop_spark.operators import quality as Q


def test_null_audit(spark):
    df = spark.createDataFrame([(1, None), (2, "x"), (3, None)], ["id", "v"])
    row = Q.null_audit(df, ["v"]).collect()[0]
    assert row.n_rows == 3 and row.null_v == 2


def test_out_of_range(spark):
    data = spark.createDataFrame([("a", 5.0), ("a", 50.0), ("b", 5.0)], ["k", "value"])
    bounds = spark.createDataFrame([("a", 0.0, 10.0)], ["k", "lo", "hi"])
    bad = Q.out_of_range(data, bounds, "value", ["k"]).collect()
    assert len(bad) == 1 and bad[0].value == 50.0


def test_duplicate_keys_and_orphans(spark):
    fact = spark.createDataFrame([(1, 10), (1, 11), (2, 12), (9, 13)], ["k", "v"])
    dim = spark.createDataFrame([(1,), (2,)], ["k"])
    dups = Q.duplicate_keys(fact, ["k"]).collect()
    assert [(d.k, d.n_dups) for d in dups] == [(1, 2)]
    orphans = Q.fk_orphans(fact, dim.withColumnRenamed("k", "dk"), "k", "dk").collect()
    assert [o.k for o in orphans] == [9]


def test_run_checks(spark):
    clean = spark.createDataFrame([(1,)], ["x"]).filter("x > 99")
    dirty = spark.createDataFrame([(1,)], ["x"])
    results = Q.run_checks({"clean": clean, "dirty": dirty})
    by_name = {r.name: r for r in results}
    assert by_name["clean"].passed and not by_name["dirty"].passed
    assert by_name["dirty"].violations == 1


def test_media_features_deterministic(spark):
    docs = spark.createDataFrame([(1, "hello"), (2, "hello"), (3, "bye")], ["doc_id", "text"])
    feats = MM.extract_features(MM.media_from_documents(docs)).collect()
    by_id = {r.media_id: r for r in feats}
    assert by_id[1].content_md5 == by_id[2].content_md5
    assert by_id[1].width == by_id[2].width and by_id[1].format == by_id[2].format
    assert by_id[1].content_md5 != by_id[3].content_md5
    assert by_id[1].n_bytes == 5
    assert by_id[1].format in ("png", "jpeg", "webp")
    assert 64 <= by_id[1].width < 256 and 64 <= by_id[1].height < 256


def test_decode_image_is_stubbed():
    import pytest

    with pytest.raises(MM.DecoderUnavailable):
        MM.decode_image(b"xx")


def test_resize_images_deterministic(spark):
    from apache_iceberg_lakehouse_workshop_spark.operators import multimodal as MM
    from apache_iceberg_lakehouse_workshop_spark.tables import load_table

    media = MM.media_from_documents(load_table(spark, "/root/testdata/sf0.001", "documents")).limit(20)
    out = MM.resize_images(media, max_side=128)
    rows = out.collect()
    assert len(rows) == 20
    assert all(max(r.width, r.height) <= 128 and min(r.width, r.height) >= 1 for r in rows)
    # deterministic: same input -> same fake re-encode
    again = {r.media_id: bytes(r.payload) for r in MM.resize_images(media, max_side=128).collect()}
    assert all(bytes(r.payload) == again[r.media_id] for r in rows)


def test_sample_frames_expansion(spark):
    from apache_iceberg_lakehouse_workshop_spark.operators import multimodal as MM
    from apache_iceberg_lakehouse_workshop_spark.tables import load_table

    media = MM.media_from_documents(load_table(spark, "/root/testdata/sf0.001", "documents")).limit(5)
    frames = MM.sample_frames(media, n_frames=4)
    assert frames.count() == 20  # 1 -> N row expansion
    one = frames.filter("media_id = 1").orderBy("frame_no").collect()
    assert [r.frame_no for r in one] == [0, 1, 2, 3]
    assert one[0].frame_ms == 0 and one[1].frame_ms > 0
    assert len({bytes(r.frame) for r in one}) == 4  # distinct frame payloads
