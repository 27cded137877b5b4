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


# ----------------------------------------------- real codecs (round 7)


def _mk_ppm(w, h, seed=0):
    import numpy as np

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return MM.encode_ppm(arr), arr


def _mk_bmp(arr):
    """Minimal 24-bit bottom-up BMP around an (h, w, 3) RGB array."""
    import struct

    h, w = arr.shape[0], arr.shape[1]
    stride = (w * 3 + 3) // 4 * 4
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        row = arr[y][:, ::-1].tobytes()  # RGB -> BGR
        rows.append(row + b"\x00" * (stride - len(row)))
    pixels = b"".join(rows)
    header = b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0, 54)
    dib = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + dib + pixels


def test_image_meta_real_headers():
    import struct

    ppm, _ = _mk_ppm(5, 3)
    assert MM.image_meta(ppm) == (5, 3, "ppm")
    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + struct.pack(">II", 640, 480) + b"\x08\x02" + b"\x00" * 20
    assert MM.image_meta(png) == (640, 480, "png")
    gif = b"GIF89a" + struct.pack("<HH", 320, 200) + b"\x00" * 10 + b"\x3b"
    assert MM.image_meta(gif) == (320, 200, "gif")
    # JPEG: SOI + APP0 + SOF0
    sof = b"\xff\xc0" + struct.pack(">HBHH", 11, 8, 240, 360) + b"\x03\x00\x00\x00"
    jpg = b"\xff\xd8\xff\xe0" + struct.pack(">H", 4) + b"JF" + sof
    assert MM.image_meta(jpg) == (360, 240, "jpeg")
    import numpy as np

    arr = np.zeros((4, 6, 3), dtype=np.uint8)
    assert MM.image_meta(_mk_bmp(arr)) == (6, 4, "bmp")


def test_prose_never_sniffs_as_image():
    """Text starting with format-magic-looking prefixes must stay opaque —
    the mm2 oracle replays the deterministic fake for document blobs."""
    for prose in (
        b"BMW makes cars and BMI is a statistic about bodies not images",
        b"P6 is a chess opening move in some annotation schemes maybe",
        b"GIF89a is mentioned here but this is just text " + b"x" * 40,
    ):
        assert MM.image_meta(prose) is None
        assert MM.decode_pixels(prose) is None


def test_ppm_bmp_pixel_roundtrip_and_resize():
    import numpy as np

    ppm, arr = _mk_ppm(8, 6, seed=7)
    got = MM.decode_pixels(ppm)
    assert np.array_equal(got, arr)
    bmp = _mk_bmp(arr)
    assert np.array_equal(MM.decode_pixels(bmp), arr)
    # nearest-neighbor resize: exact expected index sampling
    resized, nw, nh = MM.resize_nearest(arr, 4)
    assert (nw, nh) == (4, 3)
    ys = (np.arange(3) * (6 / 3)).astype(int)
    xs = (np.arange(4) * (8 / 4)).astype(int)
    assert np.array_equal(resized, arr[ys][:, xs])
    # compressed format with a valid header raises, not silently fakes
    import pytest as _pytest

    png = b"\x89PNG\r\n\x1a\n" + b"\x00\x00\x00\rIHDR" + b"\x00\x00\x00\x10\x00\x00\x00\x10" + b"\x08\x02" + b"\x00" * 20
    with _pytest.raises(MM.DecoderUnavailable):
        MM.decode_pixels(png)


def test_resize_images_real_path_in_spark(spark):
    """resize_images takes the REAL decode->resize->PPM-re-encode path for
    uncompressed payloads; output pixels are exact."""
    import numpy as np

    ppm, arr = _mk_ppm(10, 4, seed=3)
    media = spark.createDataFrame(
        [(1, bytearray(ppm), "image/x-portable-pixmap")],
        "media_id LONG, payload BINARY, mime STRING",
    )
    row = MM.resize_images(media, max_side=5).collect()[0]
    assert (row.width, row.height) == (5, 2)
    out = MM.decode_pixels(bytes(row.payload))
    ys = (np.arange(2) * (4 / 2)).astype(int)
    xs = (np.arange(5) * (10 / 5)).astype(int)
    assert np.array_equal(out, arr[ys][:, xs])
    assert row.mime == "image/x-portable-pixmap"


def test_wav_roundtrip_and_audio_features(spark):
    import numpy as np

    samples = bytes(range(256)) * 4  # 1024 8-bit samples
    wav = MM.encode_wav(samples, sample_rate=8000)
    assert MM.decode_wav(wav) == (1024, 8000, 1, 1)
    assert np.array_equal(
        MM.wav_samples(wav), np.frombuffer(samples, dtype=np.uint8)
    )
    media = spark.createDataFrame(
        [(1, bytearray(wav), "audio/wav"), (2, bytearray(b"not a wav"), "x")],
        "media_id LONG, payload BINARY, mime STRING",
    )
    rows = {r.media_id: r for r in MM.extract_audio_features(media).collect()}
    assert rows[1].n_samples == 1024
    assert rows[1].sample_rate == 8000
    assert rows[1].duration_ms == 128
    s = np.frombuffer(samples, dtype=np.uint8).astype(np.float64) - 128.0
    assert rows[1].rms == round(float(np.sqrt(np.mean(s * s))), 6)
    assert rows[2].n_samples is None  # non-WAV degrades to NULLs


def test_ppm_stream_frame_sampling(spark):
    """A concatenated-PPM stream (ffmpeg image2pipe) is REALLY split and
    uniformly sampled; frames come back byte-exact."""
    frames = [_mk_ppm(4, 4, seed=i)[0] for i in range(6)]
    stream = b"".join(frames)
    assert MM.split_ppm_stream(stream) == frames
    media = spark.createDataFrame(
        [(7, bytearray(stream), "video/x-ppm-stream")],
        "media_id LONG, payload BINARY, mime STRING",
    )
    got = sorted(MM.sample_frames(media, n_frames=3, fps=25).collect(),
                 key=lambda r: r.frame_no)
    assert [r.frame_no for r in got] == [0, 1, 2]
    # uniform picks over 6 frames: indices 0, 2, 4
    assert [bytes(r.frame) for r in got] == [frames[0], frames[2], frames[4]]
    assert [r.frame_ms for r in got] == [0, 2 * 1000 // 25, 4 * 1000 // 25]


def test_extract_features_real_meta_beats_fake(spark):
    ppm, _ = _mk_ppm(9, 2)
    media = spark.createDataFrame(
        [(1, bytearray(ppm), "image/x-portable-pixmap"),
         (2, bytearray(b"just text"), "text/plain")],
        "media_id LONG, payload BINARY, mime STRING",
    )
    rows = {r.media_id: r for r in MM.extract_features(media).collect()}
    assert (rows[1].width, rows[1].height, rows[1].format) == (9, 2, "ppm")
    fake = MM.fake_decode_meta(b"just text")
    assert (rows[2].width, rows[2].height, rows[2].format) == fake
