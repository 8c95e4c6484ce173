"""Multimodal plumbing + Structured Streaming surface."""

from __future__ import annotations

import os
import tempfile

import pytest
from pyspark.sql import functions as F

from c99_vectordb_spark.operators import multimodal as MM


def test_media_schema_and_features(spark, documents):
    media = MM.media_from_documents(documents.limit(20))
    out = MM.extract_features(media).collect()
    assert len(out) == 20
    for r in out:
        assert r.n_bytes > 0
        assert len(r.feature) == 8
        assert abs(sum(r.feature) - 1.0) < 1e-9
        assert r.head_hash >= 0


def test_features_deterministic(spark, documents):
    media = MM.media_from_documents(documents.limit(10))
    a = sorted(map(tuple, MM.extract_features(media).collect()))
    b = sorted(map(tuple, MM.extract_features(media).collect()))
    assert a == b


def test_decode_stub_raises_for_real_codecs():
    # JPEG moved out of the stub tier in r5: a truncated payload is a
    # MALFORMED jpeg now, not an unsupported codec
    with pytest.raises(MM.MediaDecodeError):
        MM.decode_payload(b"\xff\xd8\xff", "image/jpeg")
    # PNG likewise (r4)
    with pytest.raises(MM.MediaDecodeError):
        MM.decode_payload(b"\x89PNG", "image/png")
    # genuinely stubbed codecs still say so
    with pytest.raises(NotImplementedError):
        MM.decode_payload(b"ID3\x04", "audio/mpeg")


def test_png_roundtrip_all_filters():
    """encode_png -> decode_png must be identity (up to zero padding)
    under every PNG scanline filter, and the typed metadata must carry
    the geometry."""
    for ft in range(5):
        for n in [0, 1, 11, 12, 13, 100, 997]:
            content = bytes((i * 37 + ft) % 256 for i in range(n))
            out, meta = MM.decode_png(MM.encode_png(content, filter_type=ft))
            rows = max(1, -(-n // 12))
            assert out == content.ljust(rows * 12, b"\x00"), (ft, n)
            assert meta == {
                "width": 4,
                "height": rows,
                "bit_depth": 8,
                "color_type": 2,
            }


def test_png_rejects_malformed():
    good = MM.encode_png(b"some png content here")
    with pytest.raises(MM.MediaDecodeError, match="signature"):
        MM.decode_png(b"not a png at all")
    with pytest.raises(MM.MediaDecodeError):
        MM.decode_png(good[:20])  # truncated mid-IHDR
    corrupt = bytearray(good)
    corrupt[40] ^= 0xFF  # flip a byte inside IDAT -> CRC mismatch
    with pytest.raises(MM.MediaDecodeError, match="CRC"):
        MM.decode_png(bytes(corrupt))
    # interlaced flag rejected explicitly
    import struct as _struct
    import zlib as _zlib

    ihdr = _struct.pack(">IIBBBBB", 4, 1, 8, 2, 0, 0, 1)
    interlaced = (
        b"\x89PNG\r\n\x1a\n"
        + _struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + _struct.pack(">I", _zlib.crc32(b"IHDR" + ihdr) & 0xFFFFFFFF)
    )
    with pytest.raises(MM.MediaDecodeError, match="interlaced"):
        MM.decode_png(interlaced)


def test_png_media_through_arrow_path(spark, documents):
    """The PNG generator + meta probe + feature extractor through real
    Spark mapInPandas stages: geometry closed-form, decoded length =
    height*12."""
    docs = documents.limit(20)
    media = MM.media_from_documents_png(docs)
    meta = MM.media_decode_meta(media)
    assert meta.filter(~meta.ok).count() == 0
    feats = MM.extract_features(media)
    joined = (
        meta.select("id", "meta")
        .join(feats.select("id", "n_bytes"), "id")
        .collect()
    )
    assert len(joined) == 20
    for r in joined:
        assert int(r.meta["width"]) == 4
        assert r.n_bytes == int(r.meta["height"]) * 12


def test_jpeg_container_meta_roundtrip():
    """encode_jpeg_container -> decode_jpeg_meta carries the SOF0
    geometry with closed-form dimensions, and total payload size is
    content + JPEG_CONTAINER_OVERHEAD (UTF-8 content has no 0xFF, so
    the entropy segment is length-preserving)."""
    for n in [0, 1, 11, 12, 13, 100, 997]:
        content = bytes((i * 37) % 255 for i in range(n))  # 255: avoid 0xFF
        p = MM.encode_jpeg_container(content)
        meta = MM.decode_jpeg_meta(p)
        assert meta == {
            "width": 4,
            "height": max(1, -(-n // 12)),
            "components": 3,
            "precision": 8,
            "mode": "baseline",
        }
        assert len(p) == n + MM.JPEG_CONTAINER_OVERHEAD
    with pytest.raises(ValueError, match="0xFF"):
        MM.encode_jpeg_container(b"\xff")


def test_jpeg_meta_rejects_malformed():
    good = MM.encode_jpeg_container(b"jpeg header tier")
    with pytest.raises(MM.MediaDecodeError, match="SOI"):
        MM.decode_jpeg_meta(b"not a jpeg")
    with pytest.raises(MM.MediaDecodeError):
        MM.decode_jpeg_meta(good[:10])  # truncated mid-APP0
    with pytest.raises(MM.MediaDecodeError, match="missing SOF"):
        MM.decode_jpeg_meta(b"\xff\xd8\xff\xd9")  # SOI + EOI, no frame
    # segment length overruns the payload
    with pytest.raises(MM.MediaDecodeError, match="overruns"):
        MM.decode_jpeg_meta(b"\xff\xd8\xff\xe0\xff\xff")
    # progressive SOF2 is still geometry; lossless SOF3 is rejected
    assert MM.decode_jpeg_meta(
        good.replace(b"\xff\xc0", b"\xff\xc2", 1)
    )["mode"] == "progressive"
    with pytest.raises(MM.MediaDecodeError, match="coding process"):
        MM.decode_jpeg_meta(good.replace(b"\xff\xc0", b"\xff\xc3", 1))
    # the header-tier container carries fake entropy bytes — the REAL
    # pixel decoder must reject it as malformed, not crash or return
    with pytest.raises(MM.MediaDecodeError):
        MM.decode_payload(good, "image/jpeg")


def test_jpeg_media_through_arrow_path(spark, documents):
    """JPEG generator + meta probe through real mapInPandas stages:
    geometry closed-form in the document byte length."""
    docs = documents.limit(20)
    media = MM.media_from_documents_jpeg(docs)
    meta = MM.media_decode_meta(media)
    assert meta.filter(~meta.ok).count() == 0
    rows = (
        meta.select("id", "meta")
        .join(docs.selectExpr("doc_id as id", "octet_length(text) as n"), "id")
        .collect()
    )
    assert len(rows) == 20
    for r in rows:
        assert int(r.meta["width"]) == 4
        assert int(r.meta["height"]) == max(1, -(-r.n // 12))
        assert r.meta["mode"] == "baseline"


def test_decode_image_array_shapes():
    import numpy as np

    # BMP: bottom-up storage comes back top-down
    img = np.arange(4 * 4 * 3, dtype=np.uint8).reshape(4, 4, 3)
    bmp = MM.encode_bmp(img[::-1].tobytes(), width=4)  # encode stores bottom-up
    arr = MM.decode_image_array(bmp, "image/bmp")
    assert arr.shape == (4, 4, 3)
    # BGR/row-order details are the format's own; shape + byte content pin it
    assert arr.sum() == img.sum()
    # PNG round-trips content exactly
    content = bytes(range(48)) * 2
    arr = MM.decode_image_array(MM.encode_png(content, filter_type=2), "image/png")
    assert arr.tobytes() == content.ljust(arr.size, b"\x00")
    # JPEG via the full codec
    from c99_vectordb_spark.operators.jpeg_codec import encode_jpeg

    rgb = np.full((8, 8, 3), 77, dtype=np.uint8)
    arr = MM.decode_image_array(encode_jpeg(rgb), "image/jpeg")
    assert arr.shape == (8, 8, 3) and (arr == 77).all()
    with pytest.raises(MM.MediaDecodeError):
        MM.decode_image_array(b"abc", "audio/wav")


def test_resize_image_nearest_and_bilinear():
    import numpy as np

    img = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    # nearest half-scale: samples odd rows/cols (pixel-center mapping)
    out = MM.resize_image(img, 4, 4, "nearest")
    assert np.array_equal(out, img[1::2, 1::2])
    # upscale nearest: every source pixel appears, shape exact
    up = MM.resize_image(img, 16, 16, "nearest")
    assert up.shape == (16, 16, 3)
    assert np.array_equal(up[::2, ::2], img)
    # constant image is invariant under both methods
    flat = np.full((8, 8, 3), 123, dtype=np.uint8)
    for m in ("nearest", "bilinear"):
        assert (MM.resize_image(flat, 5, 7, m) == 123).all()
    # bilinear on a linear ramp stays within rounding of the ramp
    ramp = np.tile(np.arange(0, 255, 2, dtype=np.uint8)[None, :, None], (8, 1, 3))
    rb = MM.resize_image(ramp, 8, 64, "bilinear").astype(int)
    assert np.abs(np.diff(rb[0, :, 0])).max() <= 4  # smooth, no blockiness
    with pytest.raises(ValueError):
        MM.resize_image(img, 0, 4, "nearest")
    with pytest.raises(ValueError):
        MM.resize_image(img, 4, 4, "lanczos")


def test_audio_stats_hand_checked(spark):
    import numpy as np

    samples = np.array([0, 5, -3, -1, 2, 0, -7, 7], dtype="<i2")
    media = spark.createDataFrame(
        [(1, "audio", "audio/wav", MM.encode_wav(samples.tobytes()), None)],
        MM.MEDIA_SCHEMA,
    )
    r = MM.media_audio_stats(media).collect()[0]
    # sign flips (zeros are non-negative): 0|5 no, 5|-3 yes, -3|-1 no,
    # -1|2 yes, 2|0 no, 0|-7 yes, -7|7 yes -> 4
    assert (r.n_samples, r.zero_crossings) == (8, 4)
    assert r.abs_sum == sum(abs(int(x)) for x in samples)
    assert r.peak == 7
    assert r.sample_rate == 8000


def test_parsers_never_crash_on_fuzz():
    """Every pure-Python parser must either parse or raise
    MediaDecodeError on arbitrary bytes — random, truncated-valid, and
    single-byte-flipped-valid inputs. No IndexError/struct.error."""
    from hypothesis import given, settings, strategies as st

    goods = {
        MM.decode_bmp: MM.encode_bmp(b"fuzz content here" * 3),
        MM.decode_wav: MM.encode_wav(b"fuzz samples" * 4),
        MM.decode_png: MM.encode_png(b"fuzz png bytes" * 5, filter_type=3),
        MM.decode_jpeg_meta: MM.encode_jpeg_container(b"fuzz jpeg body"),
    }

    @settings(max_examples=120, deadline=None)
    @given(st.data())
    def prop(data) -> None:
        parser = data.draw(st.sampled_from(list(goods)))
        good = goods[parser]
        mode = data.draw(st.integers(0, 2))
        if mode == 0:
            payload = data.draw(st.binary(max_size=120))
        elif mode == 1:
            payload = good[: data.draw(st.integers(0, len(good)))]
        else:
            i = data.draw(st.integers(0, len(good) - 1))
            b = data.draw(st.integers(0, 255))
            payload = good[:i] + bytes([b]) + good[i + 1 :]
        try:
            parser(payload)
        except MM.MediaDecodeError:
            pass

    prop()


def test_frame_sample(spark, documents):
    media = MM.media_from_documents(documents.limit(5))
    frames = MM.frame_sample(media, every_n_bytes=50).collect()
    assert all(f.byte_offset % 50 == 0 for f in frames)
    by_id = {}
    for f in frames:
        by_id.setdefault(f.id, []).append(f.frame_idx)
    for idxs in by_id.values():
        assert sorted(idxs) == list(range(len(idxs)))


def test_streaming_windowed_events_matches_batch(spark, sf_dir):
    """Run the streaming windowed agg over the events table as a
    bounded stream (availableNow) and compare with the batch twin."""
    from c99_vectordb_spark.functions.text import normalize_event_time
    from c99_vectordb_spark.streaming.ingest import stream_windowed_events

    events_batch = normalize_event_time(
        spark.read.parquet(f"{sf_dir}/events.parquet")
    ).select("ts", "event_type", "value")
    expected = (
        events_batch.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias(
                "window_start"
            ),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .collect()
    )

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        events_batch.write.parquet(src)
        stream = (
            spark.readStream.schema(events_batch.schema).parquet(src)
        )
        agg = stream_windowed_events(stream)
        q = (
            agg.writeStream.format("memory")
            .queryName("win_out")
            .outputMode("complete")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("win_out").collect()

    def key(rows):
        return sorted((r.window_start, r.event_type, r.cnt, round(r.sum_value, 6)) for r in rows)

    assert key(got) == key(expected)


def test_streaming_save_batch_ingest(spark):
    """File-source save batches -> foreachBatch upsert into the store,
    embeddings maintained incrementally."""
    from c99_vectordb_spark.model import SAVE_BATCH_SCHEMA
    from c99_vectordb_spark.sources.store import ParquetStore
    from c99_vectordb_spark.streaming.ingest import stream_save_batches

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "incoming")
        os.makedirs(src)
        store = ParquetStore(spark, os.path.join(tmp, "db"))

        batch1 = spark.createDataFrame(
            [(None, "first streamed record", None, None, None),
             (None, "second streamed record", None, None, None)],
            SAVE_BATCH_SCHEMA,
        )
        batch1.write.parquet(os.path.join(src, "b1.parquet"))

        writer = stream_save_batches(
            spark, src, store, os.path.join(tmp, "ckpt"), dim=64
        )
        q = writer.start()
        q.awaitTermination(120)

        recs = store.load_records().orderBy("id").collect()
        embs = store.load_embeddings().collect()
        assert [r.id for r in recs] == [0, 1]
        assert {r.body for r in recs} == {
            "first streamed record",
            "second streamed record",
        }
        assert len(embs) == 2 and all(len(e.vec) == 64 for e in embs)


# ---------------------------------------------------------------------------
# real BMP/WAV codecs (public formats, pure stdlib)
# ---------------------------------------------------------------------------

def test_bmp_roundtrip_and_meta():
    content = bytes(range(256)) * 3
    bmp = MM.encode_bmp(content, width=4)
    decoded, meta = MM.decode_bmp(bmp)
    assert decoded[: len(content)] == content
    assert meta["bpp"] == 24 and meta["width"] == 4
    assert meta["height"] == len(decoded) // 12


def test_wav_roundtrip_and_meta():
    samples = b"\x01\x02" * 500
    wav = MM.encode_wav(samples, channels=2, rate=16000, bits=16)
    decoded, meta = MM.decode_wav(wav)
    assert decoded == samples
    assert meta == {"channels": 2, "sample_rate": 16000, "bits": 16}


def test_wav_roundtrip_odd_length():
    """RIFF pad byte lives OUTSIDE the data chunk size: odd-length
    sample data must round-trip exactly, no trailing NUL."""
    samples = b"\x01\x02\x03"
    decoded, _ = MM.decode_wav(MM.encode_wav(samples, bits=8))
    assert decoded == samples


def test_bmp_rejects_bad_dimensions():
    import struct as _struct

    import pytest as _pytest

    bad = bytearray(MM.encode_bmp(b"abc" * 24))
    _struct.pack_into("<i", bad, 18, -4)  # negative width
    with _pytest.raises(MM.MediaDecodeError):
        MM.decode_bmp(bytes(bad))
    bad2 = bytearray(MM.encode_bmp(b"abc" * 24))
    _struct.pack_into("<i", bad2, 22, 0)  # zero height
    with _pytest.raises(MM.MediaDecodeError):
        MM.decode_bmp(bytes(bad2))


def test_meta_probe_honest_for_stubbed_mimes(spark):
    """media_decode_meta must not claim ok=True for a mime whose
    headers it cannot actually parse: fully-stubbed codecs report the
    missing-codec error, and a malformed payload of a header-tier mime
    (JPEG since r5) reports the decode error, never ok=True."""
    media = spark.createDataFrame(
        [
            (1, "image", "image/jpeg", b"\xff\xd8\xff", None),  # truncated
            (2, "text", "application/raw", b"abc", None),
            (3, "audio", "audio/mpeg", b"ID3\x04", None),  # stub tier
            (4, "image", "image/jpeg", MM.encode_jpeg_container(b"px"), None),
        ],
        MM.MEDIA_SCHEMA,
    )
    by_id = {m.id: m for m in MM.media_decode_meta(media).collect()}
    assert by_id[1].ok is False and by_id[1].error
    assert by_id[2].ok is True
    assert by_id[3].ok is False and "codec" in by_id[3].error
    assert by_id[4].ok is True and by_id[4].meta["mode"] == "baseline"


def test_decode_rejects_malformed():
    import pytest as _pytest

    with _pytest.raises(MM.MediaDecodeError):
        MM.decode_bmp(b"XX not a bmp")
    with _pytest.raises(MM.MediaDecodeError):
        MM.decode_wav(b"RIFFxxxxNOPE")
    # truncated pixel data
    good = MM.encode_bmp(b"abc" * 24)
    with _pytest.raises(MM.MediaDecodeError):
        MM.decode_bmp(good[:-5])
    # JPEG is a real codec since r5: malformed -> MediaDecodeError
    with _pytest.raises(MM.MediaDecodeError):
        MM.decode_payload(b"\xff\xd8\xff", "image/jpeg")


def test_mixed_media_features_end_to_end(spark, documents):
    """documents -> real BMP/WAV payloads -> Arrow decode -> features:
    every doc decodes OK, features are normalized histograms."""
    media = MM.media_from_documents_mixed(documents)
    feats = MM.extract_features(media).collect()
    n_docs = documents.count()
    assert len(feats) == n_docs
    for r in feats:
        assert r.n_bytes is not None and r.n_bytes > 0
        assert abs(sum(r.feature) - 1.0) < 1e-9
    metas = MM.media_decode_meta(media).collect()
    assert all(m.ok for m in metas)
    by_mime = {}
    for m in metas:
        by_mime.setdefault(m.mime, 0)
        by_mime[m.mime] += 1
    assert set(by_mime) == {"image/bmp", "audio/wav"}
    # typed metadata came from the real headers
    img = next(m for m in metas if m.mime == "image/bmp")
    assert img.meta["bpp"] == "24"
    aud = next(m for m in metas if m.mime == "audio/wav")
    assert aud.meta["sample_rate"] == "8000"


def test_streaming_session_windows_match_batch(spark, sf_dir):
    """Session windows as a bounded stream (append mode + watermark):
    every emitted session must equal its batch twin, and every batch
    session that the final watermark passed must have been emitted."""
    import datetime as _dt

    from c99_vectordb_spark.functions.text import normalize_event_time
    from c99_vectordb_spark.streaming.ingest import stream_session_events

    events_batch = (
        normalize_event_time(spark.read.parquet(f"{sf_dir}/events.parquet"))
        .filter(F.col("user_id") < 50)
        .select("user_id", "ts", "value")
    )
    batch_sessions = (
        events_batch.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("sum_value"),
        )
        .select(
            "user_id",
            F.date_format("w.start", "yyyy-MM-dd HH:mm:ss").alias("session_start"),
            F.date_format("w.end", "yyyy-MM-dd HH:mm:ss").alias("session_end"),
            "cnt",
            "sum_value",
        )
        .collect()
    )
    max_ts = events_batch.agg(F.max("ts")).collect()[0][0]
    cutoff = max_ts - _dt.timedelta(hours=1)

    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        events_batch.write.parquet(src)
        stream = spark.readStream.schema(events_batch.schema).parquet(src)
        q = (
            stream_session_events(stream)
            .writeStream.format("memory")
            .queryName("sess_out")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.table("sess_out").collect()

    def key(rows):
        return {
            (r.user_id, r.session_start, r.session_end, r.cnt, round(r.sum_value, 6))
            for r in rows
        }

    batch_all = key(batch_sessions)
    streamed = key(got)
    # nothing invented: every streamed session is a real batch session
    assert streamed <= batch_all
    # completeness: sessions the final watermark definitely passed
    must_emit = {
        (r.user_id, r.session_start, r.session_end, r.cnt, round(r.sum_value, 6))
        for r in batch_sessions
        if _dt.datetime.strptime(r.session_end, "%Y-%m-%d %H:%M:%S") < cutoff
    }
    assert must_emit <= streamed
    assert len(streamed) > 0


def test_streaming_keep_first_matches_batch(spark, sf_dir):
    """Streaming dropDuplicates dedup == the batch keep-first winners.
    The source file is written in (ts_us, event_id) order as ONE
    partition, so arrival order equals event-time order and the
    stream's first-arrival rule coincides with the batch min rule."""
    from c99_vectordb_spark.queries_registry import _read_events, queries
    from c99_vectordb_spark.streaming.ingest import stream_keep_first

    batch = {
        (r.user_id, r.event_type, r.ts_us, r.event_id)
        for r in queries()["events_keep_first"](spark, sf_dir).collect()
    }

    events = _read_events(spark, sf_dir).select(
        "user_id", "event_type", "ts", "ts_us", "event_id"
    )
    with tempfile.TemporaryDirectory() as tmp:
        src = os.path.join(tmp, "src")
        events.orderBy("ts_us", "event_id").coalesce(1).write.parquet(src)
        stream = spark.readStream.schema(
            events.schema
        ).option("maxFilesPerTrigger", "1").parquet(src)
        q = (
            stream_keep_first(stream)
            .writeStream.format("memory")
            .queryName("keepfirst_out")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(tmp, "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            (r.user_id, r.event_type, r.ts_us, r.event_id)
            for r in spark.table("keepfirst_out").collect()
        }
    assert got == batch


# ---------------------------------------------------------------------------
# AVI container (encode_avi / decode_avi) — the real video tier
# ---------------------------------------------------------------------------

def test_avi_roundtrip_preserves_content():
    from c99_vectordb_spark.operators.multimodal import decode_avi, encode_avi

    content = bytes(range(256)) * 3
    payload = encode_avi(content)
    frames, meta = decode_avi(payload)
    assert meta["width"] == 4 and meta["height"] == 3
    assert meta["frame_bytes"] == 36 and meta["fps"] == 10
    assert meta["n_frames"] == -(-len(content) // 36)
    joined = b"".join(frames)
    assert joined[: len(content)] == content
    assert set(joined[len(content):]) <= {0}  # zero padding only


def test_avi_decode_rejects_garbage():
    import pytest

    from c99_vectordb_spark.operators.multimodal import (
        MediaDecodeError,
        decode_avi,
        encode_avi,
    )

    with pytest.raises(MediaDecodeError):
        decode_avi(b"RIFFxxxxWAVE")
    with pytest.raises(MediaDecodeError):
        decode_avi(b"not a riff at all")
    good = encode_avi(b"hello world " * 10)
    with pytest.raises(MediaDecodeError):
        decode_avi(good[:40])  # truncated mid-chunk
    # corrupt a movi frame size -> frame/stride mismatch or truncation
    bad = bytearray(good)
    pos = bad.find(b"00db")
    bad[pos + 4] = 7  # declared size no longer stride*height
    with pytest.raises(MediaDecodeError):
        decode_avi(bytes(bad))


def test_avi_single_frame_minimum():
    from c99_vectordb_spark.operators.multimodal import decode_avi, encode_avi

    frames, meta = decode_avi(encode_avi(b""))
    assert meta["n_frames"] == 1 and frames == [b"\x00" * 36]
