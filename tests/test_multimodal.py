"""Multimodal plumbing tests: schema, Arrow batch shape, partition
preservation, determinism of the fake decoder, and the stubbed real path."""

import hashlib

import pytest
from pyspark.sql import functions as F

from pyspark_data_quality_spark.multimodal import (
    audio_features,
    decode_image,
    frame_sample,
    image_features,
    media_stats,
    resize_images,
    text_as_media,
)


@pytest.fixture
def media(spark):
    rows = [(i, f"payload number {i} " * (i + 1)) for i in range(6)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    return text_as_media(df, width=8, height=8, channels=3)


def test_media_schema(media):
    assert dict(media.dtypes)["data"] == "binary"
    meta_fields = {
        f.name: f.dataType.simpleString()
        for f in media.schema["meta"].dataType.fields
    }
    assert meta_fields["width"] == "int"
    assert meta_fields["duration_ms"] == "bigint"


def test_media_stats_exact(spark, media):
    out = {r["media_id"]: r for r in media_stats(media).collect()}
    raw = {r["doc_id"]: r["text"] for r in spark.createDataFrame(
        [(i, f"payload number {i} " * (i + 1)) for i in range(6)], ["doc_id", "text"]
    ).collect()}
    for mid, text in raw.items():
        b = text.encode("utf-8")
        assert out[mid]["n_bytes"] == len(b)
        assert out[mid]["checksum_md5"] == hashlib.md5(b).hexdigest()
        assert 0.0 < out[mid]["entropy"] < 8.0


def test_media_stats_batch_shape(spark, media):
    # Force tiny Arrow batches: the op must produce identical results
    # regardless of batch partitioning (no cross-row state).
    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        small = {tuple(r) for r in media_stats(media).collect()}
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)
    big = {tuple(r) for r in media_stats(media).collect()}
    assert small == big


def test_partitioning_preserved(media):
    df4 = media.repartition(4)
    assert media_stats(df4).rdd.getNumPartitions() == 4  # no shuffle added


def test_image_features_deterministic(media):
    a = {tuple(r) for r in image_features(media).collect()}
    b = {tuple(r) for r in image_features(media).collect()}
    assert a == b and len(a) == 6
    for r in a:
        assert 0.0 <= r[1] <= 255.0  # mean_pixel


def test_resize_images(media):
    out = resize_images(media, out_width=4, out_height=4).collect()
    for r in out:
        assert r["width"] == 4 and r["height"] == 4
        assert len(r["data"]) == 4 * 4 * 3  # exact resized buffer size


def test_frame_sample_fanout(media):
    frames = frame_sample(media, every_ms=100, max_frames=5).collect()
    by_id = {}
    for r in frames:
        by_id.setdefault(r["media_id"], []).append(r)
    # duration_ms = 10 * n_chars, capped at 5 frames
    assert all(1 <= len(v) <= 5 for v in by_id.values())
    # distinct frames per asset (index salts the fake payload)
    f0 = sorted(by_id[5], key=lambda r: r["frame_idx"])
    assert len({bytes(r["frame_data"]) for r in f0}) == len(f0)


def test_audio_features(spark):
    rows = [(1, "some audio-ish payload content")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    media = text_as_media(df, kind="audio", sample_rate=8000)
    r = audio_features(media).collect()[0]
    assert r["n_samples"] == 8000 * (len(rows[0][1]) * 10) // 1000
    assert r["rms"] > 0.0
    assert 0.0 <= r["zero_crossing_rate"] <= 1.0


def test_real_decoder_gated_on_pillow(media):
    import importlib.util

    if importlib.util.find_spec("PIL") is None:
        # this container has no codec libs: the real path must fail loudly
        with pytest.raises(NotImplementedError):
            decode_image(b"abc", height=2, width=2, channels=1, decoder="real")
        with pytest.raises(Exception):
            # Spark wraps the NotImplementedError raised inside the UDF
            image_features(media, decoder="real").collect()
    else:
        # environments with pillow exercise a REAL decode round-trip
        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.new("RGB", (4, 2), (10, 20, 30)).save(buf, "PNG")
        px = decode_image(
            buf.getvalue(), height=2, width=4, channels=3, decoder="real"
        )
        assert px.shape == (2, 4, 3)
        assert tuple(px[0, 0]) == (10, 20, 30)
        # resize + grayscale conversion paths
        g = decode_image(
            buf.getvalue(), height=3, width=3, channels=1, decoder="real"
        )
        assert g.shape == (3, 3, 1)


def test_real_audio_decoder_gated_on_soundfile():
    import importlib.util

    from pyspark_data_quality_spark.multimodal.media import decode_audio

    if importlib.util.find_spec("soundfile") is None:
        # this container has no codec libs: the real path must fail loudly
        with pytest.raises(NotImplementedError):
            decode_audio(b"abc", n_samples=16, decoder="real")
    else:
        # environments with soundfile exercise a REAL decode round-trip
        import io

        import numpy as np
        import soundfile as sf

        buf = io.BytesIO()
        tone = (np.sin(np.linspace(0, 40 * np.pi, 800)) * 2000).astype(
            np.int16
        )
        sf.write(buf, tone, 8000, format="WAV", subtype="PCM_16")
        pcm = decode_audio(buf.getvalue(), n_samples=800, decoder="real")
        assert pcm.shape == (800,)
        assert pcm.dtype == np.int16
        assert np.abs(pcm).max() > 1000  # real samples, not silence


def test_media_dedup_exact_payloads(spark):
    from pyspark_data_quality_spark.multimodal.media import media_dedup

    rows = [
        (1, bytearray(b"samebytes")),
        (2, bytearray(b"samebytes")),   # byte-identical dup
        (3, bytearray(b"different")),
        (4, bytearray(b"samebytes")),   # another dup
    ]
    df = spark.createDataFrame(rows, "media_id int, data binary")
    surv = sorted(r["media_id"] for r in media_dedup(df).collect())
    assert surv == [1, 3]
    dups = sorted(r["media_id"] for r in media_dedup(df, mode="dups").collect())
    assert dups == [2, 4]
    with pytest.raises(ValueError, match="unknown mode"):
        media_dedup(df, mode="nope")


def test_media_dedup_null_payloads_all_survive(spark):
    """A missing payload is not a duplicate of another missing payload:
    NULL-data rows are excluded from the digest groupBy, all survive,
    and never show up as dups (ADVICE r4)."""
    from pyspark_data_quality_spark.multimodal.media import media_dedup

    rows = [
        (1, bytearray(b"samebytes")),
        (2, bytearray(b"samebytes")),
        (3, None),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "media_id int, data binary")
    surv = sorted(r["media_id"] for r in media_dedup(df).collect())
    assert surv == [1, 3, 4]
    dups = sorted(r["media_id"] for r in media_dedup(df, mode="dups").collect())
    assert dups == [2]


def test_media_phash_and_near_dup_pairs(spark):
    """pHash determinism (same payload -> same hash), single-pixel
    perturbation lands within a few bits, unrelated payloads do not
    pair at a tight threshold, NULL payloads yield NULL hash, and the
    banded join finds exactly the planted near-dups."""
    import random

    from pyspark_data_quality_spark.multimodal.media import (
        media_phash,
        phash_near_dup_pairs,
    )

    rng = random.Random(7)
    base = bytes(rng.randrange(256) for _ in range(1024))
    near = base[:-1] + bytes([base[-1] ^ 0x01])   # one byte differs
    other = bytes(rng.randrange(256) for _ in range(1024))
    rows = [(1, base), (2, base), (3, near), (4, other), (5, None)]
    df = spark.createDataFrame(rows, "media_id long, data binary")
    hashed = media_phash(df, decoder="fake")
    got = {r["media_id"]: r["phash"] for r in hashed.collect()}
    assert got[1] == got[2]            # determinism / exact dup
    assert got[5] is None
    ham = bin((got[1] ^ got[3]) & ((1 << 64) - 1)).count("1")
    assert 0 <= ham <= 6               # one-pixel change: a few bits
    far = bin((got[1] ^ got[4]) & ((1 << 64) - 1)).count("1")
    assert far > 6                     # unrelated content stays far

    pairs = phash_near_dup_pairs(hashed, max_hamming=6).collect()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert found[(1, 2)] == 0
    assert (1, 3) in found and (2, 3) in found
    assert not any(4 in p for p in found)

    import pytest as _pt
    with _pt.raises(ValueError, match="hash_size"):
        media_phash(df, hash_size=4)
    with _pt.raises(ValueError, match="max_hamming"):
        phash_near_dup_pairs(hashed, max_hamming=64)
    with _pt.raises(ValueError, match="highfreq_factor"):
        media_phash(df, highfreq_factor=0)

    # max_hamming=0 = exact-dup mode: one full-width band (the 64-bit
    # mask must not be built as a Long literal) — exactly the
    # equal-hash pairs, nothing else
    exact = phash_near_dup_pairs(hashed, max_hamming=0).collect()
    want = sorted(
        (a, b, 0)
        for a in got for b in got
        if a < b and got[a] is not None and got[a] == got[b]
    )
    assert sorted(
        (r["id_a"], r["id_b"], r["hamming"]) for r in exact
    ) == want
    assert (1, 2, 0) in want and not any(4 in p[:2] for p in want)


def test_phash_nondefault_id_col(spark):
    """media_phash's generator read the pre-rename id column name — any
    non-default id_col crashed every task with a KeyError."""
    from pyspark_data_quality_spark.multimodal.media import media_phash

    df = spark.createDataFrame(
        [(7, bytearray(b"payload-bytes" * 40))], ["doc_id", "data"]
    )
    rows = media_phash(df, id_col="doc_id", decoder="fake").collect()
    assert rows[0]["media_id"] == 7 and rows[0]["phash"] is not None


def test_media_dedup_duplicate_ids_and_null_payloads(spark):
    """With a NULL-payload row sharing a survivor's id, the old id-only
    semi join emitted that row TWICE (join + union); dedup now keys on
    (digest, id)."""
    from pyspark_data_quality_spark.multimodal.media import media_dedup

    df = spark.createDataFrame(
        [
            (1, bytearray(b"aaa")),
            (1, None),
            (2, bytearray(b"aaa")),  # dup of id=1's payload
            (3, bytearray(b"bbb")),
        ],
        "media_id long, data binary",
    )
    surv = media_dedup(df, mode="survivors").collect()
    # survivors: id=1 payload 'aaa', id=3 'bbb', plus the NULL row ONCE
    assert len(surv) == 3
    assert sum(1 for r in surv if r["data"] is None) == 1
    dups = media_dedup(df, mode="dups").collect()
    assert [r["media_id"] for r in dups] == [2]


def test_media_feature_ops_skip_null_payloads(spark):
    """image/audio/frame ops share media_stats' NULL contract: a NULL
    payload or meta row is skipped, never a bytes(None) worker crash."""
    from pyspark_data_quality_spark.multimodal.media import (
        audio_features,
        frame_sample,
        image_features,
        resize_images,
    )

    img = spark.createDataFrame(
        [
            (1, bytearray(b"x" * 64),
             {"height": 4, "width": 4, "channels": 1}),
            (2, None, {"height": 4, "width": 4, "channels": 1}),
        ],
        "media_id long, data binary, "
        "meta struct<height:int,width:int,channels:int>",
    )
    assert image_features(img).count() == 1
    assert resize_images(img, out_width=2, out_height=2).count() == 1
    vid = spark.createDataFrame(
        [
            (1, bytearray(b"v" * 64),
             {"height": 4, "width": 4, "channels": 1,
              "duration_ms": 2000}),
            (2, None,
             {"height": 4, "width": 4, "channels": 1,
              "duration_ms": 2000}),
        ],
        "media_id long, data binary, meta struct<height:int,width:int,"
        "channels:int,duration_ms:int>",
    )
    assert frame_sample(vid, every_ms=1000).count() == 2  # id=1 only
    with pytest.raises(ValueError, match="every_ms"):
        frame_sample(vid, every_ms=0)
    aud = spark.createDataFrame(
        [
            (1, bytearray(b"a" * 64),
             {"sample_rate": 8000, "duration_ms": 10}),
            (2, None, {"sample_rate": 8000, "duration_ms": 10}),
        ],
        "media_id long, data binary, "
        "meta struct<sample_rate:int,duration_ms:int>",
    )
    assert audio_features(aud).count() == 1
