"""Multimodal columns: opaque ``binary`` payloads + typed metadata,
processed with Arrow-batched ``mapInPandas`` pipelines.

Model (the standard large-scale layout — media rides WITH the row):
- payload: a ``binary`` column (encoded image/audio/video bytes);
- metadata: a typed struct column (:data:`MEDIA_META_SCHEMA`) carrying
  what the pipeline needs WITHOUT decoding (width/height/channels,
  sample rate, duration, container format).

Execution shape: every operator here is ``mapInPandas`` — one Python
worker per partition, Arrow-batched transfer (no per-row pickling), batch
size governed by ``spark.sql.execution.arrow.maxRecordsPerBatch`` (tune it
DOWN for large payloads: 10k rows x 1 MB images = 10 GB per batch is an
OOM, ~256 rows is sane). Operators preserve partitioning — no shuffle is
introduced; co-locate upstream (e.g. repartition by storage key) before
heavy decode so workers stream sequential bytes.

Decode stubs: this container has no image/audio codec libraries, so the
REAL decoders raise ``NotImplementedError`` by design; ``decoder='fake'``
yields a deterministic array derived from the payload bytes (tiled, not
random), so every downstream computation — pooling resize, pixel stats,
frame sampling, RMS/zero-crossings — is real, tested math on stable
inputs. Swapping in pillow/ffmpeg later only replaces ``_decode_*``.
"""

from __future__ import annotations

import hashlib
import math
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata struct carried next to every binary payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),          # image|audio|video
        T.StructField("format", T.StringType()),        # png|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),  # audio/video
        T.StructField("duration_ms", T.LongType()),     # audio/video
    ]
)


def text_as_media(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    kind: str = "image",
    width: int = 32,
    height: int = 32,
    channels: int = 3,
    sample_rate: int = 16000,
) -> DataFrame:
    """Deterministic media table from a text fixture: payload = UTF-8 bytes
    of the text, metadata typed per ``kind``. This is the test/bench stand-in
    for real object-store payloads — byte-level ops (stats, checksums) are
    exact; decode-level ops run through the fake decoder."""
    dur = (F.length(text_col).cast("long") * 10).alias("duration_ms")
    meta = F.struct(
        F.lit(kind).alias("kind"),
        F.lit("raw").alias("format"),
        F.lit(width).cast("int").alias("width"),
        F.lit(height).cast("int").alias("height"),
        F.lit(channels).cast("int").alias("channels"),
        F.lit(sample_rate).cast("int").alias("sample_rate"),
        dur,
    )
    return df.select(
        F.col(id_col).alias("media_id"),
        F.encode(F.col(text_col), "UTF-8").alias("data"),
        meta.alias("meta"),
    )


# ---------------------------------------------------------------------------
# Byte-level stats (no decode needed — always real)
# ---------------------------------------------------------------------------

_STATS_SCHEMA = (
    "media_id long, n_bytes long, checksum_md5 string, entropy double"
)


def media_stats(df: DataFrame, *, id_col: str = "media_id", data_col: str = "data") -> DataFrame:
    """Per-payload byte statistics: size, md5, Shannon entropy (bits/byte).

    Pure ``mapInPandas``: the binary column arrives as one Arrow buffer per
    batch; nothing is decoded, so this runs at I/O speed and is the standard
    first-pass integrity/size audit over a 100 TB media corpus.
    """

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf[data_col]
            ent = []
            md5s = []
            sizes = []
            for b in payloads:
                b = bytes(b) if b is not None else b""
                sizes.append(len(b))
                md5s.append(hashlib.md5(b).hexdigest())
                if b:
                    counts = np.bincount(
                        np.frombuffer(b, dtype=np.uint8), minlength=256
                    )
                    p = counts[counts > 0] / len(b)
                    ent.append(float(-(p * np.log2(p)).sum()))
                else:
                    ent.append(0.0)
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": pd.Series(sizes, dtype="int64"),
                    "checksum_md5": md5s,
                    "entropy": pd.Series(ent, dtype="float64"),
                }
            )

    return df.mapInPandas(gen, schema=_STATS_SCHEMA)


# ---------------------------------------------------------------------------
# Decoders (real = stubbed; fake = deterministic bytes->array)
# ---------------------------------------------------------------------------


def _fake_pixels(data: bytes, height: int, width: int, channels: int) -> np.ndarray:
    """Deterministic uint8 (h, w, c) array: payload bytes tiled to size.
    Same payload + shape -> identical pixels, so tests are exact."""
    if not data:
        return np.zeros((height, width, channels), dtype=np.uint8)
    flat = np.frombuffer(data, dtype=np.uint8)
    return np.resize(flat, (height, width, channels))


def decode_image(data: bytes, *, height: int, width: int, channels: int, decoder: str = "real") -> np.ndarray:
    """Decode an image payload to an (h, w, c) uint8 array.

    ``decoder='real'`` uses pillow when it is importable (resized to the
    requested shape, channel-converted to L/RGB/RGBA); in environments
    without an image codec library — this container — it raises
    ``NotImplementedError`` by design. ``decoder='fake'`` is the
    deterministic test decoder, so all downstream math stays testable
    either way.
    """
    if decoder == "fake":
        return _fake_pixels(data, height, width, channels)
    import importlib.util

    if importlib.util.find_spec("PIL") is not None:
        import io

        from PIL import Image

        mode = {1: "L", 3: "RGB", 4: "RGBA"}.get(channels)
        if mode is None:
            raise ValueError(f"decode_image: unsupported channel count {channels}")
        img = Image.open(io.BytesIO(data)).convert(mode)
        if img.size != (width, height):
            img = img.resize((width, height))
        px = np.asarray(img, dtype=np.uint8)
        return px.reshape(height, width, channels)
    raise NotImplementedError(
        "real image decoding requires pillow/opencv (not installed in this "
        "environment); use decoder='fake' for the deterministic test path"
    )


def _fake_pcm(data: bytes, n_samples: int) -> np.ndarray:
    """Deterministic int16 PCM: payload bytes tiled and centered."""
    if not data:
        return np.zeros(n_samples, dtype=np.int16)
    flat = np.frombuffer(data, dtype=np.uint8).astype(np.int16)
    return (np.resize(flat, n_samples) - 128) * 256


def decode_audio(data: bytes, *, n_samples: int, decoder: str = "real") -> np.ndarray:
    """Decode an audio payload to mono int16 PCM of exactly ``n_samples``.

    ``decoder='real'`` uses soundfile when it is importable (channels
    mixed down to mono, samples tiled/truncated to ``n_samples`` so
    downstream batch shapes stay fixed); in environments without an audio
    codec library — this container — it raises ``NotImplementedError`` by
    design. ``decoder='fake'`` is the deterministic test decoder.
    """
    if decoder == "fake":
        return _fake_pcm(data, n_samples)
    import importlib.util

    if importlib.util.find_spec("soundfile") is not None:
        import io

        import soundfile as sf

        samples, _sr = sf.read(io.BytesIO(data), dtype="int16", always_2d=True)
        if samples.size == 0:
            return np.zeros(n_samples, dtype=np.int16)
        mono = samples.mean(axis=1).astype(np.int16)
        return np.resize(mono, n_samples)
    raise NotImplementedError(
        "real audio decoding requires soundfile/ffmpeg (not installed in "
        "this environment); use decoder='fake' for the deterministic test "
        "path"
    )


# ---------------------------------------------------------------------------
# Image ops
# ---------------------------------------------------------------------------

_IMG_FEATURES_SCHEMA = (
    "media_id long, mean_pixel double, std_pixel double, "
    "width int, height int, channels int"
)


def image_features(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    data_col: str = "data",
    meta_col: str = "meta",
    decoder: str = "fake",
) -> DataFrame:
    """Decode (fake by default — see :func:`decode_image`) and emit basic
    pixel statistics. Vectorized numpy per Arrow batch."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data, meta in zip(pdf[id_col], pdf[data_col], pdf[meta_col]):
                if data is None or meta is None:
                    # same NULL contract as media_stats/media_phash:
                    # payload-less rows are skipped, never a worker crash
                    continue
                h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
                px = decode_image(
                    bytes(data), height=h, width=w, channels=c, decoder=decoder
                ).astype(np.float64)
                rows.append((int(mid), float(px.mean()), float(px.std()), w, h, c))
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "mean_pixel", "std_pixel",
                    "width", "height", "channels",
                ],
            )

    return df.mapInPandas(gen, schema=_IMG_FEATURES_SCHEMA)


_RESIZE_SCHEMA = "media_id long, data binary, width int, height int, channels int"


def resize_images(
    df: DataFrame,
    *,
    out_width: int,
    out_height: int,
    id_col: str = "media_id",
    data_col: str = "data",
    meta_col: str = "meta",
    decoder: str = "fake",
) -> DataFrame:
    """Mean-pool resize to (out_height, out_width); output payload is the
    raw resized pixel buffer. The pooling itself is real math (block mean
    over integer-ratio grids, nearest-neighbor sampling otherwise)."""

    def _resize(px: np.ndarray) -> np.ndarray:
        h, w, c = px.shape
        if h % out_height == 0 and w % out_width == 0:
            bh, bw = h // out_height, w // out_width
            return (
                px.reshape(out_height, bh, out_width, bw, c)
                .mean(axis=(1, 3))
                .astype(np.uint8)
            )
        yi = (np.arange(out_height) * h // out_height).clip(0, h - 1)
        xi = (np.arange(out_width) * w // out_width).clip(0, w - 1)
        return px[yi][:, xi]

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data, meta in zip(pdf[id_col], pdf[data_col], pdf[meta_col]):
                if data is None or meta is None:
                    continue  # NULL contract: skip, never a worker crash
                h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
                px = decode_image(
                    bytes(data), height=h, width=w, channels=c, decoder=decoder
                )
                out = _resize(px)
                rows.append((int(mid), out.tobytes(), out_width, out_height, c))
            yield pd.DataFrame(
                rows, columns=["media_id", "data", "width", "height", "channels"]
            )

    return df.mapInPandas(gen, schema=_RESIZE_SCHEMA)


# ---------------------------------------------------------------------------
# Video / audio ops
# ---------------------------------------------------------------------------

_FRAME_SCHEMA = "media_id long, frame_idx int, frame_data binary"


def frame_sample(
    df: DataFrame,
    *,
    every_ms: int = 1000,
    id_col: str = "media_id",
    data_col: str = "data",
    meta_col: str = "meta",
    decoder: str = "fake",
    max_frames: int = 64,
) -> DataFrame:
    """Sample one frame every ``every_ms`` of duration — one OUTPUT ROW PER
    FRAME (mapInPandas yields more rows than it consumes; no explode needed).
    ``max_frames`` caps per-asset fan-out so one pathological 10-hour video
    cannot blow up a partition."""
    if every_ms < 1:
        raise ValueError(
            f"frame_sample: every_ms must be >= 1, got {every_ms}"
        )

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data, meta in zip(pdf[id_col], pdf[data_col], pdf[meta_col]):
                if data is None or meta is None:
                    continue  # NULL contract: skip, never a worker crash
                h, w, c = int(meta["height"]), int(meta["width"]), int(meta["channels"])
                dur = int(meta["duration_ms"])
                n = min(max(dur // every_ms, 1), max_frames)
                for i in range(n):
                    # fake per-frame payload: frame index salted into bytes
                    frame = decode_image(
                        bytes(data) + i.to_bytes(4, "little"),
                        height=h, width=w, channels=c, decoder=decoder,
                    )
                    rows.append((int(mid), i, frame.tobytes()))
            yield pd.DataFrame(rows, columns=["media_id", "frame_idx", "frame_data"])

    return df.mapInPandas(gen, schema=_FRAME_SCHEMA)


_AUDIO_SCHEMA = (
    "media_id long, n_samples long, rms double, zero_crossing_rate double"
)


def audio_features(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    data_col: str = "data",
    meta_col: str = "meta",
    decoder: str = "fake",
) -> DataFrame:
    """PCM-level features (RMS, zero-crossing rate) over fake-decoded audio;
    real DSP math on deterministic samples."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, data, meta in zip(pdf[id_col], pdf[data_col], pdf[meta_col]):
                if data is None or meta is None:
                    continue  # NULL contract: skip, never a worker crash
                sr = int(meta["sample_rate"])
                dur = int(meta["duration_ms"])
                n = max(int(sr * dur / 1000), 1)
                pcm = decode_audio(
                    bytes(data), n_samples=n, decoder=decoder
                ).astype(np.float64)
                rms = float(math.sqrt((pcm**2).mean()))
                zc = float((np.diff(np.signbit(pcm)) != 0).mean()) if n > 1 else 0.0
                rows.append((int(mid), n, rms, zc))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "n_samples", "rms", "zero_crossing_rate"],
            )

    return df.mapInPandas(gen, schema=_AUDIO_SCHEMA)


def media_dedup(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    data_col: str = "data",
    mode: str = "survivors",
) -> DataFrame:
    """Exact binary-payload dedup: one survivor (min id) per distinct
    payload — scraped image/audio corpora are full of byte-identical
    files under different URLs, and this is the first pass before any
    perceptual/near-dup stage. Grouping key is the JVM-side md5 of the
    payload bytes (the shuffle carries 32-char digests, never payloads).
    ``mode='dups'`` returns the dropped rows instead.

    A NULL payload is NOT a duplicate of another NULL payload: rows with
    a NULL ``data_col`` are excluded from the digest groupBy, so they
    all survive (and never appear in ``mode='dups'``) — mirroring
    dedup_against's null-fingerprint semantics instead of collapsing
    every payload-less row onto the NULL md5 group.
    """
    if mode not in ("survivors", "dups"):
        raise ValueError(f"media_dedup: unknown mode {mode!r}")
    digest = F.md5(F.col(data_col))
    keep = (
        df.filter(F.col(data_col).isNotNull())
        .select(F.col(id_col), digest.alias("_d"))
        .groupBy("_d")
        .agg(F.min(id_col).alias(id_col))
    )
    # join on (digest, id), not id alone: with non-unique ids an
    # id-only semi join kept a NULL-payload row twice (once via the
    # join, once via the union) and retained non-survivor payloads that
    # happened to share a survivor's id
    with_d = df.filter(F.col(data_col).isNotNull()).withColumn(
        "_d", digest
    )
    if mode == "survivors":
        return (
            with_d.join(keep, [id_col, "_d"], "semi")
            .drop("_d")
            .unionByName(df.filter(F.col(data_col).isNull()))
        )
    return with_d.join(keep, [id_col, "_d"], "anti").drop("_d")


# ---------------------------------------------------------------------------
# Perceptual hashing (pHash) + banded near-dup
# ---------------------------------------------------------------------------


def _dct_matrix(n: int) -> np.ndarray:
    """Orthonormal DCT-II basis (the classic JPEG/pHash transform)."""
    k = np.arange(n).reshape(-1, 1)
    x = np.arange(n).reshape(1, -1)
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (2 * x + 1) * k / (2 * n))
    d[0, :] /= np.sqrt(2.0)
    return d


def media_phash(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    data_col: str = "data",
    decoder: str = "fake",
    hash_size: int = 8,
    highfreq_factor: int = 4,
) -> DataFrame:
    """64-bit perceptual hash per image payload — the public pHash
    recipe (decode to ``hash_size*highfreq_factor`` grayscale, 2-D
    DCT-II, keep the top-left ``hash_size²`` low-frequency block,
    threshold against its median, pack the bits): near-identical images
    (recompression, mild resize/brightness) land within a few bits,
    which is what byte-exact :func:`media_dedup` cannot see.

    One ``mapInPandas`` pass (numpy DCT per payload — the transform is
    two small matmuls, no scipy); output ``(id_col, phash long)``.
    NULL payloads yield a NULL phash. ``decoder`` follows
    :func:`decode_image` (this container: 'fake', deterministic).
    """
    n = hash_size * highfreq_factor
    if hash_size * hash_size != 64:
        raise ValueError(
            "media_phash: hash_size must be 8 (64-bit hash contract)"
        )
    if highfreq_factor < 1:
        raise ValueError(
            "media_phash: highfreq_factor must be >= 1 (it sets the "
            f"decode size hash_size*highfreq_factor), got {highfreq_factor}"
        )
    dct = _dct_matrix(n)

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            # the pre-select below renames id_col to media_id — read the
            # RENAMED column (reading pdf[id_col] crashed any caller
            # with a non-default id column)
            for mid, data in zip(pdf["media_id"], pdf[data_col]):
                ids.append(mid)
                if data is None:
                    hashes.append(None)
                    continue
                px = decode_image(
                    bytes(data), height=n, width=n, channels=1,
                    decoder=decoder,
                ).reshape(n, n).astype(np.float64)
                low = (dct @ px @ dct.T)[:hash_size, :hash_size]
                bits = (low > np.median(low)).flatten()
                h = np.uint64(0)
                for b in bits:
                    h = np.uint64(h << np.uint64(1)) | np.uint64(int(b))
                hashes.append(int(h.astype(np.int64)))
            yield pd.DataFrame(
                {
                    "media_id": pd.Series(ids, dtype="int64"),
                    "phash": pd.Series(hashes, dtype="Int64"),
                }
            )

    from ..plans.parallelism import ensure_min_partitions

    # decode + DCT per payload is the heavy part — spread a
    # single-split media file so the kernel doesn't serialize on one
    # task (no-op at scale, r15-opt)
    return ensure_min_partitions(
        df.select(F.col(id_col).alias("media_id"), F.col(data_col))
    ).mapInPandas(gen, schema="media_id long, phash long")


def phash_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    phash_col: str = "phash",
    max_hamming: int = 6,
) -> DataFrame:
    """Near-duplicate image pairs by pHash Hamming distance, WITHOUT a
    cross join: the 64 hash bits split into ``max_hamming + 1`` bands,
    and by pigeonhole any pair within ``max_hamming`` bits agrees on at
    least one whole band — so candidates come from equi-joins on
    (band_index, band_value), exactly the SimHash banding argument
    (operators/dedup.py). Exact ``bit_count(xor)`` then verifies each
    candidate; output (id_a, id_b, hamming), id_a < id_b.

    Scale shape: each row explodes to ``max_hamming + 1`` (band, value)
    rows; the join shuffles those ~16-byte rows on the band key; cost ∝
    candidates sharing a band, never |rows|².
    """
    bands = max_hamming + 1
    if not 1 <= bands <= 64:
        raise ValueError(
            "phash_near_dup_pairs: max_hamming must be in [0, 63]"
        )
    bounds = [round(i * 64 / bands) for i in range(bands + 1)]
    h = F.col(phash_col)
    entries = []
    for i in range(bands):
        lo, hi = bounds[i], bounds[i + 1]
        width = hi - lo
        # width == 64 (max_hamming=0, one band) means the band IS the
        # hash — and (1<<64)-1 does not fit a LongType literal, so the
        # mask must be skipped, not built.
        if width == 64:
            val = h
        else:
            mask = (1 << width) - 1
            val = F.shiftrightunsigned(h, lo).bitwiseAND(F.lit(mask))
        entries.append(
            F.struct(F.lit(i).alias("band"), val.alias("val"))
        )
    keyed = (
        df.filter(h.isNotNull())
        .select(F.col(id_col).alias("_id"), h.alias("_h"),
                F.explode(F.array(*entries)).alias("_b"))
        .select("_id", "_h", "_b.band", "_b.val")
    )
    left = keyed.select(
        F.col("_id").alias("id_a"), F.col("_h").alias("_ha"),
        "band", "val",
    )
    right = keyed.select(
        F.col("_id").alias("id_b"), F.col("_h").alias("_hb"),
        "band", "val",
    )
    return (
        left.join(right, ["band", "val"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.bit_count(
                F.col("_ha").bitwiseXOR(F.col("_hb"))
            ).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
        .orderBy("id_a", "id_b")
    )
