"""WARC reader as a Spark 4 Python DataSource — Common Crawl's archive
format, the canonical raw feed of web-scale LLM corpora, readable with
``spark.read.format("warc").load(path)`` after one ``register`` call.

Pure-stdlib parsing (the WARC/1.x framing is header-lines + a
Content-Length-delimited payload; ``gzip`` transparently concatenates
the member-per-record .warc.gz layout Common Crawl uses), exposed
through the ``pyspark.sql.datasource`` API:

- one InputPartition per FILE: WARC records are not splittable inside a
  gzip member stream, and Common Crawl already shards crawls into ~1 GB
  files, so file granularity IS the task granularity — a listing of N
  files fans out to N parallel tasks with zero coordination;
- paths may be local (file or glob or directory) or any
  ``scheme://`` URI this pyarrow build's filesystems reach (s3/gs/
  hdfs/file/...): remote listing + the missing-path check stay on the
  DRIVER, and executors stream bytes via ``pyarrow.fs`` with gzip
  (including concatenated members) decoded transparently; remote URIs
  take one file or one directory — globs are local-only;
- the reader yields plain tuples; payloads are ``binary`` (the
  multimodal column contract — decode downstream via
  ``multimodal/media.py``, text-extract via the text operators);
- options: ``record_types`` (comma list, default ``response`` — the
  records a corpus pipeline wants; request/metadata/warcinfo framing is
  skipped without materializing payloads), ``max_payload_bytes``
  (truncate oversized payloads; ``payload_truncated`` flags them).

Scale shape: this is an INGESTION edge, deliberately Python-side (the
format has no JVM reader in stock Spark): the intended pattern is ONE
pass ``warc -> parquet`` (``write_dataset``), after which everything
downstream is columnar scans. Filters/pruning are not pushed into the
parser — project early and persist.

Reference parity: the reference engine reads tables only
(src/pyspark_data_quality has no ingestion layer); this is part of the
training-data extension surface.
"""

from __future__ import annotations

import glob
import gzip
import io
import os
from typing import Iterator

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
)

__all__ = ["WarcDataSource", "register_warc_source", "WARC_SCHEMA"]

WARC_SCHEMA = (
    "warc_file string, record_type string, url string, warc_date string, "
    "content_type string, content_length long, payload binary, "
    "payload_truncated boolean"
)


class _WarcFilePartition(InputPartition):
    """``fs_uri`` is set for remote files: the ORIGINAL user URI, kept
    verbatim so executors rebuild the exact same filesystem (authority
    — hdfs://namenode:8020 —, query params, credentials) that listed
    the files on the driver; ``path`` is then filesystem-relative. A
    reconstructed ``scheme://path`` string would silently drop the
    authority (pyarrow folds it into the filesystem object, not the
    path), connecting each task to whatever default the executor has.
    Local files carry ``fs_uri=None`` and an absolute ``path``."""

    def __init__(self, path: str, fs_uri: str | None = None):
        self.path = path
        self.fs_uri = fs_uri


class _WarcReader(DataSourceReader):
    def __init__(self, options: dict):
        path = options.get("path")
        if not path:
            raise ValueError("warc: .load(path) is required")
        self._path = path
        types = options.get("record_types", "response")
        self._types = {
            t.strip().lower() for t in types.split(",") if t.strip()
        } or None
        if "*" in (self._types or ()):  # explicit wildcard = keep all
            self._types = None
        mx = options.get("max_payload_bytes")
        self._max_payload = int(mx) if mx is not None else None

    def partitions(self):
        if "://" in self._path:
            return [
                _WarcFilePartition(rel, fs_uri=self._path)
                for rel in _remote_warc_paths(self._path)
            ]
        if os.path.isdir(self._path):
            paths = sorted(
                p
                for p in glob.glob(os.path.join(self._path, "**"), recursive=True)
                if os.path.isfile(p)
                and (".warc" in os.path.basename(p))
            )
        elif os.path.isfile(self._path):
            # literal file FIRST: a real path containing glob
            # metacharacters ("crawl[2024]/seg.warc.gz") would match
            # nothing as a pattern and raise a spurious not-found
            paths = [self._path]
        else:
            # no fallback to the raw path: a typo'd literal path must
            # fail HERE on the driver, not per-task in open()
            paths = sorted(glob.glob(self._path))
        if not paths:
            raise FileNotFoundError(f"warc: no files match {self._path!r}")
        return [_WarcFilePartition(p) for p in paths]

    def read(self, partition: _WarcFilePartition) -> Iterator[tuple]:
        path = partition.path
        with _open_warc_stream(path, getattr(partition, "fs_uri", None)) as stream:
            for headers, payload, truncated in _iter_warc_records(
                stream, self._types, self._max_payload
            ):
                yield (
                    os.path.basename(path),
                    headers.get("warc-type", ""),
                    headers.get("warc-target-uri"),
                    headers.get("warc-date"),
                    headers.get("content-type"),
                    int(headers.get("content-length", 0)),
                    payload,
                    truncated,
                )


def _remote_fs(uri: str):
    """(filesystem, fs-relative path) for a ``scheme://`` URI, with a
    pointed error for schemes this pyarrow build can't open."""
    from pyarrow import fs as pafs

    try:
        return pafs.FileSystem.from_uri(uri)
    except Exception as e:
        raise ValueError(
            f"warc: cannot open filesystem for {uri!r} ({e}); supported "
            "remote schemes are whatever this pyarrow build provides "
            "(file/s3/gs/hdfs...), plus plain local paths"
        ) from e


def _remote_warc_paths(uri: str) -> list[str]:
    """Driver-side listing for ``scheme://`` paths via ``pyarrow.fs`` —
    object-store WARC shards (Common Crawl lives on S3/HTTPS mirrors)
    read without a local mount. A URI names ONE file or ONE directory
    (listed recursively for ``*.warc*`` files); glob patterns are not
    supported on remote filesystems — the existence check still runs
    HERE so a typo'd bucket/key fails on the driver, not per-task.
    Returns FILESYSTEM-RELATIVE paths; executors pair them with the
    original URI (``_WarcFilePartition.fs_uri``) to rebuild the same
    authority-bearing filesystem."""
    from pyarrow import fs as pafs

    filesystem, rel = _remote_fs(uri)
    info = filesystem.get_file_info(rel)
    if info.type == pafs.FileType.Directory:
        sel = pafs.FileSelector(rel, recursive=True)
        files = sorted(
            i.path
            for i in filesystem.get_file_info(sel)
            if i.type == pafs.FileType.File
            and ".warc" in os.path.basename(i.path)
        )
    elif info.type == pafs.FileType.File:
        files = [rel]
    else:
        raise FileNotFoundError(
            f"warc: no files match {uri!r} (remote paths take one file "
            "or one directory; glob patterns are local-only)"
        )
    if not files:
        raise FileNotFoundError(f"warc: no .warc files under {uri!r}")
    return files


def _open_warc_stream(path: str, fs_uri: str | None = None):
    """Open a (possibly remote) WARC file as a buffered byte stream with
    gzip transparently decoded. Local paths (``fs_uri=None``) use python
    io; remote files rebuild the filesystem from the ORIGINAL user URI
    (preserving authority and query params) and open the fs-relative
    ``path`` — ``open_input_stream`` detects compression by extension
    and decodes concatenated gzip members, so the member-per-record
    .warc.gz layout reads straight through (verified in tests)."""
    if fs_uri is not None:
        filesystem, _ = _remote_fs(fs_uri)
        raw = filesystem.open_input_stream(path)  # compression='detect'
        return io.BufferedReader(raw, buffer_size=1 << 20)
    raw = gzip.open(path, "rb") if path.endswith(".gz") else open(path, "rb")
    return io.BufferedReader(raw, buffer_size=1 << 20)


def _iter_warc_records(stream, keep_types, max_payload):
    """Yield (headers, payload, truncated) per WARC record. Framing per
    ISO 28500: a ``WARC/1.x`` version line, ``Name: value`` header lines
    up to an empty line, exactly Content-Length payload bytes, then a
    blank-line record separator. Records whose type is filtered out are
    SKIPPED with seek-free reads but never materialized."""
    while True:
        line = stream.readline()
        if not line:
            return
        if not line.strip():
            continue  # inter-record blank lines
        if not line.startswith(b"WARC/"):
            raise ValueError(
                f"warc: expected version line, got {line[:40]!r}"
            )
        headers: dict[str, str] = {}
        while True:
            h = stream.readline()
            if not h or not h.strip():
                break
            if b":" in h:
                k, _, v = h.partition(b":")
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
        length = int(headers.get("content-length", 0))
        rtype = headers.get("warc-type", "").lower()
        wanted = keep_types is None or rtype in keep_types
        if not wanted:
            _skip_exact(stream, length)
            yield_record = None
        elif max_payload is not None and length > max_payload:
            payload = _read_exact(stream, max_payload)
            _skip_exact(stream, length - max_payload)
            yield_record = (headers, payload, True)
        else:
            yield_record = (headers, _read_exact(stream, length), False)
        if yield_record is not None:
            yield yield_record


def _read_exact(stream, n: int) -> bytes:
    buf = stream.read(n)
    while len(buf) < n:
        chunk = stream.read(n - len(buf))
        if not chunk:
            raise ValueError("warc: truncated record payload")
        buf += chunk
    return buf


def _skip_exact(stream, n: int) -> None:
    while n > 0:
        chunk = stream.read(min(n, 1 << 20))
        if not chunk:
            raise ValueError("warc: truncated record payload")
        n -= len(chunk)


class WarcDataSource(DataSource):
    """``spark.read.format("warc")`` provider; register once per session
    with :func:`register_warc_source`."""

    @classmethod
    def name(cls) -> str:
        return "warc"

    def schema(self) -> str:
        return WARC_SCHEMA

    def reader(self, schema) -> _WarcReader:
        return _WarcReader(self.options)


def register_warc_source(spark) -> None:
    spark.dataSource.register(WarcDataSource)


def warc_documents(warc_df, *, html_only: bool = True):
    """WET-style documents frame from a ``format("warc")`` read:
    ``(url, warc_date, content_type, text)`` with the HTTP headers
    stripped and HTML reduced to whitespace-normalized text — the shape
    the dedup / quality / classifier operators consume directly. The
    ``content_type`` column is the HTTP header's (the document MIME
    type users expect), not the WARC framing type (which is always
    ``application/http`` for response records).

    Pure JVM expressions (binary->string lenient decode, regex framing;
    functions/text.py ``http_body``/``html_to_text``), so the only
    Python in the path remains the per-file WARC parser. ``html_only``
    keeps records whose HTTP-declared or sniffed payload looks like
    HTML — the corpus-pipeline default; pass False to text-strip
    everything. ``record_type`` matches case-insensitively, like the
    reader's own ``record_types`` option.
    """
    from pyspark.sql import functions as F

    from ..functions.text import html_to_text, http_body

    payload_str = F.col("payload").cast("string")
    # search ONLY the HTTP header block (before the first blank line):
    # a body that happens to contain a "content-type:" line must not
    # masquerade as the declared type
    headers = F.when(
        F.instr(payload_str, "\r\n\r\n") > 0,
        F.substring_index(payload_str, "\r\n\r\n", 1),
    ).otherwise(F.lit(""))
    http_ct = F.nullif(
        F.trim(
            F.regexp_extract(
                headers, r"(?im)^content-type:\s*([^\r\n]+)", 1
            )
        ),
        F.lit(""),
    )
    body = http_body(F.col("payload"))
    out = (
        warc_df.filter(F.lower(F.col("record_type")) == "response")
        .withColumn("_body", body)
        .withColumn("_http_ct", http_ct)
    )
    if html_only:
        looks_html = (
            F.lower(F.coalesce(F.col("_http_ct"), F.lit(""))).contains(
                "html"
            )
            | F.col("_body").rlike(r"(?is)<\s*(!doctype\s+)?html")
            | F.lower(F.col("_body")).contains("<p>")
        )
        out = out.filter(looks_html)
    return out.select(
        "url",
        "warc_date",
        F.col("_http_ct").alias("content_type"),
        html_to_text(F.col("_body")).alias("text"),
    )
