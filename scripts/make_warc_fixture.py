"""Deterministic WARC fixture generator for ``dq_warc_extract``.

Writes ``fixtures/warc/cc-sample-{0,1}.warc.gz`` — 40 synthetic crawl
documents in the Common Crawl member-per-record gzip layout, split
across two shard files (one InputPartition each). Every payload is a
pure function of the doc index ``i``, so the DuckDB oracle can
RECOMPUTE the expected ``warc_documents`` extraction from the same
formula instead of pinning hard-coded rows:

- default: an HTML response (title + h1 + two paragraphs with
  entities, a script block and a comment that extraction must drop);
- ``i % 10 == 3``: a ``text/plain`` response with no markup — the
  ``html_only`` filter must exclude it;
- ``i % 10 == 7``: an HTML response with NO Content-Type header —
  included via body sniffing, ``content_type`` NULL;
- plus per-shard ``warcinfo`` and per-even-doc ``request`` records
  that the response filter must skip.

gzip members are written with ``mtime=0`` so the bytes are
reproducible; re-running this script must be a no-op diff.
"""

from __future__ import annotations

import gzip
import io
import os

N_DOCS = 40
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "fixtures", "warc",
)


def html_payload(i: int) -> bytes:
    html = (
        f"<html><head><title>Doc {i}</title>"
        f"<script>var hidden={i};</script></head>"
        f"<body><h1>Doc {i}</h1>"
        f"<p>Paragraph one of doc {i}: alpha beta gamma {i * 7}.</p>"
        f"<p>Fish &amp; chips &lt;{i}&gt;</p>"
        f"<!-- comment {i} --></body></html>"
    )
    return html.encode()


def record(rtype: str, uri: str | None, payload: bytes, extra=()) -> bytes:
    head = [
        b"WARC/1.0",
        b"WARC-Type: " + rtype.encode(),
        b"WARC-Date: 2024-01-01T00:00:00Z",
        b"Content-Length: " + str(len(payload)).encode(),
    ]
    if uri is not None:
        head.append(b"WARC-Target-URI: " + uri.encode())
    head.extend(extra)
    return b"\r\n".join(head) + b"\r\n\r\n" + payload + b"\r\n\r\n"


def response(i: int) -> bytes:
    uri = f"http://corpus.example/doc/{i}"
    if i % 10 == 3:
        body = f"plain text document {i} with no markup.".encode()
        http = (
            b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n\r\n" + body
        )
    elif i % 10 == 7:
        http = b"HTTP/1.1 200 OK\r\n\r\n" + html_payload(i)
    else:
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n\r\n"
            + html_payload(i)
        )
    return record(
        "response", uri, http,
        (b"Content-Type: application/http; msgtype=response",),
    )


def gz_member(raw: bytes) -> bytes:
    buf = io.BytesIO()
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(raw)
    return buf.getvalue()


def main() -> None:
    os.makedirs(OUT_DIR, exist_ok=True)
    for shard in (0, 1):
        recs = [
            record(
                "warcinfo", None, b"software: fixture-gen\r\n",
                (b"Content-Type: application/warc-fields",),
            )
        ]
        for i in range(shard, N_DOCS, 2):
            recs.append(response(i))
            if i % 2 == 0:
                recs.append(
                    record(
                        "request", f"http://corpus.example/doc/{i}",
                        b"GET /doc HTTP/1.1\r\n",
                    )
                )
        path = os.path.join(OUT_DIR, f"cc-sample-{shard}.warc.gz")
        with open(path, "wb") as f:
            f.write(b"".join(gz_member(r) for r in recs))
        print(f"wrote {path} ({len(recs)} records)")


if __name__ == "__main__":
    main()
