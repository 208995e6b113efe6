"""WARC source/sink — the Common Crawl interchange format as a first-class
Ray Data source.

The north rule's corpus is "Common-Crawl-style pages"; CC's native wire
format is WARC (ISO 28500), not Parquet, so a production run of this
engine ingests `*.warc.gz` segments and may need to emit them (page-cache
exports, downstream tool interop). The reference never touches WARC (its
fetcher is live HTTP — async_crawler_strategy.py), so this is one of the
beyond-reference source formats, implemented from the public spec with
stdlib gzip only.

Layout follows CC convention: each record is its own gzip MEMBER inside a
`.warc.gz` shard, so a byte-range index can seek to any record without
decompressing the shard prefix (the CDX access pattern); Python's gzip
handles multi-member streams transparently on read.

Determinism/resumability: a shard's filename is the hash of its record
urls, so re-running a write produces byte-identical files under the same
names (idempotent, skip-finished-partitions semantics); record ids are
url-keyed, not random UUIDs. Every record carries WARC-Payload-Digest
(md5 of the payload at WRITE time); the reader recomputes it, making
round-trip byte-losslessness an in-band, per-record check (`digest_ok`)
rather than an out-of-band diff.
"""

from __future__ import annotations

import gzip
import hashlib
import os
from datetime import datetime

import pyarrow as pa

import ray

_WARC_DATE_FMT = "%Y-%m-%dT%H:%M:%SZ"


def _record_bytes(url: str, ts: datetime, payload: bytes) -> bytes:
    """One WARC/1.0 response record (headers + HTTP block + record
    separator), per the public spec."""
    http = (
        b"HTTP/1.1 200 OK\r\n"
        b"Content-Type: text/html; charset=utf-8\r\n"
        + f"Content-Length: {len(payload)}\r\n\r\n".encode()
        + payload
    )
    digest = hashlib.md5(payload).hexdigest()
    rec_id = hashlib.md5(url.encode()).hexdigest()
    headers = (
        "WARC/1.0\r\n"
        "WARC-Type: response\r\n"
        f"WARC-Record-ID: <urn:md5:{rec_id}>\r\n"
        f"WARC-Date: {ts.strftime(_WARC_DATE_FMT)}\r\n"
        f"WARC-Target-URI: {url}\r\n"
        f"WARC-Payload-Digest: md5:{digest}\r\n"
        "Content-Type: application/http; msgtype=response\r\n"
        f"Content-Length: {len(http)}\r\n"
        "\r\n"
    ).encode()
    return headers + http + b"\r\n\r\n"


def write_warc(
    pages: "ray.data.Dataset",
    out_dir: str,
    url_col: str = "url",
    ts_col: str = "warc_ts",
    html_col: str = "html",
) -> "ray.data.Dataset":
    """Sink: pages Dataset → `out_dir/shard-<hash>.warc.gz`, one gzip
    member per record, one shard per input block (task-local writes — no
    shuffle, no driver transit). Returns the shard manifest
    (path, n_records, n_bytes) as a Dataset.

    Shard names are content-derived (the hash of the block's urls), so
    re-running the SAME dataset with the SAME block layout is idempotent
    byte-for-byte — but a different block layout writes differently-named
    shards, so `out_dir` must be fresh (or cleaned) per logical export;
    mixing layouts in one dir would double records on read."""
    os.makedirs(out_dir, exist_ok=True)

    def write_batch(batch: pa.Table) -> pa.Table:
        urls = batch.column(url_col).to_pylist()
        tss = batch.column(ts_col).to_pylist()
        htmls = batch.column(html_col).to_pylist()
        if not urls:
            return pa.table(
                {
                    "path": pa.array([], pa.string()),
                    "n_records": pa.array([], pa.int64()),
                    "n_bytes": pa.array([], pa.int64()),
                }
            )
        members = []
        for url, ts, payload in zip(urls, tss, htmls):
            if isinstance(payload, str):
                payload = payload.encode("utf-8")
            rec = _record_bytes(url, ts, payload)
            # mtime=0 → deterministic gzip bytes (no wall-clock in header)
            members.append(gzip.compress(rec, mtime=0))
        blob = b"".join(members)
        shard = hashlib.md5("\n".join(urls).encode()).hexdigest()[:16]
        path = os.path.join(out_dir, f"shard-{shard}.warc.gz")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, path)  # atomic: a reader never sees a torn shard
        return pa.table(
            {
                "path": pa.array([path], pa.string()),
                "n_records": pa.array([len(urls)], pa.int64()),
                "n_bytes": pa.array([len(blob)], pa.int64()),
            }
        )

    return pages.map_batches(write_batch, batch_format="pyarrow")


def _parse_warc_stream(data: bytes):
    """Yield (headers dict, http block bytes) per record from a
    decompressed WARC stream."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record blank lines
        while pos < n and data[pos : pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = data.index(b"\r\n\r\n", pos)
        head_lines = data[pos:head_end].decode("utf-8").split("\r\n")
        if head_lines[0] != "WARC/1.0":
            raise ValueError(f"bad WARC version line: {head_lines[0]!r}")
        headers = {}
        for line in head_lines[1:]:
            k, _, v = line.partition(": ")
            headers[k] = v
        clen = int(headers["Content-Length"])
        block_start = head_end + 4
        yield headers, data[block_start : block_start + clen]
        pos = block_start + clen


def _http_payload(block: bytes) -> bytes:
    """Strip the HTTP response envelope from an application/http block."""
    sep = block.index(b"\r\n\r\n")
    return block[sep + 4 :]


def read_warc(warc_dir: str) -> "ray.data.Dataset":
    """Source: `*.warc.gz` shards → Dataset
    (url, warc_ts, html binary, digest_ok). Shards parallelize as files
    (read_binary_files); each record's payload digest is recomputed and
    compared to the stored WARC-Payload-Digest — `digest_ok` makes byte
    corruption visible in-band."""
    files = ray.data.read_binary_files(warc_dir, file_extensions=["gz"])

    def parse(batch: pa.Table) -> pa.Table:
        urls, tss, htmls, oks = [], [], [], []
        for blob in batch.column("bytes").to_pylist():
            # Ray's read_binary_files auto-decompresses by .gz extension;
            # keep the magic-byte check so raw .warc bytes also parse
            data = gzip.decompress(blob) if blob[:2] == b"\x1f\x8b" else blob
            for headers, block in _parse_warc_stream(data):
                if headers.get("WARC-Type") != "response":
                    continue
                payload = _http_payload(block)
                digest = hashlib.md5(payload).hexdigest()
                urls.append(headers["WARC-Target-URI"])
                tss.append(
                    datetime.strptime(headers["WARC-Date"], _WARC_DATE_FMT)
                )
                htmls.append(payload)
                oks.append(
                    headers.get("WARC-Payload-Digest") == f"md5:{digest}"
                )
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "html": pa.array(htmls, pa.binary()),
                "digest_ok": pa.array(oks, pa.bool_()),
            }
        )

    return files.map_batches(parse, batch_format="pyarrow")
