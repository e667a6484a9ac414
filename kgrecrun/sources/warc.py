"""WARC (ISO 28500) source/sink — the container a web-scale crawl
actually arrives in. A 100-TB corpus lands as WARC.gz shards (the
Common Crawl layout), not parquet; this module lets the engine ingest
those shards directly into the ``pages`` table the extraction kernel
consumes (url, warc_ts, html, lang), with no intermediate format.

Reader (:func:`read_warc`): a Ray Data ``FileBasedDatasource`` — file-
level parallelism comes from Ray's read planner (one read task per
shard / size-based splits across shards), and within a task the parser
is fully streaming: gzip members are inflated incrementally
(``zlib.decompressobj`` chained across members) and records are emitted
batch-by-batch, so per-task memory is bounded by one record + one
output batch regardless of shard size. ``response`` records are parsed
(WARC headers + embedded HTTP/1.1 status line and headers → url,
warc_ts at exact microsecond fidelity, http_status, content_type, lang
from Content-Language, html payload bytes); warcinfo / request /
metadata records are skipped. ``verify_digests=True`` recomputes each
record's WARC-Block-Digest (sha1, base32 per the spec) and raises on
corruption — at ingest scale a torn shard must fail loudly, not flow
silently into the KG.

Writer (:func:`write_warc_shards`): one gzip **member per record**
(the Common Crawl convention, so any record boundary is a valid split
point for downstream random access) and one shard per input block,
written inside a ``map_batches`` task that returns a manifest row —
the resumable-output pattern: shard names are content-derived
(md5 of the first record's url), so a retried task rewrites the same
bytes to the same name, idempotently.

WET sidecar (:func:`write_wet_shards` / :func:`read_wet`): the Common
Crawl extracted-text companion — ``conversion`` records carrying the
extraction stage's plain text, each WARC-Refers-To-linked to its source
response record. Completes the archive story: WARC shards in →
streaming parse → extraction → WET shards out, archive-to-archive.

100-TB notes: shards are independent (no cross-file state), the reader
never materializes a whole file, and ingest composes with the
extraction stage as ``read_warc(...) → extract_articles(...)`` — one
streaming pipeline from archive bytes to articles. Digest verification
is pure per-record CPU, no extra I/O.
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import struct  # noqa: F401  (kept with the codec family's imports)
import zlib
from datetime import datetime, timedelta, timezone
from typing import Iterator

import pyarrow as pa

WARC_PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("http_status", pa.int64()),
    ("content_type", pa.string()),
    ("lang", pa.string()),
    ("html", pa.large_binary()),
])

_EPOCH = datetime(1970, 1, 1, tzinfo=timezone.utc)
_US = timedelta(microseconds=1)


def _ts_to_warc_date(ts_us: int) -> str:
    """epoch-µs → WARC-Date with microsecond fraction; exact integer
    datetime arithmetic (float seconds lose sub-µs precision at
    2025-era epochs)."""
    return (_EPOCH + int(ts_us) * _US).strftime("%Y-%m-%dT%H:%M:%S.%fZ")


def _warc_date_to_ts(s: str) -> int:
    s = s.strip()
    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in s else "%Y-%m-%dT%H:%M:%SZ"
    dt = datetime.strptime(s, fmt).replace(tzinfo=timezone.utc)
    return (dt - _EPOCH) // _US


def _block_digest(block: bytes) -> str:
    return "sha1:" + base64.b32encode(
        hashlib.sha1(block).digest()).decode("ascii")


def _record_id(url: str, ts_us: int) -> str:
    h = hashlib.md5(f"{url}|{ts_us}".encode()).hexdigest()
    return (f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-"
            f"{h[20:32]}>")


def _warc_record(headers: list[tuple[str, str]], block: bytes) -> bytes:
    head = "".join(f"{k}: {v}\r\n" for k, v in headers)
    return (f"WARC/1.0\r\n{head}Content-Length: {len(block)}\r\n\r\n"
            .encode("ascii") + block + b"\r\n\r\n")


def _response_record(url: str, ts_us: int, html: bytes, lang: str,
                     status: int = 200,
                     content_type: str = "text/html; charset=utf-8") -> bytes:
    http = (f"HTTP/1.1 {status} {'OK' if status == 200 else 'X'}\r\n"
            f"Content-Type: {content_type}\r\n"
            + (f"Content-Language: {lang}\r\n" if lang else "")
            + f"Content-Length: {len(html)}\r\n\r\n").encode("ascii") + html
    return _warc_record(
        [("WARC-Type", "response"),
         ("WARC-Record-ID", _record_id(url, ts_us)),
         ("WARC-Date", _ts_to_warc_date(ts_us)),
         ("WARC-Target-URI", url),
         ("WARC-Block-Digest", _block_digest(http)),
         ("Content-Type", "application/http; msgtype=response")],
        http)


def _warcinfo_record(shard_name: str) -> bytes:
    body = (b"software: kgrecrun\r\n"
            b"format: WARC File Format 1.0\r\n")
    return _warc_record(
        [("WARC-Type", "warcinfo"),
         ("WARC-Record-ID", _record_id(shard_name, 0)),
         ("WARC-Date", _ts_to_warc_date(0)),
         ("WARC-Filename", shard_name),
         ("Content-Type", "application/warc-fields")],
        body)


def encode_warc(batch: pa.Table, *, shard_name: str = "shard",
                compress: bool = True, return_cdx: bool = False):
    """pages-schema batch → one WARC (or .warc.gz) shard's bytes:
    a warcinfo record followed by one response record per row, each
    record its own gzip member when ``compress``. With ``return_cdx``
    also returns [(url, ts_us, offset, length)] — per-record byte
    ranges in the shard (CDX rows), valid because each record is its
    own gzip member and therefore independently decompressible."""
    ts = batch["warc_ts"].cast(pa.int64()).to_pylist()  # exact µs
    urls = batch["url"].to_pylist()
    htmls = batch["html"].to_pylist()
    langs = (batch["lang"].to_pylist() if "lang" in batch.column_names
             else [""] * batch.num_rows)
    records = [_warcinfo_record(shard_name)]
    records += [_response_record(u, t, h, lg or "")
                for u, t, h, lg in zip(urls, ts, htmls, langs)]
    if compress:
        records = [gzip.compress(r, compresslevel=1) for r in records]
    payload = b"".join(records)
    if not return_cdx:
        return payload
    cdx = []
    off = len(records[0])
    for u, t, r in zip(urls, ts, records[1:]):
        cdx.append((u, t, off, len(r)))
        off += len(r)
    return payload, cdx


CDX_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts_us", pa.int64()),
    ("shard", pa.string()),
    ("offset", pa.int64()),
    ("length", pa.int64()),
])


def write_warc_shards(pages, out_dir: str, *, compress: bool = True,
                      cdx_dir: str | None = None):
    """pages Dataset → WARC shards under ``out_dir`` (one shard per
    input block, name derived from the first record's url so retries
    are idempotent). Returns the materialized manifest Dataset
    (shard path, n_records, n_bytes) — consuming it IS the write.
    With ``cdx_dir`` each task also writes its shard's CDX index
    (url → shard/offset/length, one parquet per shard, same idempotent
    naming) — the Common Crawl companion that makes single-record
    random access possible without scanning archives."""
    import os

    ext = "warc.gz" if compress else "warc"

    def write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        tag = hashlib.md5(batch["url"][0].as_py().encode()).hexdigest()[:12]
        name = f"shard-{tag}.{ext}"
        payload, cdx = encode_warc(batch, shard_name=name,
                                   compress=compress, return_cdx=True)
        os.makedirs(out_dir, exist_ok=True)
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(out_dir, name))  # atomic per shard
        if cdx_dir is not None:
            import pyarrow.parquet as pq

            os.makedirs(cdx_dir, exist_ok=True)
            cdx_tbl = pa.table({
                "url": pa.array([c[0] for c in cdx], pa.string()),
                "warc_ts_us": pa.array([c[1] for c in cdx], pa.int64()),
                "shard": pa.array([name] * len(cdx), pa.string()),
                "offset": pa.array([c[2] for c in cdx], pa.int64()),
                "length": pa.array([c[3] for c in cdx], pa.int64()),
            })
            ctmp = os.path.join(cdx_dir, f".cdx-{tag}.parquet.tmp")
            pq.write_table(cdx_tbl, ctmp)
            os.replace(ctmp, os.path.join(cdx_dir, f"cdx-{tag}.parquet"))
        return pa.table({"path": pa.array([name]),
                         "n_records": pa.array([batch.num_rows], pa.int64()),
                         "n_bytes": pa.array([len(payload)], pa.int64())})

    return pages.map_batches(write_shard, batch_format="pyarrow",
                             batch_size=None).materialize()


def cdx_fetch(cdx, shards_dir: str, *, verify_digests: bool = False):
    """CDX rows → the referenced records via RANGED reads: per batch,
    hits are grouped by shard and read offset-sorted (seek + read of
    exactly ``length`` bytes, one independent gzip member each) — no
    shard is ever scanned. This is the archive random-access path: a
    100-TB store answers point lookups proportional to the hit list,
    not the corpus. For large fetch sets, pre-sort/partition the cdx
    Dataset by (shard, offset) so each task touches few files."""
    import os

    def fetch(batch: pa.Table) -> pa.Table:
        by_shard: dict[str, list[int]] = {}
        shards = batch["shard"].to_pylist()
        offs = batch["offset"].to_pylist()
        lens = batch["length"].to_pylist()
        for i, s in enumerate(shards):
            by_shard.setdefault(s, []).append(i)
        tables = []
        for shard, idxs in by_shard.items():
            idxs.sort(key=lambda i: offs[i])
            with open(os.path.join(shards_dir, shard), "rb") as f:
                for i in idxs:
                    f.seek(offs[i])
                    raw = f.read(lens[i])
                    tables.extend(parse_warc(
                        iter([raw]), verify_digests=verify_digests))
        return (pa.concat_tables(tables) if tables
                else WARC_PAGES_SCHEMA.empty_table())

    return cdx.map_batches(fetch, batch_format="pyarrow")


# ---------------------------------------------------------------- parse

def _inflate_members(chunks: Iterator[bytes]) -> Iterator[bytes]:
    """Incrementally inflate a stream of concatenated gzip members
    (or pass plain bytes through when the stream isn't gzip)."""
    it = iter(chunks)
    buf = b""
    for c in it:
        buf += c
        if len(buf) >= 2:
            break
    if not buf:
        return
    if buf[:2] != b"\x1f\x8b":  # plain .warc
        yield buf
        for c in it:
            yield c
        return
    d = zlib.decompressobj(47)
    pending = buf
    while True:
        if pending:
            out = d.decompress(pending)
            if out:
                yield out
            if d.eof:  # next gzip member begins in unused_data
                pending = d.unused_data
                if pending:
                    d = zlib.decompressobj(47)
                    continue
            pending = b""
            continue
        nxt = next(it, None)
        if nxt is None:
            if not d.eof:  # stream ended inside a member
                raise ValueError("truncated gzip member in WARC stream")
            return
        pending = nxt


def _iter_warc_records(chunks: Iterator[bytes]) -> Iterator[dict]:
    """Decompressed-byte chunks → records as dicts of lower-cased WARC
    headers plus ``block`` bytes. Streaming: buffer holds at most one
    partial record."""
    buf = bytearray()
    for piece in _inflate_members(chunks):
        buf += piece
        while True:
            head_end = buf.find(b"\r\n\r\n")
            if head_end < 0:
                break
            head = bytes(buf[:head_end]).decode("utf-8", "replace")
            lines = head.split("\r\n")
            if not lines[0].startswith("WARC/"):
                raise ValueError(f"bad WARC record header: {lines[0]!r}")
            hdrs: dict[str, str] = {}
            for line in lines[1:]:
                k, _, v = line.partition(":")
                hdrs[k.strip().lower()] = v.strip()
            clen = int(hdrs["content-length"])
            total = head_end + 4 + clen + 4  # block + trailing CRLFCRLF
            if len(buf) < total:
                break
            block = bytes(buf[head_end + 4:head_end + 4 + clen])
            del buf[:total]
            hdrs["block"] = block
            yield hdrs
    if buf.strip(b"\r\n"):
        raise ValueError("trailing partial WARC record (truncated shard)")


def _dechunk(body: bytes) -> bytes:
    """Decode an HTTP/1.1 chunked-transfer body (size lines in hex,
    optional chunk extensions, terminating 0-chunk; trailers ignored)."""
    out = bytearray()
    i = 0
    while True:
        j = body.find(b"\r\n", i)
        if j < 0:
            raise ValueError("truncated chunked HTTP body in WARC record")
        size = int(body[i:j].split(b";")[0], 16)
        if size == 0:
            return bytes(out)
        start = j + 2
        if start + size > len(body):
            raise ValueError("truncated chunked HTTP body in WARC record")
        out += body[start:start + size]
        i = start + size + 2  # past the chunk's trailing CRLF


def _parse_http_response(block: bytes) -> tuple[int, str, str, bytes]:
    """HTTP/1.1 response bytes → (status, content_type, lang, body).
    Real crawls archive responses verbatim, so chunked transfer
    encoding (Common Crawl carries plenty) is decoded here — without
    it the chunk framing would flow into the html payload."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        raise ValueError("WARC response record missing HTTP header block")
    head = block[:sep].decode("utf-8", "replace")
    lines = head.split("\r\n")
    parts = lines[0].split(" ", 2)
    status = int(parts[1])
    ctype = lang = cenc = ""
    chunked = False
    for line in lines[1:]:
        k, _, v = line.partition(":")
        k = k.strip().lower()
        if k == "content-type":
            ctype = v.strip()
        elif k == "content-language":
            lang = v.strip()
        elif k == "transfer-encoding" and "chunked" in v.lower():
            chunked = True
        elif k == "content-encoding":
            cenc = v.strip().lower()
    body = block[sep + 4:]
    if chunked:  # transfer framing first, then content coding
        body = _dechunk(body)
    if cenc in ("gzip", "x-gzip"):
        body = gzip.decompress(body)
    elif cenc == "deflate":
        try:
            body = zlib.decompress(body)
        except zlib.error:  # raw-deflate servers omit the zlib header
            body = zlib.decompress(body, -zlib.MAX_WBITS)
    return status, ctype, lang, body


def parse_warc(chunks: Iterator[bytes], *, verify_digests: bool = False,
               batch_rows: int = 256) -> Iterator[pa.Table]:
    """Byte-chunk stream → WARC_PAGES_SCHEMA tables (response records
    only), ``batch_rows`` rows at a time."""
    cols: dict[str, list] = {k: [] for k in
                             ("url", "ts", "status", "ctype", "lang", "html")}

    def flush() -> pa.Table:
        t = pa.table({
            "url": pa.array(cols["url"], pa.string()),
            "warc_ts": pa.array(cols["ts"], pa.int64()).cast(
                pa.timestamp("us")),
            "http_status": pa.array(cols["status"], pa.int64()),
            "content_type": pa.array(cols["ctype"], pa.string()),
            "lang": pa.array(cols["lang"], pa.string()),
            "html": pa.array(cols["html"], pa.large_binary()),
        })
        for k in cols:
            cols[k].clear()
        return t

    for rec in _iter_warc_records(chunks):
        if rec.get("warc-type") != "response":
            continue
        if verify_digests:
            want = rec.get("warc-block-digest")
            if want and _block_digest(rec["block"]) != want:
                raise ValueError(
                    f"WARC block digest mismatch for "
                    f"{rec.get('warc-target-uri')!r} (corrupt shard)")
        status, ctype, lang, body = _parse_http_response(rec["block"])
        cols["url"].append(rec.get("warc-target-uri", ""))
        cols["ts"].append(_warc_date_to_ts(rec.get("warc-date", "")))
        cols["status"].append(status)
        cols["ctype"].append(ctype)
        cols["lang"].append(lang)
        cols["html"].append(body)
        if len(cols["url"]) >= batch_rows:
            yield flush()
    if cols["url"]:
        yield flush()


def read_warc(paths, *, verify_digests: bool = False, batch_rows: int = 256,
              **read_kwargs):
    """WARC shard path(s) → pages Dataset (WARC_PAGES_SCHEMA). File-
    level parallel via Ray's read planner; per-task streaming parse."""
    import ray.data
    from ray.data.datasource import FileBasedDatasource

    class WarcDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["warc", "warc.gz", "gz"]

        def _read_stream(self, f, path: str):
            def chunks(chunk=1 << 20):
                while True:
                    b = f.read(chunk)
                    if not b:
                        return
                    yield b if isinstance(b, bytes) else b.to_pybytes()

            yield from parse_warc(chunks(), verify_digests=verify_digests,
                                  batch_rows=batch_rows)

    return ray.data.read_datasource(WarcDatasource(paths), **read_kwargs)


# ------------------------------------------------------------------ WET

def _conversion_record(url: str, ts_us: int, text: str) -> bytes:
    """WET-style ``conversion`` record: the extracted plain text of one
    page (the Common Crawl WET sidecar layout)."""
    body = text.encode("utf-8")
    return _warc_record(
        [("WARC-Type", "conversion"),
         ("WARC-Record-ID", _record_id("wet:" + url, ts_us)),
         ("WARC-Date", _ts_to_warc_date(ts_us)),
         ("WARC-Target-URI", url),
         ("WARC-Refers-To", _record_id(url, ts_us)),
         ("WARC-Block-Digest", _block_digest(body)),
         ("Content-Type", "text/plain")],
        body)


def encode_wet(batch: pa.Table, *, shard_name: str = "shard",
               compress: bool = True,
               url_col: str = "url", text_col: str = "text",
               ts_col: str = "warc_ts") -> bytes:
    """articles-shaped batch → one WET shard's bytes (warcinfo +
    one conversion record per row, per-record gzip members)."""
    if ts_col in batch.column_names:
        ts = batch[ts_col].cast(pa.int64()).to_pylist()
    else:  # extraction output carries no timestamp; WET is still valid
        ts = [0] * batch.num_rows
    records = [_warcinfo_record(shard_name)]
    records += [_conversion_record(u, t, x or "")
                for u, t, x in zip(batch[url_col].to_pylist(), ts,
                                   batch[text_col].to_pylist())]
    if compress:
        return b"".join(gzip.compress(r, compresslevel=1) for r in records)
    return b"".join(records)


def write_wet_shards(articles, out_dir: str, *, compress: bool = True,
                     url_col: str = "url", text_col: str = "text",
                     ts_col: str = "warc_ts"):
    """articles Dataset → WET shards (same idempotent content-named
    layout as :func:`write_warc_shards`); returns the manifest."""
    import os

    ext = "warc.wet.gz" if compress else "warc.wet"

    def write_shard(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n_records": pa.array([], pa.int64()),
                             "n_bytes": pa.array([], pa.int64())})
        name = "shard-" + hashlib.md5(
            batch[url_col][0].as_py().encode()).hexdigest()[:12] + "." + ext
        payload = encode_wet(batch, shard_name=name, compress=compress,
                             url_col=url_col, text_col=text_col,
                             ts_col=ts_col)
        os.makedirs(out_dir, exist_ok=True)
        tmp = os.path.join(out_dir, "." + name + ".tmp")
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(out_dir, name))
        return pa.table({"path": pa.array([name]),
                         "n_records": pa.array([batch.num_rows], pa.int64()),
                         "n_bytes": pa.array([len(payload)], pa.int64())})

    return articles.map_batches(write_shard, batch_format="pyarrow",
                                batch_size=None).materialize()


WET_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("text", pa.large_string()),
])


def read_wet(paths, *, verify_digests: bool = False, batch_rows: int = 256,
             **read_kwargs):
    """WET shard path(s) → (url, warc_ts, text) Dataset."""
    import ray.data
    from ray.data.datasource import FileBasedDatasource

    class WetDatasource(FileBasedDatasource):
        _FILE_EXTENSIONS = ["wet", "wet.gz", "warc", "warc.gz", "gz"]

        def _read_stream(self, f, path: str):
            def chunks(chunk=1 << 20):
                while True:
                    b = f.read(chunk)
                    if not b:
                        return
                    yield b if isinstance(b, bytes) else b.to_pybytes()

            cols: dict[str, list] = {"url": [], "ts": [], "text": []}

            def flush() -> pa.Table:
                t = pa.table({
                    "url": pa.array(cols["url"], pa.string()),
                    "warc_ts": pa.array(cols["ts"], pa.int64()).cast(
                        pa.timestamp("us")),
                    "text": pa.array(cols["text"], pa.large_string()),
                })
                for k in cols:
                    cols[k].clear()
                return t

            for rec in _iter_warc_records(chunks()):
                if rec.get("warc-type") != "conversion":
                    continue
                if verify_digests:
                    want = rec.get("warc-block-digest")
                    if want and _block_digest(rec["block"]) != want:
                        raise ValueError(
                            f"WET block digest mismatch for "
                            f"{rec.get('warc-target-uri')!r}")
                cols["url"].append(rec.get("warc-target-uri", ""))
                cols["ts"].append(_warc_date_to_ts(rec.get("warc-date", "")))
                cols["text"].append(rec["block"].decode("utf-8"))
                if len(cols["url"]) >= batch_rows:
                    yield flush()
            if cols["url"]:
                yield flush()

    return ray.data.read_datasource(WetDatasource(paths), **read_kwargs)
