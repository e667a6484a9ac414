"""WARC container source/sink tests (kgrecrun/sources/warc.py).

The round-trip is exact by construction: pages → WARC shards →
read_warc must reproduce url / warc_ts (microsecond fidelity) / html
bytes / lang, with records parsed from per-member gzip streams in a
fully streaming fashion (the 7-byte-chunk cases force every partial-
record code path).
"""

import gzip

import numpy as np
import pyarrow as pa
import pytest

from kgrecrun.corpus.synthgen import PAGES_SCHEMA
from kgrecrun.sources.warc import (WARC_PAGES_SCHEMA, encode_warc,
                                   parse_warc, read_warc,
                                   write_warc_shards)


def _pages(n=9, ts0=1735689600_000000):
    rows = [dict(url=f"https://ex.org/a{i}",
                 warc_ts=ts0 + i * 1_000_000 + 7 * i + (i % 3),
                 html=(f"<html><body><p>doc {i} body — ünïcode"
                       f"</p></body></html>").encode(),
                 text=f"doc {i}", lang=["en", "de", ""][i % 3])
            for i in range(n)]
    return pa.Table.from_pylist(rows, schema=PAGES_SCHEMA)


def _parse_all(payload, chunk=None, **kw):
    if chunk:
        chunks = (payload[i:i + chunk] for i in range(0, len(payload), chunk))
    else:
        chunks = iter([payload])
    tables = list(parse_warc(chunks, **kw))
    return (pa.concat_tables(tables) if tables
            else WARC_PAGES_SCHEMA.empty_table())


@pytest.mark.parametrize("compress", [True, False])
@pytest.mark.parametrize("chunk", [None, 7])
def test_roundtrip_exact(compress, chunk):
    t = _pages()
    got = _parse_all(encode_warc(t, compress=compress), chunk=chunk,
                     verify_digests=True, batch_rows=4)
    assert got.schema.equals(WARC_PAGES_SCHEMA)
    assert got["url"].to_pylist() == t["url"].to_pylist()
    # microsecond-exact timestamps (integer datetime arithmetic, no
    # float seconds anywhere)
    assert (got["warc_ts"].cast(pa.int64()).to_pylist()
            == t["warc_ts"].cast(pa.int64()).to_pylist())
    assert got["html"].to_pylist() == t["html"].to_pylist()
    assert got["lang"].to_pylist() == t["lang"].to_pylist()
    assert got["http_status"].to_pylist() == [200] * t.num_rows
    assert set(got["content_type"].to_pylist()) == {
        "text/html; charset=utf-8"}


def test_gzip_members_are_per_record():
    """Common-Crawl layout: every record its own gzip member, so any
    member boundary is a valid split point."""
    t = _pages(5)
    payload = encode_warc(t, compress=True)
    members = 0
    pos = 0
    while pos < len(payload):
        assert payload[pos:pos + 2] == b"\x1f\x8b"
        import zlib

        d = zlib.decompressobj(47)
        d.decompress(payload[pos:])
        members += 1
        consumed = len(payload) - pos - len(d.unused_data)
        pos += consumed
    assert members == 6  # warcinfo + 5 responses


def test_non_response_records_skipped():
    t = _pages(3)
    got = _parse_all(encode_warc(t, compress=False))
    assert got.num_rows == 3  # warcinfo dropped silently


def test_digest_verification_catches_corruption():
    payload = bytearray(encode_warc(_pages(), compress=False))
    idx = payload.find(b"doc 3 body")
    payload[idx] ^= 1
    # without verification the flipped byte flows through...
    got = _parse_all(bytes(payload))
    assert got.num_rows == 9
    # ...with verification it raises loudly
    with pytest.raises(ValueError, match="digest mismatch"):
        _parse_all(bytes(payload), verify_digests=True)


def test_truncated_shard_raises():
    payload = encode_warc(_pages(), compress=True)
    with pytest.raises(ValueError):
        _parse_all(payload[: int(len(payload) * 0.6)])
    plain = encode_warc(_pages(), compress=False)
    with pytest.raises(ValueError):
        _parse_all(plain[: int(len(plain) * 0.6)])


def test_foreign_warc_parses():
    """A record not written by this module (absolute minimum headers,
    second-precision WARC-Date, one gzip stream for the whole file)
    still parses — the reader accepts the format, not just our dialect."""
    body = b"HTTP/1.1 404 Not Found\r\nContent-Type: text/plain\r\n\r\ngone"
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Date: 2024-06-01T12:00:00Z\r\n"
           b"WARC-Target-URI: https://other.example/x\r\n"
           b"Content-Type: application/http; msgtype=response\r\n"
           + f"Content-Length: {len(body)}\r\n\r\n".encode()
           + body + b"\r\n\r\n")
    got = _parse_all(gzip.compress(rec * 2))  # one member, two records
    assert got.num_rows == 2
    assert got["http_status"].to_pylist() == [404, 404]
    assert got["html"].to_pylist() == [b"gone", b"gone"]
    assert got["lang"].to_pylist() == ["", ""]
    ts = got["warc_ts"].cast(pa.int64()).to_pylist()[0]
    assert ts == 1717243200_000000


def test_ray_shard_roundtrip(ray_session, tmp_path):
    """End-to-end through Ray: Dataset → shards on disk → read_warc
    Dataset; set-equality on every carried column."""
    import ray.data

    t = _pages(60)
    out = str(tmp_path / "warc")
    pages = ray.data.from_arrow(t).repartition(4)
    manifest = write_warc_shards(pages, out)
    m = manifest.to_pandas()
    assert m["n_records"].sum() == 60
    assert len(m) == 4  # one shard per block

    back = read_warc(out, verify_digests=True)
    got = back.to_pandas().sort_values("url").reset_index(drop=True)
    want = t.to_pandas().sort_values("url").reset_index(drop=True)
    assert list(got["url"]) == list(want["url"])
    assert list(got["html"]) == list(want["html"])
    assert list(got["lang"]) == list(want["lang"])
    assert (got["warc_ts"].astype("int64").tolist()
            == want["warc_ts"].astype("int64").tolist())
    assert (got["http_status"] == 200).all()


def test_warc_feeds_extraction(ray_session, tmp_path):
    """The ingest composes with the flagship stage: WARC bytes →
    extract_articles equals extraction straight off the generator."""
    import ray.data

    from kgrecrun.corpus.synthgen import pages_dataset
    from kgrecrun.extract.stage import extract_articles

    pages = pages_dataset(80, seed=42)
    out = str(tmp_path / "warc")
    write_warc_shards(pages, out)

    def proj(b: pa.Table) -> pa.Table:
        return b.select(["url", "title", "text_length", "score"])

    via_warc = (extract_articles(read_warc(out), emit_html=False)
                .map_batches(proj, batch_format="pyarrow").to_pandas()
                .sort_values("url").reset_index(drop=True))
    direct = (extract_articles(pages_dataset(80, seed=42), emit_html=False)
              .map_batches(proj, batch_format="pyarrow").to_pandas()
              .sort_values("url").reset_index(drop=True))
    assert via_warc.equals(direct)
    assert (via_warc["text_length"] > 0).any()


# ------------------------------------------------------------------ WET

def test_wet_roundtrip_exact():
    """articles → WET shard bytes → read back: url / warc_ts / text
    survive exactly (conversion records, per-member gzip)."""
    from kgrecrun.sources.warc import _iter_warc_records, encode_wet

    t = pa.table({
        "url": pa.array([f"https://ex.org/a{i}" for i in range(5)]),
        "warc_ts": pa.array([1735689600_000000 + i * 11 for i in range(5)],
                            pa.int64()).cast(pa.timestamp("us")),
        "text": pa.array([f"extracted text {i} — ünïcode\nline two"
                          for i in range(5)], pa.large_string()),
    })
    payload = encode_wet(t)
    recs = [r for r in _iter_warc_records(iter([payload]))
            if r.get("warc-type") == "conversion"]
    assert len(recs) == 5
    assert [r["warc-target-uri"] for r in recs] == t["url"].to_pylist()
    assert ([r["block"].decode() for r in recs]
            == t["text"].to_pylist())
    # every conversion record refers back to its response record
    assert all(r.get("warc-refers-to") for r in recs)


def test_archive_in_archive_out(ray_session, tmp_path):
    """The complete archive story: WARC shards in → streaming parse →
    extraction → WET shards out → read_wet returns exactly the
    extracted text (url-aligned, digest-verified both ways)."""
    import ray.data

    from kgrecrun.corpus.synthgen import pages_dataset
    from kgrecrun.extract.stage import extract_articles
    from kgrecrun.sources.warc import (read_warc, read_wet,
                                       write_warc_shards, write_wet_shards)

    pages = pages_dataset(60, seed=42)
    warc_dir = str(tmp_path / "warc")
    write_warc_shards(pages, warc_dir)

    arts = extract_articles(read_warc(warc_dir, verify_digests=True),
                            emit_html=False)
    arts_tbl = pa.concat_tables(
        list(arts.map_batches(
            lambda b: b.select(["url", "text"]),
            batch_format="pyarrow").iter_batches(batch_format="pyarrow")))

    wet_dir = str(tmp_path / "wet")
    manifest = write_wet_shards(
        ray.data.from_arrow(arts_tbl).repartition(3), wet_dir)
    assert int(manifest.to_pandas()["n_records"].sum()) == 60

    back = (read_wet(wet_dir, verify_digests=True).to_pandas()
            .sort_values("url").reset_index(drop=True))
    want = (arts_tbl.to_pandas().sort_values("url")
            .reset_index(drop=True))
    assert list(back["url"]) == list(want["url"])
    assert list(back["text"]) == list(want["text"])
    assert (back["text"].str.len() > 0).any()


# ------------------------------------------------------------------ CDX

def test_cdx_ranged_fetch(ray_session, tmp_path):
    """CDX random access through Ray: write shards + index, fetch a url
    subset by byte range only — records come back exact, digests
    verified, and no record outside the probe set is returned."""
    import ray.data

    from kgrecrun.sources.warc import cdx_fetch, write_warc_shards

    t = _pages(40)
    shards = str(tmp_path / "warc")
    cdx_dir = str(tmp_path / "cdx")
    write_warc_shards(ray.data.from_arrow(t).repartition(5), shards,
                      cdx_dir=cdx_dir)
    cdx = ray.data.read_parquet(cdx_dir)
    assert cdx.count() == 40

    want_urls = {f"https://ex.org/a{i}" for i in range(0, 40, 7)}
    hits = cdx.map_batches(
        lambda b: b.filter(
            pa.compute.is_in(b["url"],
                             value_set=pa.array(sorted(want_urls)))),
        batch_format="pyarrow")
    got = (cdx_fetch(hits, shards, verify_digests=True).to_pandas()
           .sort_values("url").reset_index(drop=True))
    assert set(got["url"]) == want_urls
    want = (t.to_pandas().set_index("url").loc[got["url"]])
    assert list(got["html"]) == list(want["html"])
    assert (got["warc_ts"].astype("int64").tolist()
            == want["warc_ts"].astype("int64").tolist())


def test_chunked_transfer_encoding_decoded():
    """Real crawls archive HTTP responses verbatim — a chunked body
    must come back de-framed, with chunk extensions and trailers
    ignored."""
    body = (b"7;ext=1\r\n<html><\r\n"
            b"10\r\nbody>chunked ok<\r\n"
            b"D\r\n/body></html>\r\n"
            b"0\r\nX-Trailer: t\r\n\r\n")
    rec = (b"WARC/1.0\r\n"
           b"WARC-Type: response\r\n"
           b"WARC-Date: 2024-06-01T12:00:00Z\r\n"
           b"WARC-Target-URI: https://chunky.example/x\r\n"
           b"Content-Type: application/http; msgtype=response\r\n")
    http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
            b"Transfer-Encoding: chunked\r\n\r\n" + body)
    rec += f"Content-Length: {len(http)}\r\n\r\n".encode() + http + b"\r\n\r\n"
    got = _parse_all(rec)
    assert got.num_rows == 1
    assert got["html"][0].as_py() == b"<html><body>chunked ok</body></html>"
    # truncated chunked body raises loudly
    bad = rec.replace(b"0\r\nX-Trailer: t\r\n\r\n", b"")
    bad = bad.replace(f"Content-Length: {len(http)}".encode(),
                      f"Content-Length: {len(http) - 22}".encode())
    with pytest.raises(ValueError, match="chunked"):
        _parse_all(bad)


def test_content_encoding_gzip_and_deflate_decoded():
    """Archived responses may carry Content-Encoding — the payload must
    come back as the decoded html, chunked framing stripped first."""
    import zlib

    html = b"<html><body>encoded payload</body></html>"
    raw = zlib.compressobj(9, zlib.DEFLATED, -zlib.MAX_WBITS)
    raw_deflate = raw.compress(html) + raw.flush()
    for enc_name, enc in (("gzip", gzip.compress(html)),
                          ("deflate", zlib.compress(html)),
                          ("deflate", raw_deflate)):
        # third case: raw deflate stream without the zlib header
        chunked = (f"{len(enc):x}\r\n".encode() + enc + b"\r\n0\r\n\r\n")
        http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                + f"Content-Encoding: {enc_name}\r\n".encode()
                + b"Transfer-Encoding: chunked\r\n\r\n" + chunked)
        rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
               b"WARC-Date: 2024-06-01T12:00:00Z\r\n"
               b"WARC-Target-URI: https://enc.example/x\r\n"
               b"Content-Type: application/http; msgtype=response\r\n"
               + f"Content-Length: {len(http)}\r\n\r\n".encode()
               + http + b"\r\n\r\n")
        got = _parse_all(rec)
        assert got["html"][0].as_py() == html
