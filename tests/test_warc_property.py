"""Property tests (hypothesis) for the WARC container and URL
canonicalizer — fuzzing catches what fixed vectors miss: payloads that
contain record-framing byte sequences, urls with pathological query
strings, timestamps at field boundaries."""

import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from kgrecrun.corpus.synthgen import PAGES_SCHEMA
from kgrecrun.ops.urlnorm import canonicalize_url
from kgrecrun.sources.warc import WARC_PAGES_SCHEMA, encode_warc, parse_warc

# payloads deliberately include CRLF runs, WARC/HTTP header look-alikes
# and gzip magic so framing must rely on lengths, never sniffing
_payload = st.binary(min_size=0, max_size=400) | st.sampled_from([
    b"\r\n\r\nWARC/1.0\r\nContent-Length: 0\r\n\r\n",
    b"HTTP/1.1 200 OK\r\n\r\nfake",
    b"\x1f\x8b\x08\x00not really gzip",
    b"\r\n" * 40,
])

_ts = st.integers(min_value=0, max_value=4102444800_000000)  # ≤ 2100

_row = st.tuples(
    st.integers(min_value=0, max_value=10**6),  # url suffix
    _ts,
    _payload,
    st.sampled_from(["en", "de", "fr", ""]),
)


@settings(max_examples=40, deadline=None)
@given(st.lists(_row, min_size=1, max_size=8, unique_by=lambda r: r[0]),
       st.booleans(), st.integers(min_value=3, max_value=64))
def test_warc_roundtrip_property(rows, compress, chunk):
    t = pa.Table.from_pylist(
        [dict(url=f"https://fuzz.example/p{u}", warc_ts=ts, html=h,
              text="", lang=lg) for u, ts, h, lg in rows],
        schema=PAGES_SCHEMA)
    payload = encode_warc(t, compress=compress)
    chunks = (payload[i:i + chunk] for i in range(0, len(payload), chunk))
    tables = list(parse_warc(chunks, verify_digests=True, batch_rows=3))
    got = (pa.concat_tables(tables) if tables
           else WARC_PAGES_SCHEMA.empty_table())
    assert got["url"].to_pylist() == t["url"].to_pylist()
    assert (got["warc_ts"].cast(pa.int64()).to_pylist()
            == t["warc_ts"].cast(pa.int64()).to_pylist())
    assert got["html"].to_pylist() == t["html"].to_pylist()
    assert got["lang"].to_pylist() == t["lang"].to_pylist()


_urlish = st.text(
    alphabet=st.characters(min_codepoint=33, max_codepoint=126),
    min_size=0, max_size=60)


@settings(max_examples=200, deadline=None)
@given(_urlish)
def test_canonicalize_idempotent_and_total(s):
    """canonicalize never raises on printable-ASCII input and is
    idempotent — the two contracts the crawl frontier relies on."""
    once = canonicalize_url(s)
    assert canonicalize_url(once) == once


@settings(max_examples=100, deadline=None)
@given(st.lists(st.sampled_from(
    ["a=1", "b=2", "utm_source=x", "fbclid=Y", "z", "a=2"]),
    min_size=0, max_size=6))
def test_canonicalize_query_order_invariance(params):
    """Any permutation of the same query params canonicalizes to the
    same url — the dedup-key property."""
    import itertools

    base = "https://q.example/p?"
    forms = {canonicalize_url(base + "&".join(p))
             for p in itertools.permutations(params)}
    assert len(forms) == 1
