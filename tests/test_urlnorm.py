"""URL canonicalization tests (kgrecrun/ops/urlnorm.py) — rule-by-rule
vectors, idempotence, and never-lose-a-frontier-entry passthrough."""

import pytest

from kgrecrun.ops.urlnorm import canonicalize_url

VECTORS = [
    # scheme/host lowercase
    ("HTTPS://Docs.Example/Path", "https://docs.example/Path"),
    # default ports stripped, per scheme
    ("http://a.example:80/x", "http://a.example/x"),
    ("https://a.example:443/x", "https://a.example/x"),
    ("https://a.example:80/x", "https://a.example:80/x"),  # NOT default
    ("http://a.example:8080/x", "http://a.example:8080/x"),
    # fragment dropped
    ("https://a.example/x#sec-2", "https://a.example/x"),
    # tracking params dropped (whole k=v token matched)
    ("https://a.example/x?utm_source=f&q=1", "https://a.example/x?q=1"),
    ("https://a.example/x?fbclid=Y", "https://a.example/x"),
    ("https://a.example/x?ref=tw&gclid=1&a=2", "https://a.example/x?a=2"),
    # a non-tracking param that merely CONTAINS a tracker name survives
    ("https://a.example/x?xutm_source=1", "https://a.example/x?xutm_source=1"),
    ("https://a.example/x?refx=1", "https://a.example/x?refx=1"),
    # params sorted lexicographically by k=v
    ("https://a.example/x?b=2&a=10&a=1", "https://a.example/x?a=1&a=10&b=2"),
    # empty query / empty path normalized
    ("https://a.example/x?", "https://a.example/x"),
    ("https://a.example?a=1", "https://a.example/?a=1"),
    ("https://a.example", "https://a.example/"),
    # query kept when only some params are trackers
    ("https://a.example/x?utm_campaign=c&z=9&utm_medium=m",
     "https://a.example/x?z=9"),
    # --- percent-encoding normalization (RFC 3986 6.2.2.2) ---
    # unreserved escapes decode: alpha, digit, tilde, dot, dash, under
    ("https://a.example/%41%62%30%7E%2D%5F", "https://a.example/Ab0~-_"),
    # reserved escapes stay escaped, hex uppercased
    ("https://a.example/p%2fq?x=%3a%2F", "https://a.example/p%2Fq?x=%3A%2F"),
    # malformed escapes pass through untouched
    ("https://a.example/%zz%4", "https://a.example/%zz%4"),
    # decoding applies inside query tokens before sorting
    ("https://a.example/x?%62=1&a=2", "https://a.example/x?a=2&b=1"),
    # --- dot-segment resolution (RFC 3986 5.2.4) ---
    ("https://a.example/a/./b/../c", "https://a.example/a/c"),
    ("https://a.example/a/b/c/./../../g", "https://a.example/a/g"),
    # leading .. drops (can't climb above root)
    ("https://a.example/../a", "https://a.example/a"),
    ("https://a.example/../../x/y", "https://a.example/x/y"),
    # trailing . / .. leave the directory slash
    ("https://a.example/a/b/.", "https://a.example/a/b/"),
    ("https://a.example/a/b/..", "https://a.example/a/"),
    ("https://a.example/a/..", "https://a.example/"),
    # a segment that merely contains dots is NOT a dot segment
    ("https://a.example/a.b/c./.d/..e", "https://a.example/a.b/c./.d/..e"),
    # decoded %2E takes part in the SAME pass (order: pct then dots)
    ("https://a.example/a/%2E%2E/b", "https://a.example/b"),
    ("https://a.example/a/%2E/b", "https://a.example/a/b"),
    # combined: everything at once
    ("HTTP://A.Example:80/x/./y/../%7Eu?utm_source=s&b=%41&a=1#f",
     "http://a.example/x/~u?a=1&b=A"),
]


@pytest.mark.parametrize("dirty,clean", VECTORS)
def test_vectors(dirty, clean):
    assert canonicalize_url(dirty) == clean


@pytest.mark.parametrize("dirty,clean", VECTORS)
def test_idempotent(dirty, clean):
    assert canonicalize_url(clean) == clean


def test_unparseable_passthrough():
    for u in ("not a url", "", "mailto:x@y.example", "/relative/only",
              "ftp//missing-colon"):
        assert canonicalize_url(u) == u


def test_canonical_collapses_variants():
    """The dedup property: all dirty spellings of one resource map to
    one key."""
    variants = [
        "https://a.example/page?id=7&utm_source=mail",
        "HTTPS://A.Example:443/page?id=7#top",
        "https://a.example/page?utm_medium=x&id=7",
    ]
    keys = {canonicalize_url(v) for v in variants}
    assert keys == {"https://a.example/page?id=7"}


def test_remove_dot_segments_matches_rfc_algorithm():
    """_remove_dot_segments equals the LITERAL RFC 3986 §5.2.4 buffer
    algorithm on 20k random dot/empty-segment paths. (Python's
    urllib.parse.urljoin is NOT a valid reference here — it drops
    empty segments adjacent to '..', deviating from the RFC on paths
    like '/..//a'; the buffer implementation below is the spec.)"""
    import random

    from kgrecrun.ops.urlnorm import _remove_dot_segments

    def rfc(path: str) -> str:
        inp, out = path, ""
        while inp:
            if inp.startswith("../"):
                inp = inp[3:]
            elif inp.startswith("./"):
                inp = inp[2:]
            elif inp.startswith("/./"):
                inp = "/" + inp[3:]
            elif inp == "/.":
                inp = "/"
            elif inp.startswith("/../"):
                inp = "/" + inp[4:]
                out = out[:out.rfind("/")] if "/" in out else ""
            elif inp == "/..":
                inp = "/"
                out = out[:out.rfind("/")] if "/" in out else ""
            elif inp in (".", ".."):
                inp = ""
            else:
                i = inp.find("/", 1)
                seg, inp = (inp, "") if i < 0 else (inp[:i], inp[i:])
                out += seg
        return out

    rng = random.Random(99)
    pool = ["a", "b", "c2", ".", "..", "x.y", ".d", "..e", ""]
    for _ in range(20000):
        path = "/" + "/".join(
            rng.choice(pool) for _ in range(rng.randint(0, 8)))
        want = rfc(path)
        got = _remove_dot_segments(path)
        assert got == want, (path, want, got)
        assert _remove_dot_segments(got) == got, ("idempotence", path)


def test_pct_norm_idempotent_on_malformed_cascades():
    """Decoding can synthesize a new escape out of an adjacent literal
    '%' ('%%341' -> '%41' -> 'A'); _norm_pct runs to a fixpoint so
    canonicalize_url is idempotent even on malformed input (round-5
    review finding)."""
    cases = [
        "https://a.example/%%341",          # cascades two levels
        "https://a.example/%%2541",         # '%' + '%25' + '41'
        "https://a.example/p?q=%%7E%7E",
        "https://a.example/%%%341",
    ]
    for u in cases:
        once = canonicalize_url(u)
        assert canonicalize_url(once) == once, (u, once)
    assert canonicalize_url("https://a.example/%%341") == \
        "https://a.example/A"
