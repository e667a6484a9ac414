"""Sanitizer (iframe.js:91-206 semantics) + crawl-frontier anti-join."""

import pyarrow as pa
import pytest

from kgrecrun.sanitize.stage import resolve_url, sanitize_html

BASE = "http://a/b/c/d;p?q"


# vectors follow the reference CODE's behavior (iframe.js:153-178) —
# note it does NOT collapse ./ or ../ segments, unlike full RFC 3986
@pytest.mark.parametrize(
    "val,expected",
    [
        ("g:h", "g:h"),
        ("g", "http://a/b/c/g"),
        ("./g", "http://a/b/c/./g"),
        ("g/", "http://a/b/c/g/"),
        ("/g", "http://a/g"),
        ("//g", "http://g"),
        ("?y", "http://a/b/c/d;p?y"),
        ("g?y", "http://a/b/c/g?y"),
        ("#s", "http://a/b/c/d;p?q#s"),
        ("g#s", "http://a/b/c/g#s"),
        ("http://x/y", "http://x/y"),
    ],
)
def test_resolve_url(val, expected):
    assert resolve_url(val, BASE) == expected


def test_sanitize_unwraps_disallowed_and_filters_attrs():
    html = (
        "<html><body><nav><p>kept from nav</p></nav>"
        '<div class="x" onclick="evil()"><p style="color:red" id="p1">text</p></div>'
        "<script>alert(1)</script></body></html>"
    )
    out = sanitize_html(html)
    # nav unwrapped (child <p> kept), div kept but class/onclick dropped,
    # p kept with style/id dropped; script has no allowed descendants but
    # its TEXT unwraps through (the reference sanitizer keeps text nodes
    # of disallowed elements — it operates post-extraction)
    assert "<nav" not in out and "<p>kept from nav</p>" in out
    assert "<div><p>text</p></div>" in out
    assert "onclick" not in out and "class" not in out and "style" not in out


def test_sanitize_a_img_video_rules():
    html = (
        '<html><body><a href="/x">link</a>'
        '<video src="v.mp4"></video>'
        '<p><img src="i.png" alt="pic" width="5"></p>'
        '<a href="/y"><img src="j.png"></a>'
        "<figure><img src='k.png'></figure></body></html>"
    )
    out = sanitize_html(html, "https://site.example/dir/page.html")
    assert '<a href="https://site.example/x" target="_blank">' in out
    assert '<video src="https://site.example/dir/v.mp4" controls="">' in out
    # bare img → wrapped in figure, width dropped, src resolved
    assert '<figure><img src="https://site.example/dir/i.png" alt="pic"/></figure>' in out
    # img inside <a> or <figure> NOT double-wrapped
    assert out.count("<figure>") == 2


def test_sanitize_media_off():
    html = "<html><body><p>t</p><img src='x.png'><video src='v'></video></body></html>"
    out = sanitize_html(html, media=False)
    assert "<img" not in out and "<video" not in out and "<p>t</p>" in out


def test_sanitize_escapes_output():
    html = "<html><body><p>a &lt; b &amp; c</p></body></html>"
    out = sanitize_html(html)
    # parser decoded entities; serializer re-escapes
    assert "<p>a &lt; b &amp; c</p>" in out


@pytest.mark.usefixtures("ray_session")
def test_sanitize_stage_and_crawl_frontier():
    import ray.data

    from kgrecrun.extract.crawl import crawl_frontier
    from kgrecrun.sanitize.stage import sanitize_articles

    articles = ray.data.from_arrow(
        pa.table(
            {
                "url": ["u1", "u2", "u3"],
                "html": ['<div><p>a</p><nav><b>x</b></nav></div>', "<p>b</p>", ""],
                "next_page": ["u2", "n1", None],
            }
        )
    )
    out = sanitize_articles(articles).to_pandas().set_index("url")
    assert out.loc["u1", "clean_html"] == "<div><p>a</p><b>x</b></div>"

    seen = ray.data.from_arrow(pa.table({"url": ["u1", "u2", "u3"]}))
    frontier = sorted(crawl_frontier(articles, seen).to_pandas()["url"])
    assert frontier == ["n1"]  # u2 already seen, null/empty dropped


@pytest.mark.usefixtures("ray_session")
def test_remote_extract_stage_with_fake_transport():
    import json

    import ray.data

    from kgrecrun.extract.remote import remote_extract

    def fake_transport(url, html, token):
        if url.endswith("boom"):
            raise TimeoutError("simulated 40s timeout")
        return json.dumps(
            {"objects": [
                {"type": "image", "url": url},
                {"type": "article", "title": f"T:{url}", "text": "p1\np2"},
            ]}
        )

    pages = ray.data.from_arrow(
        pa.table({"url": ["https://a/1", "https://a/boom"], "html": [b"<p>x</p>", b""]})
    )
    out = remote_extract(pages, transport=fake_transport).to_pandas().set_index("url")
    assert out.loc["https://a/1", "title"] == "T:https://a/1"
    assert out.loc["https://a/1", "html"] == "<p>p1</p><p>p2</p>"
    assert out.loc["https://a/1", "error"] is None
    assert "TimeoutError" in out.loc["https://a/boom", "error"]


def test_remote_extract_default_transport_is_stubbed():
    from kgrecrun.extract.remote import RemoteExtract

    out = RemoteExtract()(pa.table({"url": ["u"], "html": [b""]}))
    assert "NotImplementedError" in out["error"][0].as_py()


@pytest.mark.usefixtures("ray_session")
def test_remote_extract_pool_scale_errors_and_cache():
    """Actor-pool run at concurrency 8 with injected timeouts and
    rate-limit rejections (the §2.3 remote-client failure modes):
    every row keeps its verdict in the error column — no failure
    poisons a batch or the run — and the per-actor response cache
    bounds transport traffic at one call per (url, actor) for
    successful urls, observed through a global counter actor."""
    import json

    import ray
    import ray.data

    from kgrecrun.extract.remote import remote_extract

    @ray.remote
    class CallCounter:
        def __init__(self):
            self.calls: dict[str, int] = {}

        def hit(self, url: str) -> None:
            self.calls[url] = self.calls.get(url, 0) + 1

        def snapshot(self) -> dict:
            return dict(self.calls)

    counter = CallCounter.remote()

    class FlakyTransport:
        """Deterministic per-url behavior; counts every wire call."""

        def __init__(self, counter_handle):
            self.counter = counter_handle

        def __call__(self, url: str, html: bytes, token: str) -> str:
            ray.get(self.counter.hit.remote(url))
            if "timeout" in url:
                raise TimeoutError("simulated 40s timeout")
            if "limited" in url:
                raise RuntimeError("429 Too Many Requests (rate limit)")
            if "noart" in url:
                return json.dumps({"objects": [{"type": "image"}]})
            return json.dumps({"objects": [
                {"type": "article", "title": f"T:{url}", "text": "p"},
            ]})

    N_POOL, REPS = 8, 64
    good = [f"https://ok.example/{i}" for i in range(5)]
    urls, htmls = [], []
    for r in range(REPS):
        for u in good:
            urls.append(u)
            htmls.append(b"<p>x</p>")
        urls += [f"https://bad.example/timeout/{r}",
                 f"https://bad.example/limited/{r}",
                 f"https://bad.example/noart/{r}"]
        htmls += [b"", b"", b""]
    pages = ray.data.from_arrow(
        pa.table({"url": pa.array(urls), "html": pa.array(htmls)})
    ).repartition(16)

    out = remote_extract(
        pages, transport=FlakyTransport(counter),
        concurrency=N_POOL, batch_size=8, num_cpus=0.25,
    ).to_pandas()

    assert len(out) == len(urls)                       # no row lost
    ok = out[out.url.str.startswith("https://ok.")]
    assert (ok.error.isna()).all()
    assert (ok.title == "T:" + ok.url).all()
    assert (ok.html == "<p>p</p>").all()
    t = out[out.url.str.contains("/timeout/")]
    assert len(t) == REPS and t.error.str.contains("TimeoutError").all()
    rl = out[out.url.str.contains("/limited/")]
    assert len(rl) == REPS and rl.error.str.contains("429").all()
    na = out[out.url.str.contains("/noart/")]
    assert len(na) == REPS and na.error.str.contains(
        "no article object").all()

    calls = ray.get(counter.snapshot.remote())
    for u in good:
        # cached: at most one wire call per actor, never one per row
        assert 1 <= calls[u] <= N_POOL < REPS, (u, calls[u])


@pytest.mark.usefixtures("ray_session")
def test_multipage_crawl_stitches_continuations():
    from kgrecrun.corpus.synthgen import continuation_pages_dataset, pages_dataset
    from kgrecrun.extract.crawl import crawl_multipage

    stitched = crawl_multipage(
        pages_dataset(120, seed=42), continuation_pages_dataset(120, seed=42)
    ).to_pandas()
    assert len(stitched) == 120  # every base article present exactly once
    multi = stitched[stitched.n_pages > 1]
    assert len(multi) > 0
    # stitched text strictly longer than page 1 alone and ends with page-2 content
    from kgrecrun.corpus.synthgen import gen_continuation_row

    row = multi.iloc[0]
    doc_id = int(row["url"].rsplit("art-", 1)[1].split("/")[0])
    cont_text = gen_continuation_row(42, doc_id)["text"].split("\n")[-1]
    assert row["text"].rstrip().endswith(cont_text.rstrip())


@pytest.mark.usefixtures("ray_session")
def test_multipage_crawl_fans_out_to_every_parent():
    """Two base articles discovering the SAME continuation url must both
    receive its text (the reference follows pagination per document —
    the relabel join emits one row per parent)."""
    import ray.data

    from kgrecrun.corpus.synthgen import PAGES_SCHEMA
    from kgrecrun.extract.crawl import crawl_multipage

    def page(url, body):
        html = (
            f"<html><head><title>T</title></head><body>"
            f'<div class="story-body">{body}</div>'
            f'<div class="pager"><a href="https://s.example/shared/page-2">'
            f"Next &gt;</a></div></body></html>"
        )
        return {
            "url": url,
            "warc_ts": 0,
            "html": html.encode(),
            "text": "",
            "lang": "en",
        }

    body = "<p>" + "Alpha beta gamma delta epsilon words, more words here. " * 6 + "</p>"
    pages = ray.data.from_arrow(
        pa.Table.from_pylist(
            [page("https://s.example/a1", body), page("https://s.example/a2", body)],
            schema=PAGES_SCHEMA,
        )
    )
    cont_body = "<p>" + "Continuation sentence with plenty of words, commas too. " * 6 + "</p>"
    cont = ray.data.from_arrow(
        pa.Table.from_pylist(
            [page("https://s.example/shared/page-2", cont_body)], schema=PAGES_SCHEMA
        )
    )
    got = crawl_multipage(pages, cont).to_pandas().set_index("url")
    assert len(got) == 2
    assert int(got.loc["https://s.example/a1", "n_pages"]) == 2
    assert int(got.loc["https://s.example/a2", "n_pages"]) == 2
    assert "Continuation sentence" in got.loc["https://s.example/a1", "text"]
    assert "Continuation sentence" in got.loc["https://s.example/a2", "text"]


def test_crawl_module_has_no_driver_materialization():
    """The crawl round must stream end-to-end: no driver-side collection
    of any unbounded table (VERDICT r1 'What's wrong' #2)."""
    import inspect

    import kgrecrun.extract.crawl as crawl

    src = inspect.getsource(crawl)
    for forbidden in ("to_pandas(", "take_all(", "iter_rows(", "ray.put("):
        assert forbidden not in src, f"driver materialization: {forbidden}"


@pytest.mark.usefixtures("ray_session")
def test_crawl_rounds_follows_deep_chains():
    """crawl_rounds must follow page-2 → page-3 → page-4 chains,
    stitching every hop onto the ROOT article in page order, and leave
    single-page articles untouched."""
    import ray.data

    from kgrecrun.corpus.synthgen import (
        chain_depth,
        continuation_pages_dataset,
        gen_continuation_row,
        pages_dataset,
    )
    from kgrecrun.extract.crawl import crawl_multipage, crawl_rounds

    n = 120
    pages = pages_dataset(n, seed=42)
    cont = continuation_pages_dataset(n, seed=42, max_extra_pages=3)
    got = crawl_rounds(pages, cont, max_rounds=4).to_pandas().set_index("url")
    assert len(got) == n

    one_round = crawl_multipage(
        pages_dataset(n, seed=42), continuation_pages_dataset(n, seed=42)
    ).to_pandas().set_index("url")
    multi = one_round[one_round.n_pages > 1].index
    assert len(multi) > 0
    for url in multi:
        doc_id = int(url.rsplit("art-", 1)[1].split("/")[0])
        depth = chain_depth(doc_id, 3)
        assert int(got.loc[url, "n_pages"]) == depth, (url, depth)
        # stitched text ends with the LAST page of the chain
        tail = gen_continuation_row(42, doc_id, depth, last=True)["text"].split("\n")[-1]
        assert got.loc[url, "text"].rstrip().endswith(tail.rstrip()), url
    # articles without a pager stay single-page
    single = one_round[one_round.n_pages == 1].index
    assert (got.loc[single, "n_pages"] == 1).all()


def test_sanitize_reference_golden_parity(pytestconfig):
    """Byte parity vs the UNMODIFIED reference sanitizer
    (iframe.js:91-254 + figure-wrap block run under Node by
    tools/sanitize_golden_gen.mjs over reference-produced article html;
    golden written by tools/make_kg_clean_gold.py). Sample of the
    sf0.01 corpus; the full 1500 docs are the kg_clean_html driver
    oracle."""
    import pathlib

    import pyarrow.parquet as pq

    from kgrecrun.corpus import synthgen, world
    from kgrecrun.extract.events import html_to_events
    from kgrecrun.extract.kernel import Kernel

    gold_path = (
        pathlib.Path(__file__).parent / "goldens" / "kg_clean_html_sf001.parquet"
    )
    gold = {
        u: h
        for u, h in zip(*(pq.read_table(gold_path).column(c).to_pylist()
                          for c in ("url", "clean_html")))
    }
    w = world.build_world(42)
    kernel = Kernel()
    for doc_id in range(120):
        row, _ = synthgen.gen_page_row(42, doc_id, w)
        article = kernel.get_article(html_to_events(row["html"]))
        got = sanitize_html(article["html"], row["url"])
        assert got == gold[row["url"]], f"{row['url']}: sanitizer bytes differ"


# ---------------------------------------------------- anchor extraction

def test_page_anchors_walk():
    from kgrecrun.extract.links import page_anchors

    html = (
        '<html><body>'
        '<a href="/about">About  us</a>'
        '<a href="/b"><b>Bold</b> link</a>'
        '<a name="no-href">skip me</a>'
        '<a href="page-2">Next &gt;</a>'
        '<a href="https://other.example/x">Abs</a>'
        '<a href="/empty"></a>'
        '</body></html>'
    )
    got = page_anchors("https://site.example/news/art-1", html)
    assert got == [
        ("https://site.example/about", "About us"),
        ("https://site.example/b", "Bold link"),
        ("https://site.example/news/page-2", "Next >"),
        ("https://other.example/x", "Abs"),
        ("https://site.example/empty", ""),
    ]


def test_anchor_text_table_counts(ray_session):
    import pyarrow as pa

    from kgrecrun.extract.links import anchor_text_table

    pages = pa.table({
        "url": ["https://s.example/p1", "https://s.example/p2"],
        "html": [
            '<a href="/t">go</a><a href="/t">go</a><a href="/t">there</a>',
            '<a href="/t">go</a>',
        ],
    })
    rows = sorted(
        tuple(r.values())
        for r in anchor_text_table(
            ray_session.data.from_arrow(pages).repartition(2)).take_all())
    assert rows == [
        ("https://s.example/t", "go", 3, 2),
        ("https://s.example/t", "there", 1, 1),
    ]
