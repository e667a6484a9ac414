"""Multi-page crawl frontier: the reference's ``linksToSkip`` anti-join
(readabilitySAX.js:237, checked at 341: a discovered next-page href is
skipped if already parsed) lifted to corpus scale.

``frontier = next_page links ANTI JOIN seen urls`` — expressed as one
``groupby(url)`` over the union of (candidate, seen) streams rather
than a hash join: both sides are projected to (url, flag) first, so the
shuffle carries two narrow columns, and the groupby emits a url iff no
``seen`` row landed in its group. Holds at any scale; no driver-side
set, no broadcast of the (unbounded) seen-url list.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def resolve_next_pages(articles_ds):
    """articles → (url, next_url): non-empty next_page links absolutized
    against the article's own url (the reference resolves against the
    page's base URI when following pagination; sanitize.resolve_url
    implements those rules)."""
    from ..sanitize.stage import resolve_url

    def f(batch: pa.Table) -> pa.Table:
        kept = batch.filter(
            pc.and_(
                pc.is_valid(batch["next_page"]),
                pc.greater(pc.utf8_length(batch["next_page"]), 0),
            )
        )
        urls = kept["url"].to_pylist()
        nxt = [resolve_url(n, u) for n, u in zip(kept["next_page"].to_pylist(), urls)]
        return pa.table({"url": pa.array(urls, pa.string()),
                         "next_url": pa.array(nxt, pa.string())})

    return articles_ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


_STITCH_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("title", pa.large_string()),
    ("text", pa.large_string()),
    ("n_pages", pa.int64()),
    ("text_length_total", pa.int64()),
])


def _stitch_by_url(pages_ds, *, n_buckets: int = 256):
    """(url, title, text, page_no) rows → one stitched row per url
    (pages in page_no order; title from the first page that has one).

    Bucket-cogrouped: urls hash into ``n_buckets`` groups, ONE sort by
    (url, page_no) per group, then an in-process segment sweep — group
    dispatch stays at n_buckets no matter how many root articles exist
    (per-url ``map_groups`` would cost one Python call per article,
    corpus-order cardinality)."""
    from ..kg.unionfind import hash_bucket

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__bucket", hash_bucket(batch["url"].combine_chunks(), n_buckets)
        )

    def stitch_bucket(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(
            group, sort_keys=[("url", "ascending"), ("page_no", "ascending")]
        )
        g = group.take(order)
        urls = g["url"].to_pylist()
        titles = g["title"].to_pylist()
        texts = g["text"].to_pylist()
        n = len(urls)
        out_url, out_title, out_text, out_np, out_len = [], [], [], [], []
        start = 0
        for i in range(1, n + 1):
            if i == n or urls[i] != urls[start]:
                seg = [t for t in texts[start:i] if t]
                out_url.append(urls[start])
                out_title.append(next((t for t in titles[start:i] if t), ""))
                out_text.append("\n\n".join(seg))
                out_np.append(i - start)
                out_len.append(sum(len(t) for t in seg))
                start = i
        return pa.table(
            {
                "url": pa.array(out_url, pa.string()),
                "title": pa.array(out_title, pa.large_string()),
                "text": pa.array(out_text, pa.large_string()),
                "n_pages": pa.array(out_np, pa.int64()),
                "text_length_total": pa.array(out_len, pa.int64()),
            },
            schema=_STITCH_SCHEMA,
        )

    tagged = pages_ds.map_batches(tag, batch_format="pyarrow", zero_copy_batch=True)
    return tagged.groupby("__bucket").map_groups(
        stitch_bucket, batch_format="pyarrow"
    )


_PAGES_NORM_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.large_binary()),
    ("text", pa.large_string()),
    ("lang", pa.string()),
])


def _fetch_frontier(continuation_ds, frontier_ds):
    """Semi-join the page source against a one-column frontier url set:
    ONE bucketed cogroup shuffle (urls hash into ~256 groups, a
    vectorized acero left-semi join runs inside each — dispatch capped
    at n_buckets, not at url cardinality). The frontier side ships
    per-batch-distinct urls only; no driver state."""
    from ..ops.cogroup import bucket_join

    def page_side(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pc.cast(batch["url"], pa.string()),
            "warc_ts": batch["warc_ts"],
            "html": pc.cast(batch["html"], pa.large_binary()),
            "text": pc.cast(batch["text"], pa.large_string()),
            "lang": pc.cast(batch["lang"], pa.string()),
        }, schema=_PAGES_NORM_SCHEMA)

    def frontier_side(batch: pa.Table) -> pa.Table:
        return pa.table({"url": pc.cast(batch["url"], pa.string())})

    return bucket_join(
        continuation_ds.map_batches(
            page_side, batch_format="pyarrow", zero_copy_batch=True
        ),
        frontier_ds.map_batches(frontier_side, batch_format="pyarrow"),
        key="url",
        join_type="left semi",
        left_schema=_PAGES_NORM_SCHEMA,
        right_schema=pa.schema([("url", pa.string())]),
        right_distinct=True,
    )


def _relabel_to_parents(articles_ds, parent_pairs_ds, *, page_no: int):
    """Fan each extracted continuation's text out to EVERY parent that
    discovered it: an INNER bucket-cogroup join of articles with
    (parent_url, next_url) pairs on the continuation url (acero emits
    the full per-url cross product — one row per (link, article) pair,
    the multi-parent fan-out). Dispatch capped at n_buckets, not url
    cardinality. Output (url=parent, title='', text, page_no)."""
    from ..ops.cogroup import bucket_join

    def article_side(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pc.cast(batch["url"], pa.string()),
            "text": pc.cast(batch["text"], pa.large_string()),
        })

    def parent_side(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pc.cast(batch["next_url"], pa.string()),
            "parent_url": pc.cast(batch["parent_url"], pa.string()),
        })

    joined = bucket_join(
        articles_ds.map_batches(article_side, batch_format="pyarrow"),
        parent_pairs_ds.map_batches(parent_side, batch_format="pyarrow"),
        key="url",
        join_type="inner",
        left_schema=pa.schema([("url", pa.string()), ("text", pa.large_string())]),
        right_schema=pa.schema([("url", pa.string()), ("parent_url", pa.string())]),
    )

    def emit(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["parent_url"],
            "title": pa.nulls(batch.num_rows, pa.large_string()).fill_null(""),
            "text": batch["text"],
            "page_no": pa.nulls(batch.num_rows, pa.int64()).fill_null(page_no),
        })

    return joined.map_batches(emit, batch_format="pyarrow", zero_copy_batch=True)


def crawl_multipage(pages_ds, continuation_ds, *, extract_kwargs=None):
    """One crawl round of the reference's searchFurtherPages flow at
    corpus scale: extract base pages → discover + absolutize next-page
    links → anti-join against already-fetched urls → fetch the frontier
    from ``continuation_ds`` (the page source) → extract those → stitch
    continuation text onto its parent article.

    Returns a Dataset (url, title, text, n_pages, text_length_total).
    Fully driver-free: the frontier fetch is a semi-join of the
    continuation source against the frontier url set, and parent
    relabeling a cogroup of extracted continuations with the link table
    — one output row PER parent, so two base articles discovering the
    same continuation url both receive its text (the reference follows
    pagination per document). No ``to_pandas``/broadcast dict, so the
    round holds when the pager fraction is itself billions of rows.

    Both steps are bucketed cogroup joins (ops.cogroup.bucket_join —
    one hash shuffle of the payload each, identical exchange volume to
    a hash join, group dispatch capped at n_buckets instead of one
    Python call per url). ``Dataset.join`` is deliberately NOT used: Ray
    2.49's hash-shuffle join loses its one-shot schema broadcast when
    the first block dispatched on a side is empty
    (hash_shuffle.py:223 returns before broadcasting, join.py:103
    then builds a schemaless table for shardless partitions and the
    acero join raises "No match for FieldRef") — and a sparse crawl
    frontier emits empty blocks routinely."""
    from .stage import extract_articles

    kw = extract_kwargs or {}
    articles = extract_articles(pages_ds, emit_html=False, **kw)

    # Ray Data plans are trees, not DAGs: every consumer of `links`
    # would re-run the extraction upstream. links is two narrow string
    # columns × the pager fraction — materialize it once (distributed
    # object store, spillable) instead of extracting the corpus three
    # times (frontier branch, parents branch, first-page branch)
    links = resolve_next_pages(articles).materialize()
    seen = pages_ds.map_batches(
        lambda b: b.select(["url"]), batch_format="pyarrow"
    )
    frontier = crawl_frontier(
        links.map_batches(
            lambda b: pa.table({"url": b["url"], "next_page": b["next_url"]}),
            batch_format="pyarrow",
        ),
        seen,
    )

    page2 = _fetch_frontier(continuation_ds, frontier)
    articles2 = extract_articles(page2, emit_html=False, **kw)
    relinked = _relabel_to_parents(
        articles2,
        links.map_batches(
            lambda b: pa.table({"parent_url": pc.cast(b["url"], pa.string()),
                                "next_url": pc.cast(b["next_url"], pa.string())}),
            batch_format="pyarrow",
        ),
        page_no=2,
    )

    def first_page(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pc.cast(batch["url"], pa.string()),
            "title": pc.cast(batch["title"], pa.large_string()),
            "text": pc.cast(batch["text"], pa.large_string()),
            "page_no": pa.array([1] * batch.num_rows, pa.int64()),
        })

    both = articles.map_batches(first_page, batch_format="pyarrow").union(relinked)

    return _stitch_by_url(both)


def crawl_rounds(pages_ds, continuation_ds, *, max_rounds: int = 3,
                 extract_kwargs=None):
    """Iterated ``searchFurtherPages``: follow pagination chains up to
    ``max_rounds`` continuation hops (page 2, 3, …), anti-joining each
    round's frontier against EVERY url consumed so far — the reference's
    ``linksToSkip`` semantics (readabilitySAX.js:237,341), which also
    breaks pagination cycles. Returns (url, title, text, n_pages,
    text_length_total) stitched in page order per ROOT article.

    All per-round state is narrow url/link Datasets materialized in the
    object store (bounded by the pager fraction); multi-parent fan-out
    composes across rounds: a page shared by two chains contributes its
    text — and its onward pages — to both roots."""
    from .stage import extract_articles

    kw = extract_kwargs or {}
    articles = extract_articles(pages_ds, emit_html=False, **kw)

    def first_page(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": pc.cast(batch["url"], pa.string()),
            "title": pc.cast(batch["title"], pa.large_string()),
            "text": pc.cast(batch["text"], pa.large_string()),
            "page_no": pa.array([1] * batch.num_rows, pa.int64()),
        })

    parts = [articles.map_batches(first_page, batch_format="pyarrow")]
    seen = pages_ds.map_batches(
        lambda b: pa.table({"url": pc.cast(b["url"], pa.string())}),
        batch_format="pyarrow",
    ).materialize()
    # (url, root): which root article(s) each current-frontier page
    # belongs to; a url may map to several roots (shared continuations)
    cur_roots = articles.map_batches(
        lambda b: pa.table({"url": pc.cast(b["url"], pa.string()),
                            "root": pc.cast(b["url"], pa.string())}),
        batch_format="pyarrow",
    ).materialize()
    cur_articles = articles

    for rnd in range(max_rounds):
        links = resolve_next_pages(cur_articles).materialize()
        if links.count() == 0:
            break
        # attribute each discovered next_url to the ROOT(s) of its
        # parent page: cogroup keyed on the PARENT url (the pairs are
        # fed swapped — next_url slot carries the join key, parent_url
        # slot the value to emit), yielding one (next_url, root) row per
        # (link, root) pair
        rooted = _relabel_to_parents(
            cur_roots.map_batches(
                lambda b: pa.table({"url": b["url"], "text": b["root"]}),
                batch_format="pyarrow",
            ),
            links.map_batches(
                lambda b: pa.table({"parent_url": pc.cast(b["next_url"], pa.string()),
                                    "next_url": pc.cast(b["url"], pa.string())}),
                batch_format="pyarrow",
            ),
            page_no=0,
        ).map_batches(
            lambda b: pa.table({"url": pc.cast(b["url"], pa.string()),
                                "root": pc.cast(b["text"], pa.string())}),
            batch_format="pyarrow",
        ).repartition(8).materialize()

        frontier = crawl_frontier(
            rooted.map_batches(
                lambda b: pa.table({"url": b["url"], "next_page": b["url"]}),
                batch_format="pyarrow",
            ),
            seen,
        ).repartition(8).materialize()
        if frontier.count() == 0:
            break

        page_r = _fetch_frontier(continuation_ds, frontier)
        arts_r = extract_articles(page_r, emit_html=False, **kw)
        arts_text = arts_r.map_batches(
            lambda b: b.select(["url", "text", "next_page"]), batch_format="pyarrow"
        ).materialize()

        parts.append(
            _relabel_to_parents(
                arts_text,
                rooted.map_batches(
                    lambda b: pa.table({"parent_url": b["root"], "next_url": b["url"]}),
                    batch_format="pyarrow",
                ),
                page_no=rnd + 2,
            )
        )
        # compact the iterated narrow tables: the bucketed cogroups
        # above emit ~n_buckets tiny blocks per round and Ray's shuffle
        # cost scales with input BLOCK COUNT — the bfs_distances lesson
        # (BENCH/BASELINE.md round-3 session 3) applied to the crawl
        seen = seen.union(frontier).repartition(8).materialize()
        cur_articles = arts_text
        cur_roots = rooted

    union = parts[0]
    for p in parts[1:]:
        union = union.union(p)
    return _stitch_by_url(union)


def next_page_candidates(articles_ds):
    """articles → distinct-per-block (url=next_page) candidates."""

    def f(batch: pa.Table) -> pa.Table:
        kept = batch.filter(
            pc.and_(
                pc.is_valid(batch["next_page"]),
                pc.greater(pc.utf8_length(batch["next_page"]), 0),
            )
        )
        t = pa.table({"url": kept["next_page"]})
        return t.group_by(["url"]).aggregate([]).select(["url"])

    return articles_ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def crawl_frontier(articles_ds, seen_urls_ds):
    """→ Dataset(url) of next-page links not yet fetched.

    ``seen_urls_ds`` is any Dataset with a ``url`` column (typically the
    pages table already processed this round)."""

    _EMPTY = pa.table({"url": pa.array([], pa.string())})

    def tag(flag: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    # normalize to string so both union branches and the
                    # downstream join key share one exact Arrow type
                    "url": pc.cast(batch["url"], pa.string()),
                    "seen": pa.array([flag] * batch.num_rows, pa.int8()),
                }
            )

        return f

    candidates = next_page_candidates(articles_ds).map_batches(
        tag(0), batch_format="pyarrow"
    )
    seen = seen_urls_ds.map_batches(tag(1), batch_format="pyarrow")

    unioned = candidates.union(seen)
    agg = unioned.groupby("url").max("seen")

    def keep_unseen(batch: pa.Table) -> pa.Table:
        if batch.num_columns < 2:  # empty aggregate blocks are schemaless
            return _EMPTY
        b = batch.rename_columns(["url", "seen"])
        kept = b.filter(pc.equal(b["seen"], 0))
        return pa.table({"url": pc.cast(kept["url"], pa.string())})

    return agg.map_batches(keep_unseen, batch_format="pyarrow")
