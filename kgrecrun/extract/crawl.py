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


def crawl_multipage(pages_ds, continuation_ds, *, extract_kwargs=None):
    """One crawl round of the reference's searchFurtherPages flow at
    corpus scale: extract base pages → discover + absolutize next-page
    links → anti-join against already-fetched urls → fetch the frontier
    from ``continuation_ds`` (the page source) → extract those → stitch
    continuation text onto its parent article.

    Returns a Dataset (url, title, text, n_pages, text_length_total).
    The frontier is materialized per round (it is ≤ the pager fraction
    of the corpus, not the corpus); everything else streams."""
    import ray

    from .stage import extract_articles

    kw = extract_kwargs or {}
    articles = extract_articles(pages_ds, emit_html=False, **kw)

    links = resolve_next_pages(articles)
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
    # frontier + parent map are ≤ the pager fraction of the corpus —
    # bounded driver-side state per crawl round
    fdf = frontier.to_pandas()
    wanted = set(fdf["url"]) if "url" in fdf.columns else set()  # empty frontier → no columns
    link_tbl = links.to_pandas()
    parent_of = (
        {n: u for u, n in zip(link_tbl["url"], link_tbl["next_url"]) if n in wanted}
        if "url" in link_tbl.columns
        else {}
    )
    wanted_ref = ray.put(wanted)

    def fetch(batch: pa.Table) -> pa.Table:
        w = ray.get(wanted_ref)
        mask = pa.array([u in w for u in batch["url"].to_pylist()])
        return batch.filter(mask)

    page2 = continuation_ds.map_batches(fetch, batch_format="pyarrow", zero_copy_batch=True)
    articles2 = extract_articles(page2, emit_html=False, **kw)

    parent_ref = ray.put(parent_of)

    def relabel(batch: pa.Table) -> pa.Table:
        p = ray.get(parent_ref)
        parents = [p.get(u) for u in batch["url"].to_pylist()]
        return pa.table({
            "url": pa.array(parents, pa.string()),
            "title": pa.array([""] * batch.num_rows, pa.large_string()),
            "text": batch["text"],
            "page_no": pa.array([2] * batch.num_rows, pa.int64()),
        })

    def first_page(batch: pa.Table) -> pa.Table:
        return pa.table({
            "url": batch["url"],
            "title": batch["title"],
            "text": batch["text"],
            "page_no": pa.array([1] * batch.num_rows, pa.int64()),
        })

    both = articles.map_batches(first_page, batch_format="pyarrow").union(
        articles2.map_batches(relabel, batch_format="pyarrow")
    )

    def stitch(group: pa.Table) -> pa.Table:
        order = pc.sort_indices(group, sort_keys=[("page_no", "ascending")])
        g = group.take(order)
        texts = [t for t in g["text"].to_pylist() if t]
        text = "\n\n".join(texts)
        title = next((t for t in g["title"].to_pylist() if t), "")
        return pa.table({
            "url": pa.array([g["url"][0].as_py()], pa.string()),
            "title": pa.array([title], pa.large_string()),
            "text": pa.array([text], pa.large_string()),
            "n_pages": pa.array([g.num_rows], pa.int64()),
            "text_length_total": pa.array([sum(len(t) for t in texts)], pa.int64()),
        })

    return both.groupby("url").map_groups(stitch, batch_format="pyarrow")


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

    def tag(flag: int):
        def f(batch: pa.Table) -> pa.Table:
            return pa.table(
                {
                    "url": batch["url"],
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
        b = batch.rename_columns(["url", "seen"])
        return b.filter(pc.equal(b["seen"], 0)).select(["url"])

    return agg.map_batches(keep_unseen, batch_format="pyarrow")
