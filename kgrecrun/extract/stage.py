"""Ray Data extraction stage: pages → articles.

``pages.map_batches(ExtractArticles(), batch_format="pyarrow",
zero_copy_batch=True)``. The kernel is pure per-document (mirrors the
reference's per-invocation construction, content.js:151-154), so this is
a stateless task stage — no actor pool needed. Per-row failures are
caught into an ``error`` column; a task never fails on a bad document.

The multi-MB ``html`` payload column is consumed here and NOT carried
downstream (SURVEY.md §7.4: project wide columns away immediately).
"""

from __future__ import annotations

import pyarrow as pa

from .events import html_to_events
from .kernel import Kernel, Settings, production_settings

ARTICLES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("title", pa.large_string()),
        ("text", pa.large_string()),
        ("html", pa.large_string()),
        ("next_page", pa.string()),
        ("text_length", pa.int64()),
        ("score", pa.int64()),
        ("lang", pa.string()),
        ("error", pa.string()),
    ]
)


class ExtractArticles:
    """Batch UDF re-implementing the reference's extraction driver
    (content.js:138-167) over Arrow record batches."""

    def __init__(self, settings: Settings | None = None, emit_html: bool = True):
        self.settings = settings or production_settings()
        self.emit_html = emit_html

    def __call__(self, batch: pa.Table) -> pa.Table:
        kernel = Kernel(self.settings)
        urls = batch["url"]
        htmls = batch["html"]
        langs = batch["lang"] if "lang" in batch.column_names else None

        out = {k: [] for k in ("title", "text", "html", "next_page", "text_length", "score", "error")}
        for i in range(batch.num_rows):
            html = htmls[i].as_py()
            try:
                article = kernel.get_article(html_to_events(html))
                out["title"].append(article["title"])
                out["text"].append(article["text"])
                out["html"].append(article["html"] if self.emit_html else "")
                out["next_page"].append(article["next_page"])
                out["text_length"].append(article["text_length"])
                out["score"].append(int(article["score"]))
                out["error"].append(None)
            except Exception as exc:  # per-row failure policy (SURVEY.md §4.1)
                for k in ("title", "text", "html", "next_page"):
                    out[k].append("")
                out["text_length"].append(0)
                out["score"].append(0)
                out["error"].append(f"{type(exc).__name__}: {exc}"[:500])

        return pa.table(
            {
                "url": urls,
                "title": pa.array(out["title"], pa.large_string()),
                "text": pa.array(out["text"], pa.large_string()),
                "html": pa.array(out["html"], pa.large_string()),
                "next_page": pa.array(out["next_page"], pa.string()),
                "text_length": pa.array(out["text_length"], pa.int64()),
                "score": pa.array(out["score"], pa.int64()),
                "lang": langs if langs is not None else pa.nulls(batch.num_rows, pa.string()),
                "error": pa.array(out["error"], pa.string()),
            }
        )


class ExplodeTextNodes:
    """pages → one row per nonempty text node of the extracted article
    (reference getNodes export, readabilitySAX.js:106-117, SURVEY.md §2
    row 25): (url, node_idx, node_text). Parity of the node list is
    byte-checked in tests/test_parity.py."""

    def __init__(self, settings: Settings | None = None):
        self.settings = settings or production_settings()

    def __call__(self, batch: pa.Table) -> pa.Table:
        kernel = Kernel(self.settings)
        urls, idxs, texts = [], [], []
        for i in range(batch.num_rows):
            url = batch["url"][i].as_py()
            try:
                nodes = kernel.get_article(
                    html_to_events(batch["html"][i].as_py()), include_nodes=True
                )["nodes"]
            except Exception:
                continue
            for j, t in enumerate(nodes):
                urls.append(url)
                idxs.append(j)
                texts.append(t)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "node_idx": pa.array(idxs, pa.int64()),
                "node_text": pa.array(texts, pa.large_string()),
            }
        )


def explode_text_nodes(pages, *, settings: Settings | None = None, batch_size: int = 256):
    return pages.map_batches(
        ExplodeTextNodes(settings),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
    )


def extract_articles(pages, *, settings: Settings | None = None, emit_html: bool = True,
                     batch_size: int = 256, concurrency=None):
    """pages Dataset → articles Dataset. batch_size is kept modest because
    html payloads are wide (SURVEY.md §7.4)."""
    return pages.map_batches(
        ExtractArticles(settings, emit_html),
        batch_format="pyarrow",
        zero_copy_batch=True,
        batch_size=batch_size,
        **({"concurrency": concurrency} if concurrency else {}),
    )
