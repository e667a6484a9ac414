"""JavaScript-semantics string/regex helpers + the heuristic regex bank.

The reference kernel (readabilitySAX.js:164-213) is a bank of JS regexes
and JS string operations whose exact semantics ARE the model weights.
This module provides Python equivalents with JS semantics:

* ``JS_WS`` — the ECMAScript WhiteSpace+LineTerminator character set used
  by ``String.prototype.trim`` and the ``\\s`` regex class (differs from
  Python's ``str.strip``/``\\s`` in both directions).
* ``\\d``/``\\w`` are ASCII in JS — spelled out as explicit classes here.
* ``StatefulRegex`` — models a ``/g``-flagged regex used with ``.test()``
  whose ``lastIndex`` persists across calls (quirk Q2 of SURVEY.md §2.5,
  re_commas at readabilitySAX.js:44,213). One instance per document.
* ``js_trim`` / ``js_len`` / ``js_split_limited`` / ``js_parse_int`` —
  JS ``trim`` char set, UTF-16 code-unit lengths, the truncating
  ``split(sep, limit)`` (quirk Q4), and ``parseInt`` prefix parsing.
"""

from __future__ import annotations

import re

# ECMAScript WhiteSpace (incl. BOM, NBSP, Zs) + LineTerminator.
JS_WS_CHARS = (
    " \t\n\x0b\f\r\u00a0\u1680"
    + "".join(chr(c) for c in range(0x2000, 0x200B))
    + "\u2028\u2029\u202f\u205f\u3000\ufeff"
)
_JS_WS_CLASS = " \\t\\n\\x0b\\f\\r\\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000\\ufeff"
JS_WS = f"[{_JS_WS_CLASS}]"


def js_trim(s: str) -> str:
    """``String.prototype.trim`` — trims the JS whitespace set."""
    return s.strip(JS_WS_CHARS)


def js_len(s: str) -> int:
    """``String.prototype.length`` — UTF-16 code units (astral chars
    count 2). ASCII fast path; otherwise the UTF-16 byte length / 2
    (both C-speed, no per-char Python loop)."""
    if s.isascii():
        return len(s)
    return len(s.encode("utf-16-le")) >> 1


def collapse_ws(s: str) -> str:
    """``RE_WHITESPACE.sub(" ", s)`` with a fast path: when an ASCII
    string's only whitespace is single spaces the sub is an identity —
    a few C-speed scans beat running the regex machine over every
    space."""
    if s.isascii() and "  " not in s and "\t" not in s and "\n" not in s \
            and "\r" not in s and "\x0b" not in s and "\f" not in s:
        return s
    return RE_WHITESPACE.sub(" ", s)


def js_split_limited(s: str, sep: str, limit: int) -> list[str]:
    """JS ``s.split(sep, limit)``: truncates to the first *limit* fields
    (Python's ``maxsplit`` keeps the remainder — quirk Q4)."""
    return s.split(sep)[:limit]


def js_parse_int(s: str) -> int | None:
    """JS ``parseInt(s, 10)``: skip leading whitespace, optional sign,
    longest digit prefix; ``None`` for NaN."""
    m = re.match(f"^{JS_WS}*([+-]?[0-9]+)", s)
    return int(m.group(1)) if m else None


class StatefulRegex:
    """A ``/g`` regex used via ``.test()``: search starts at ``last_index``;
    on hit ``last_index`` moves past the match, on miss it resets to 0
    (readabilitySAX.js:44 with re_commas, quirk Q2). Fresh per document."""

    def __init__(self, pattern: str):
        self._re = re.compile(pattern)
        self.last_index = 0

    def test(self, s: str) -> bool:
        if self.last_index > len(s):
            self.last_index = 0
            return False
        m = self._re.search(s, self.last_index)
        if m is None:
            self.last_index = 0
            return False
        self.last_index = m.end()
        return True


# --- the regex bank (readabilitySAX.js:179-213), JS classes spelled out ---

RE_VIDEOS = re.compile(r"http://(?:www\.)?(?:youtube|vimeo)\.com")
RE_NEXT_LINK = re.compile(r"[>»]|continue|next|weiter(?:[^\|]|$)", re.I)
RE_PREV_LINK = re.compile(r"[<«]|earl|new|old|prev", re.I)
RE_EXTRANEOUS = re.compile(
    r"all|archive|comment|discuss|e-?mail|login|print|reply|share|sign|single", re.I
)
RE_PAGES = re.compile(r"pag(?:e|ing|inat)", re.I)
RE_PAGENUM = re.compile(r"p[ag]{0,2}(?:e|ing|ination)?[=/][0-9]{1,2}", re.I)

RE_SAFE = re.compile(r"article-body|hentry|instapaper_body")
RE_FINAL = re.compile(r"first|last", re.I)

RE_POSITIVE = re.compile(
    r"article|blog|body|content|entry|main|news|pag(?:e|ination)|post|story|text"
)
RE_NEGATIVE = re.compile(
    r"com(?:bx|ment|-)|contact|foot(?:er|note)?|masthead|media|meta|outbrain"
    r"|promo|related|scroll|shoutbox|sidebar|sponsor|shopping|tags|tool|widget"
)
RE_UNLIKELY_CANDIDATES = re.compile(
    r"ad-break|agegate|auth?or|bookmark|cat|com(?:bx|ment|munity)|date|disqus"
    r"|extra|foot|header|ignore|links|menu|nav|pag(?:er|ination)|popup|related"
    r"|remark|rss|share|shoutbox|sidebar|similar|social|sponsor|teaserlist"
    r"|time|tweet|twitter"
)
RE_OK_MAYBE_CANDIDATE = re.compile(r"and|article|body|column|main|shadow")

RE_SENTENCE = re.compile(r"\. |\.$")
RE_WHITESPACE = re.compile(f"{JS_WS}+")

RE_PAGE_IN_URL = re.compile(r"[_\-]?p[a-zA-Z]*[_\-]?[0-9]{1,2}$")
RE_BAD_FIRST = re.compile(r"^(?:[^a-z]{0,3}|index|[0-9]+)$", re.I)
RE_NO_LETTERS = re.compile(r"[^a-zA-Z]")
RE_PARAMS = re.compile(r"\?.*")
RE_EXTENSION = re.compile(r"00,|\.[a-zA-Z]+$")
RE_DIGITS = re.compile(r"[0-9]")
RE_JUST_DIGITS = re.compile(r"^[0-9]{1,2}$")
RE_SLASHES = re.compile(r"/+")
RE_DOMAIN = re.compile(r"/([^/]+)")

RE_PROTOCOL = re.compile(r"^[A-Za-z0-9_]+:")
RE_CLEAN_PATHS = re.compile(r"/\.(?!\.)|/[^/]*/\.\.")

RE_CLOSING = re.compile(r"/?(?:#.*)?$")
RE_IMG_URL = re.compile(r"\.(gif|jpe?g|png|webp)$", re.I)

RE_COMMAS_PATTERN = f",[{_JS_WS_CLASS},]*"
RE_COMMAS = re.compile(RE_COMMAS_PATTERN)  # stateless uses (split)

# getTitle / getHTML / getText cleanup regexes (readabilitySAX.js:651-705)
RE_TITLE_SEP = re.compile(r" [\|\-] ")
RE_TITLE_KEEP_FIRST = re.compile(r"(.*) [\|\-] .*")
RE_TITLE_DROP_FIRST = re.compile(r".*?[\|\-] ")
RE_HTML_BR_BEFORE_P = re.compile(f"(?:<br/>(?:{JS_WS}|&nbsp;?)*)+(?=</?p)")
RE_HTML_WS_BEFORE_BR = re.compile(f"(?:{JS_WS}|&nbsp;?)+(?=<br/>)")
RE_HTML_DOUBLE_BR = re.compile(r"(?:<br/>){2,}")
RE_TEXT_NEWLINES = re.compile(r"\n+(?=\n{2})")


def new_commas_regex() -> StatefulRegex:
    """Fresh per-document stateful re_commas (quirk Q2)."""
    return StatefulRegex(RE_COMMAS_PATTERN)


def count_commas(txt: str) -> int:
    """``txt.split(re_commas).length - 1`` — JS split with a regex ignores
    and does not mutate ``lastIndex``."""
    return len(RE_COMMAS.split(txt)) - 1
