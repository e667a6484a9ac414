"""HTML → serialized SAX event stream.

The reference kernel consumes a browser-parsed DOM via a recursive walk
(readabilitySAX.js:733-765: lowercased tag names, per-attribute events in
document order, text nodes, comments skipped). Browsers are not available
here, so this module parses HTML with the stdlib ``html.parser`` plus an
HTML5-ish normalization layer (void elements, implied closes for
``p``/``li``/table cells, stray end tags) and emits the flat event list

    ("open", name) | ("attr", name, value) | ("text", text) | ("close", name)

The SAME event list is fed to the unmodified reference JS under Node by
``tools/golden_gen.mjs`` (which rebuilds fake DOM nodes from it), so the
HTML parser sits outside the byte-identity parity surface. Fixture HTML
stays within markup where HTML5 parsers agree (FIXTURES.md §3).
"""

from __future__ import annotations

from html.parser import HTMLParser

Event = tuple  # ("open", name) / ("attr", name, value) / ("text", text) / ("close", name)

VOID_ELEMENTS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# An open <p> is implicitly closed by these start tags (HTML5 spec list).
P_CLOSERS = frozenset(
    (
        "address article aside blockquote details div dl fieldset figcaption "
        "figure footer form h1 h2 h3 h4 h5 h6 header hgroup hr main menu nav "
        "ol p pre section table ul"
    ).split()
)

# tag on top of stack → start tags that implicitly close it
AUTO_CLOSE = {
    "li": frozenset(("li",)),
    "dt": frozenset(("dt", "dd")),
    "dd": frozenset(("dt", "dd")),
    "td": frozenset(("td", "th", "tr")),
    "th": frozenset(("td", "th", "tr")),
    "tr": frozenset(("tr",)),
    "option": frozenset(("option", "optgroup")),
    "optgroup": frozenset(("optgroup",)),
    "thead": frozenset(("tbody", "tfoot")),
    "tbody": frozenset(("tbody", "tfoot")),
}


class _EventParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.events: list[Event] = []
        self.stack: list[str] = []

    # -- helpers --
    def _emit_close(self) -> None:
        self.events.append(("close", self.stack.pop()))

    def _implied_closes(self, tag: str) -> None:
        if tag in P_CLOSERS:
            # close the nearest open <p> if it is near the top (simple scope)
            for i in range(len(self.stack) - 1, max(len(self.stack) - 3, -1), -1):
                if self.stack[i] == "p":
                    while len(self.stack) > i:
                        self._emit_close()
                    break
                if self.stack[i] in ("div", "td", "th", "li", "body", "html", "table"):
                    break
        while self.stack and tag in AUTO_CLOSE.get(self.stack[-1], ()):
            self._emit_close()

    def _open(self, tag: str, attrs, self_closing: bool) -> None:
        self._implied_closes(tag)
        self.events.append(("open", tag))
        seen = set()
        for name, value in attrs:
            if name in seen:  # browsers keep the first occurrence
                continue
            seen.add(name)
            self.events.append(("attr", name, value if value is not None else ""))
        if tag in VOID_ELEMENTS:
            self.events.append(("close", tag))
        else:
            # HTML parsers ignore "/" on non-void elements: <div/> opens a div
            self.stack.append(tag)

    # -- HTMLParser callbacks --
    def handle_starttag(self, tag, attrs):
        self._open(tag, attrs, False)

    def handle_startendtag(self, tag, attrs):
        self._open(tag, attrs, True)

    def handle_endtag(self, tag):
        if tag in VOID_ELEMENTS:
            return  # browsers drop stray </img> etc. (</br> edge ignored)
        if tag in self.stack:
            while self.stack:
                top = self.stack[-1]
                self._emit_close()
                if top == tag:
                    break
        # unmatched end tag: dropped

    def handle_data(self, data):
        if not self.stack:
            return  # text outside the root element (browser would relocate)
        self.events.append(("text", data))

    # comments / doctype / processing instructions are skipped, matching
    # the reference DOM walk (readabilitySAX.js:756)

    def finish(self) -> list[Event]:
        self.close()
        while self.stack:
            self._emit_close()
        return self.events


def html_to_events(html: str | bytes) -> list[Event]:
    """Parse HTML into the kernel's event stream, rooted at a single
    ``html`` element (synthesized if the document lacks one, as a browser
    would)."""
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    parser = _EventParser()
    parser.feed(html)
    events = parser.finish()
    first_open = next((e for e in events if e[0] == "open"), None)
    if first_open is None or first_open[1] != "html":
        events = [("open", "html")] + events + [("close", "html")]
    else:
        # drop any stray events before the root open / after its close
        i = events.index(first_open)
        if i > 0:
            events = events[i:]
    return events
