"""Hand-written fixture HTML documents, one+ per heuristic class of
FIXTURES.md §3. Each exercises a cited branch of the reference kernel;
the parity test runs every one through BOTH the Python kernel and the
unmodified reference JS (tools/golden_gen.mjs) and byte-compares the
article record. Markup stays within the zone where HTML5 parsers agree
(explicit closes except where implied-close behavior is itself under
test).
"""

from __future__ import annotations

LOREM = (
    "The committee published its findings on Tuesday, noting that river "
    "levels had fallen for the third consecutive year. Observers from "
    "twelve countries attended the hearing, and several filed written "
    "remarks before the deadline."
)
LOREM2 = (
    "In the months that followed, engineers revised the flood model, "
    "recalibrated the gauges, and issued a corrected bulletin. The revised "
    "figures, published in March, showed a smaller but still significant "
    "decline."
)
LOREM3 = (
    "Local officials welcomed the report. Funding for the monitoring "
    "network, they said, would continue through the end of the decade."
)


def _page(title: str, body: str) -> str:
    return (
        "<html><head><title>" + title + "</title></head><body>" + body + "</body></html>"
    )


FIXTURES: dict[str, str] = {}

FIXTURES["plain-article"] = _page(
    "River levels fall for third year | Example Times",
    '<div id="wrap"><div id="main-content">'
    f"<p>{LOREM}</p><p>{LOREM2}</p><p>{LOREM3}</p>"
    "</div></div>",
)

FIXTURES["titled-h1-match"] = _page(
    "River levels fall again this year - Example Times",
    '<div id="content"><h1>River levels fall again this year</h1>'
    f"<p>{LOREM}</p><p>{LOREM2}</p></div>",
)

FIXTURES["titled-short"] = _page(
    "Short | X",
    f'<div id="content"><h1>Completely different header</h1><p>{LOREM}</p><p>{LOREM2}</p></div>',
)

FIXTURES["titled-colon"] = _page(
    "Example Times: river levels fall for a third consecutive year",
    f"<div><p>{LOREM}</p><p>{LOREM2}</p></div>",
)

FIXTURES["titled-h2-subset"] = _page(
    "The full story of the river levels report by our correspondents",
    "<div><h2>full story of the river levels</h2>"
    f"<p>{LOREM}</p><p>{LOREM2}</p></div>",
)

FIXTURES["no-title-h1"] = (
    f"<html><body><div><h1>A bare header used as the title</h1><p>{LOREM}</p>"
    f"<p>{LOREM2}</p></div></body></html>"
)

FIXTURES["boilerplate-heavy"] = _page(
    "Main story headline here today | Site",
    '<nav><ul><li><a href="/a">Home</a></li><li><a href="/b">World</a></li></ul></nav>'
    '<aside>Trending now: everything</aside>'
    f"<div><p>Intro paragraph, short but present.</p><p>{LOREM}</p><p>{LOREM2}</p></div>"
    "<script>var x = 1;</script><style>.a { color: red }</style>"
    "<footer>Copyright 2026</footer>",
)

FIXTURES["span-font-unwrap"] = _page(
    "Unwrapped inline elements everywhere tonight",
    f'<div><p>Before <span class="hl">inside a span</span> after, {LOREM}</p>'
    f'<p><font color="red">Font text here,</font> {LOREM2}</p></div>',
)

FIXTURES["link-farm"] = _page(
    "A story drowning in links | Example",
    f"<div><div><p>{LOREM}</p><p>{LOREM2}</p></div>"
    '<div><a href="/x1">one link</a> <a href="/x2">two link</a> '
    '<a href="/x3">three link</a> <a href="/x4">four link</a> '
    '<a href="/x5">five link</a> tiny</div></div>',
)

FIXTURES["h2-density-clean"] = _page(
    "Header cleaning inside the candidate tonight",
    f'<div><h2><a href="/hub">All the news hub</a></h2><p>{LOREM}</p><p>{LOREM2}</p>'
    f"<h3>A kept subheading</h3><p>{LOREM3}</p></div>",
)

FIXTURES["div-soup"] = _page(
    "Divs all the way down this evening",
    f"<div><div>{LOREM}</div><div>{LOREM2}</div><div><div><p>{LOREM3}</p></div></div></div>",
)

FIXTURES["unpack-div"] = _page(
    "A div holding just one image today",
    f'<div><p>{LOREM}</p><div><img src="/pic.jpg" width="400" height="300"></div>'
    f"<p>{LOREM2}</p></div>",
)

FIXTURES["empty-elements"] = _page(
    "Empty elements vanish from the output",
    f"<div><p>{LOREM}</p><p>   </p><blockquote><span>  </span></blockquote>"
    f"<table><tbody><tr><td></td></tr></tbody></table><p>{LOREM2}</p>"
    f'<p><img src="/keep.png" width="500" height="400"></p></div>',
)

FIXTURES["media"] = _page(
    "Images large and small plus embedded video",
    f'<div><p>{LOREM}</p>'
    '<p><img src="/tiny.gif" width="16" height="16"> tracking pixel text here.</p>'
    f'<p><img src="/hero.jpg" width="640" height="480"> {LOREM2}</p>'
    '<p><img src="/mid.png" width="250" height="180"> a medium image.</p>'
    '<embed src="http://www.youtube.com/v/abc123" width="400"></embed>'
    '<embed src="http://ads.example.com/flash" width="400"></embed>'
    f"<p>{LOREM3}</p></div>",
)

FIXTURES["iframe-video"] = _page(
    "An iframe player that should survive",
    f'<div><p>{LOREM}</p><iframe src="http://vimeo.com/video/99"></iframe>'
    f'<iframe src="http://evil.example.com/frame"></iframe><p>{LOREM2}</p></div>',
)

FIXTURES["img-anchor"] = _page(
    "The disappearing linked image trick",
    f'<div><p>{LOREM}</p><a href="/full/photo.jpg"><img src="/thumb/photo.jpg" width="600" height="400"></a>'
    f"<p>{LOREM2}</p></div>",
)

FIXTURES["paginated"] = _page(
    "A long story split across pages",
    f'<div class="article-page"><p>{LOREM}</p><p>{LOREM2}</p></div>'
    '<div class="pagination"><a href="/story/part-1">1</a> '
    '<a href="/story/part-2">2</a> <a href="/story/part-3">3</a> '
    '<a href="/story/part-2">Next &gt;</a></div>',
)

FIXTURES["prev-next"] = _page(
    "Navigating between chapters of the serial",
    f"<div><p>{LOREM}</p><p>{LOREM2}</p></div>"
    '<div><a href="/ch/2">&laquo; Previous chapter 2</a>'
    '<a href="/ch/4">Next chapter 4 &raquo;</a></div>',
)

FIXTURES["quirk-regex"] = _page(
    "Alternating commas and the stateful regex",
    "<div><p>alpha, beta gamma delta epsilon zeta eta theta one</p>"
    "<p>iota, kappa lambda mu nu xi omicron pi rho sigma two</p>"
    "<p>tau, upsilon phi chi psi omega alef bet gimel three</p>"
    f"<p>{LOREM}</p></div>",
)

FIXTURES["quirk-brhr"] = _page(
    "Line breaks and rules as real elements",
    f"<div><p>{LOREM}<br><br>{LOREM2}</p><hr><p>{LOREM3}</p></div>",
)

FIXTURES["quirk-protoname"] = _page(
    "Tags named after object prototype members",
    f"<div><p>{LOREM}</p><toString>hidden text inside</toString><p>{LOREM2}</p></div>",
)

FIXTURES["entities-whitespace"] = _page(
    "Caf&eacute; society &amp; the “quoted” life",
    f"<div><p>Café &amp; friends say &lt;hello&gt; — with   runs\n\n"
    f"of\t whitespace, {LOREM}</p><p>{LOREM2}</p></div>",
)

FIXTURES["no-candidate"] = _page("Tiny page", "<div><p>Too short.</p></div>")

FIXTURES["sibling-merge"] = _page(
    "Siblings joining the chosen candidate",
    f'<div><div class="post"><p>{LOREM}</p><p>{LOREM2}</p></div>'
    f'<p>{LOREM3}</p><p>Short trailing note.</p>'
    f'<div class="post"><p>A sibling with the same class, {LOREM}</p></div>'
    f"<div><a href=\"/more\">more stuff</a></div></div>",
)

FIXTURES["table-article"] = _page(
    "Old-school table layout story page",
    f"<table><tbody><tr><td>{LOREM} {LOREM2}</td>"
    f'<td><a href="/n1">nav one</a> <a href="/n2">nav two</a></td></tr></tbody></table>',
)

FIXTURES["deep-nesting"] = _page(
    "Single child chains descend deeply",
    f'<div><div><div id="content"><p>{LOREM}</p><p>{LOREM2}</p><p>{LOREM3}</p></div></div></div>',
)

FIXTURES["implied-closes"] = _page(
    "Paragraphs closed by the parser itself",
    f"<div><p>{LOREM}<p>{LOREM2}<ul><li>item one alpha<li>item two beta</ul><p>{LOREM3}</div>",
)


def fixture_events() -> dict[str, list]:
    from kgrecrun.extract.events import html_to_events

    return {name: html_to_events(html) for name, html in FIXTURES.items()}

# --- round-1 additions: branches without a dedicated fixture ---

# img size priors (readabilitySAX.js:436-449): tiny (≤32) → renamed to
# script INTENDING a drop that never happens (quirk Q10, SURVEY §2.5 —
# the skip check reads the close-event tagName, not the renamed name,
# so it serializes as <script src=...>); ≥390/≥290 → parent +20;
# ≥200/≥150 → parent +5
FIXTURES["img-size-priors"] = _page(
    "Pictures of every size in one story tonight",
    '<div id="story"><p>' + LOREM + '</p>'
    '<p><img src="/tiny.png" width="16" height="16"> tiny icon stays out.</p>'
    '<p><img src="/hero.jpg" width="640" height="420"> hero image boosts.</p>'
    '<p><img src="/mid.jpg" width="250" height="180"> medium image helps.</p>'
    "<p>" + LOREM + "</p></div>",
)

# Q7+Q10: width=10 renames to script; the later height=500 no longer
# hits the img branch (no +20 for the parent despite being ≥290) and is
# stored as a generic attribute on the surviving renamed element
FIXTURES["img-rename-midattrs"] = _page(
    "The image that changed its mind mid parse",
    '<div id="a"><p>' + LOREM + '</p>'
    '<p><img width="10" height="500" src="/x.png"> renamed, not removed.</p>'
    "<p>" + LOREM + "</p></div>",
)

# Q4: JS truncating split(sep, limit) in the title heuristics — the
# kept part has exactly 4 words, so the ≥5-word test fails and the
# ORIGINAL title must win
FIXTURES["title-split-limit"] = _page(
    "Four words exactly here | Long Site Name Goes On",
    '<div id="m"><p>' + LOREM + "</p><p>" + LOREM + "</p></div>",
)

# pagination number scoring (readabilitySAX.js:388-394): +(10-n) for
# page number n<10, -10 for n==1, parseInt prefix handling ("2b" → 2)
FIXTURES["pagenum-links"] = _page(
    "A story spread over many numbered pages",
    '<div id="s"><p>' + LOREM + "</p><p>" + LOREM + "</p></div>"
    '<div class="pagination">'
    '<a href="/story/page1">1</a> <a href="/story/page2">2</a> '
    '<a href="/story/page3">3</a> <a href="/story/page9">9</a> '
    '<a href="/story/page12">12</a> <a href="/story/page2b">2b</a>'
    "</div>",
)

# comma scoring: heavy comma paragraphs drive the +commas term of the
# paragraph score (readabilitySAX.js:572-577) with Q2's stateful regex
# alternating across text nodes
FIXTURES["comma-heavy"] = _page(
    "Commas, commas, everywhere, in this story",
    '<div id="c"><p>one, two, three, four, five, six, seven, eight.</p>'
    "<p>alpha beta gamma delta epsilon zeta eta theta.</p>"
    "<p>red, orange, yellow, green, blue, indigo, violet, again.</p></div>",
)

# stripUnlikelyCandidates (readabilitySAX.js:497-501, skipLevel 0 only):
# class "share-sidebar" matches re_unlikelyCandidates and not
# re_okMaybeItsACandidate → dropped at skip0, kept at skip1+; class
# "social-column" ALSO matches unlikely ("social") but "column" matches
# re_okMaybeItsACandidate so it survives at every level
FIXTURES["unlikely-candidates"] = _page(
    "Opinions differ on the harbour plan",
    '<div id="body"><p>' + LOREM + "</p><p>" + LOREM2 + "</p>"
    '<div class="share-sidebar"><p>Share this story with friends, neighbours, '
    "colleagues, and family, via any network, today, tomorrow, always.</p></div>"
    '<div class="social-column"><p>Readers also discussed the plan at length, '
    "with comments, replies, and reactions, throughout the week.</p></div>"
    "</div>",
)
