"""robots.txt (RFC 9309) parser + frontier-gate tests
(kgrecrun/extract/robots.py)."""

import pyarrow as pa
import pytest

from kgrecrun.extract.robots import (parse_robots, robots_allowed,
                                     robots_filter)

BASIC = """\
User-agent: other-bot
Disallow: /

User-agent: kgrecrun
Disallow: /private/
Allow: /private/public-*
Crawl-delay: 3
# a comment line
Sitemap: https://a.example/sitemap.xml
"""


def test_group_selection_prefers_specific_agent():
    rules = parse_robots(BASIC, agent="kgrecrun")
    assert (False, "/private/") in rules
    assert (True, "/private/public-*") in rules
    # the other-bot group's blanket deny must not leak in
    assert (False, "/") not in rules


def test_star_fallback_when_agent_unknown():
    text = "User-agent: *\nDisallow: /x/\n\nUser-agent: foo\nDisallow: /\n"
    rules = parse_robots(text, agent="kgrecrun")
    assert rules == [(False, "/x/")]


def test_stacked_agent_lines_share_one_group():
    text = "User-agent: a\nUser-agent: kgrecrun\nDisallow: /y/\n"
    assert parse_robots(text, agent="kgrecrun") == [(False, "/y/")]


def test_longest_match_and_allow_tie():
    rules = parse_robots(BASIC, agent="kgrecrun")
    assert robots_allowed("/private/secret", rules) is False
    assert robots_allowed("/private/public-1", rules) is True
    assert robots_allowed("/elsewhere", rules) is True
    # exact tie between allow and disallow: allow wins (RFC 9309)
    tie = [(False, "/a/"), (True, "/a/")]
    assert robots_allowed("/a/x", tie) is True


def test_wildcard_and_anchor():
    rules = [(False, "/*/art-*7$")]
    assert robots_allowed("/world/art-17", rules) is False
    assert robots_allowed("/world/art-7", rules) is False
    assert robots_allowed("/world/art-70", rules) is True
    assert robots_allowed("/art-17", rules) is True  # needs two segments


def test_empty_disallow_allows_everything():
    rules = parse_robots("User-agent: *\nDisallow:\n", agent="kgrecrun")
    assert robots_allowed("/anything", rules) is True


def test_missing_or_empty_robots_allows():
    assert parse_robots("", agent="kgrecrun") == []
    assert robots_allowed("/x", []) is True


def test_frontier_gate_through_ray(ray_session):
    import ray.data

    robots = pa.table({
        "host": ["a.example"],
        "robots_txt": ["User-agent: *\nDisallow: /deny/\n"],
    })
    frontier = ray.data.from_items([
        {"url": "https://a.example/deny/x"},
        {"url": "https://a.example/ok/x"},
        {"url": "https://B.Example/deny/x"},   # no robots row: allowed
        {"url": "not a url"},                  # passthrough: allowed
    ])
    got = (robots_filter(frontier, robots).to_pandas()
           .set_index("url")["allowed"].to_dict())
    assert got == {"https://a.example/deny/x": 0,
                   "https://a.example/ok/x": 1,
                   "https://B.Example/deny/x": 1,
                   "not a url": 1}
