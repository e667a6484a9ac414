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


def test_frontier_schedule_per_host_rounds(ray_session):
    """Urls rank 1..n within their host ordered by url; rounds advance
    every per_host entries; hostless entries group under '' instead of
    vanishing; partitioning-invariant."""
    import ray.data

    from kgrecrun.extract.robots import frontier_schedule

    urls = ([f"https://a.example/p{i:02d}" for i in range(5)]
            + [f"https://b.example/q{i:02d}" for i in range(2)]
            + ["not a url"])
    t = pa.table({"url": pa.array(urls, pa.string())})
    outs = []
    for parts in (1, 3):
        ds = ray.data.from_arrow(t).repartition(parts)
        df = (frontier_schedule(ds, per_host=2).to_pandas()
              .sort_values(["host", "rn"]).reset_index(drop=True))
        outs.append(df)
    assert outs[0].equals(outs[1])
    df = outs[0]
    assert df["host"].tolist() == ([""] + ["a.example"] * 5
                                   + ["b.example"] * 2)
    a = df[df["host"] == "a.example"]
    assert a["rn"].tolist() == [1, 2, 3, 4, 5]
    assert a["fetch_round"].tolist() == [1, 1, 2, 2, 3]
    b = df[df["host"] == "b.example"]
    assert b["fetch_round"].tolist() == [1, 1]
    assert df[df["host"] == ""]["rn"].tolist() == [1]
