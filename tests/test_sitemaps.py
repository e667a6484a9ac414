"""Sitemap parsing tests (kgrecrun/extract/sitemaps.py)."""

import pyarrow as pa
import pytest

from kgrecrun.extract.sitemaps import (parse_lastmod, parse_sitemap,
                                       render_sitemap, sitemap_frontier)

NS_URLSET = b"""<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url><loc>https://a.example/p1</loc>
       <lastmod>2025-01-02</lastmod>
       <changefreq>daily</changefreq><priority>0.8</priority></url>
  <url><loc>https://a.example/p2</loc>
       <lastmod>2025-01-02T03:04:05Z</lastmod></url>
  <url><loc>https://a.example/p3</loc></url>
</urlset>"""

SITEMAPINDEX = b"""<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>https://a.example/sitemap-a.xml</loc>
           <lastmod>2025-02-03T00:00:00+02:00</lastmod></sitemap>
  <sitemap><loc>https://a.example/sitemap-b.xml</loc></sitemap>
</sitemapindex>"""


def test_urlset_parses_all_fields():
    rows = parse_sitemap(NS_URLSET)
    assert [r["loc"] for r in rows] == [
        "https://a.example/p1", "https://a.example/p2",
        "https://a.example/p3"]
    assert rows[0]["kind"] == "url"
    assert rows[0]["lastmod_us"] == 1735776000_000000  # 2025-01-02 UTC
    assert rows[0]["changefreq"] == "daily"
    assert rows[0]["priority"] == "0.8"
    assert rows[1]["lastmod_us"] == 1735787045_000000
    assert rows[2]["lastmod_us"] is None


def test_namespace_free_document_parses():
    bare = b"<urlset><url><loc>https://b.example/x</loc></url></urlset>"
    assert parse_sitemap(bare)[0]["loc"] == "https://b.example/x"


def test_sitemapindex_yields_nested_references():
    rows = parse_sitemap(SITEMAPINDEX)
    assert [r["kind"] for r in rows] == ["sitemap", "sitemap"]
    # +02:00 offset resolved to UTC epoch
    assert rows[0]["lastmod_us"] == 1738533600_000000

def test_lastmod_forms():
    assert parse_lastmod("2024-06-01") == 1717200000_000000
    assert parse_lastmod("2024-06-01T12:00:00Z") == 1717243200_000000
    assert parse_lastmod("2024-06-01T12:00:00.000007Z") == 1717243200_000007
    assert parse_lastmod(None) is None
    assert parse_lastmod("") is None


def test_malformed_raises():
    with pytest.raises(Exception):
        parse_sitemap(b"<html><body>not a sitemap</body></html>")
    with pytest.raises(Exception):
        parse_sitemap(b"truncated <urlset")


def test_render_parse_roundtrip_exact():
    urls = [f"https://c.example/d/{i}" for i in range(5)]
    ts = [1735689600_000000 + i * 17 for i in range(5)]
    cf = ["daily", "weekly", "monthly", "daily", "weekly"]
    rows = parse_sitemap(render_sitemap(urls, ts, cf))
    assert [r["loc"] for r in rows] == urls
    assert [r["lastmod_us"] for r in rows] == ts
    assert [r["changefreq"] for r in rows] == cf


def test_frontier_stage_through_ray(ray_session):
    import ray.data

    sitemaps = ray.data.from_arrow(pa.table({
        "host": pa.array(["a.example", "b.example"], pa.string()),
        "xml": pa.array([NS_URLSET, SITEMAPINDEX], pa.large_binary()),
    }))
    got = sitemap_frontier(sitemaps).to_pandas().sort_values(
        "loc").reset_index(drop=True)
    assert len(got) == 5
    assert set(got[got["host"] == "a.example"]["kind"]) == {"url"}
    assert set(got[got["host"] == "b.example"]["kind"]) == {"sitemap"}
