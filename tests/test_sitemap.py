"""Sitemap XML synthesis + parsing (functions/sitemapx.py)."""

from dup_ocropy_ray.functions.sitemapx import (
    lastmod_for,
    parse_sitemap,
    render_sitemap,
    url_for,
)


def test_round_trip_order_and_fields():
    xml = render_sitemap(3, [10, 2, 7])
    rows = parse_sitemap(xml)
    assert [r["url"] for r in rows] == [url_for(3, d) for d in (2, 7, 10)]
    assert rows[0]["lastmod"] == lastmod_for(2) == "2025-01-03"
    assert rows[0]["priority"] == "0.4"  # (2*37) % 10


def test_entity_decoding_in_loc():
    rows = parse_sitemap(render_sitemap(1, [5]))
    assert rows[0]["url"].endswith("?ref=a&b=1")  # &amp; decoded back


def test_lastmod_arithmetic_matches_calendar():
    assert lastmod_for(0) == "2025-01-01"
    assert lastmod_for(31) == "2025-02-01"
    assert lastmod_for(364) == "2025-12-31"
    assert lastmod_for(365) == "2025-01-01"  # wraps


def test_malformed_and_foreign_xml():
    assert parse_sitemap("") == []
    assert parse_sitemap("<urlset><url><loc>x</loc>") == []  # unclosed
    assert parse_sitemap("<rss><item/></rss>") == []  # wrong root
    # namespace-agnostic + url without loc skipped
    xml = ('<ns:urlset xmlns:ns="urn:x"><ns:url><ns:lastmod>2025-01-01'
           "</ns:lastmod></ns:url><ns:url><ns:loc> u </ns:loc></ns:url>"
           "</ns:urlset>")
    rows = parse_sitemap(xml)
    assert len(rows) == 1 and rows[0]["url"] == "u"
