"""RFC 9309 robots engine: group selection, longest-match, wildcards,
anchors, tie-breaking, and the crawl-filter pipeline stage."""

from dup_ocropy_ray.functions import robotsx
from dup_ocropy_ray.sources.urlgen import robots_txt


BASIC = """
# comment line
User-agent: smartbot
Disallow: /a/
Allow: /a/news/

Sitemap: https://x.com/sitemap.xml

User-agent: *
Crawl-delay: 2
Disallow: /track/
Disallow: /post/*/
Disallow: /*.pdf$
"""


def test_group_selection_named_hides_star():
    r = robotsx.parse_robots(BASIC)
    smart = robotsx.Matcher(r, "smartbot/1.0")
    star = robotsx.Matcher(r, "graftbot/0.1")
    # named group: /a/ denied unless the longer Allow matches
    assert not smart.is_allowed("/a/x")
    assert smart.is_allowed("/a/news/5")
    # named match HIDES the * group entirely — /track/ is fine for smartbot
    assert smart.is_allowed("/track/5")
    # '*' group for everyone else
    assert not star.is_allowed("/track/5")
    assert star.is_allowed("/a/x")


def test_wildcard_and_anchor_patterns():
    r = robotsx.parse_robots(BASIC)
    m = robotsx.Matcher(r, "other")
    assert not m.is_allowed("/post/12/")      # /post/*/ needs the slash
    assert m.is_allowed("/post/12")
    assert not m.is_allowed("/docs/file.pdf")  # anchored
    assert m.is_allowed("/docs/file.pdfx")     # $ must not match mid-path


def test_longest_match_tie_and_empty_disallow():
    txt = """User-agent: *
Disallow: /dir/
Allow: /dir/open
Disallow:
"""
    m = robotsx.Matcher(robotsx.parse_robots(txt), "bot")
    assert not m.is_allowed("/dir/secret")
    assert m.is_allowed("/dir/open/x")   # longer Allow wins
    assert m.is_allowed("/other")        # empty Disallow matches nothing
    # equal length: Allow wins the tie
    tie = robotsx.Matcher(robotsx.parse_robots(
        "User-agent: *\nDisallow: /q/\nAllow: /q/\n"), "bot")
    assert tie.is_allowed("/q/x")


def test_metadata_and_garbage_tolerance():
    r = robotsx.parse_robots(BASIC)
    assert r.sitemaps == ["https://x.com/sitemap.xml"]
    assert r.crawl_delays.get("*") == 2.0
    # garbage never crashes, returns allow-all
    for junk in ("", "404 not found", "<html>oops</html>", "Disallow: /x"):
        assert robotsx.is_allowed(junk, "bot", "/anything")


def test_synthetic_rules_match_expected_decisions():
    # odd source: /articles/ denied except the /articles/202 override
    modd = robotsx.Matcher(robotsx.parse_robots(robots_txt("src1")), "graftbot")
    assert not modd.is_allowed("/articles/44")
    assert modd.is_allowed("/articles/2021")
    meven = robotsx.Matcher(robotsx.parse_robots(robots_txt("src2")), "graftbot")
    assert meven.is_allowed("/articles/44")
    for m in (modd, meven):
        assert not m.is_allowed("/track/9")
        assert not m.is_allowed("/post/9/")
        assert m.is_allowed("/a/news/9")


def test_filter_stage_counts(ray_session):
    import ray.data as rd

    from dup_ocropy_ray.pipelines.curate import robots_filter

    ds = rd.read_parquet("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id", "source"])
    out = robots_filter(ds).to_pandas()
    assert len(out) == ds.count()
    t = out["doc_id"] % 6
    assert (~out.loc[t.isin([2, 3]), "allowed"]).all()
    assert out.loc[t.isin([1, 4, 5]), "allowed"].all()
