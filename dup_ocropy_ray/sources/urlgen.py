"""Deterministic URL synthesizer: gives every document a messy but
reproducible URL (pure function of (doc_id, source)) so the URL
curation kernels (functions/urlx.py) can be exercised — and
oracle-checked — without external data. Six templates cover the
normalization hazards: uppercase scheme/host, default and non-default
ports, dot segments, utm_* tracking params, fragments, multi-label
subdomains, and a multi-label public suffix (co.uk).

On a real web corpus the generator is dropped and the stage consumes
the crawl's own ``url`` column.
"""

from __future__ import annotations


def doc_url(doc_id: int, source: str) -> str:
    t = doc_id % 6
    if t == 0:
        return f"https://www.{source}.com/articles/{doc_id}"
    if t == 1:
        return (f"HTTP://{source}.CO.UK:80/a/./b/../news/{doc_id}"
                f"?utm_source=feed&id={doc_id}")
    if t == 2:
        return f"https://blog.{source}.org:443/post/{doc_id}/#sec"
    if t == 3:
        return f"http://ads.{source}.net/track/{doc_id}?utm_campaign=x"
    if t == 4:
        return (f"https://{source}.com:8443/"
                + "x/" * (doc_id % 4) + "page")
    return (f"https://A.B.{source}.COM/a%20b/"
            f"?id=1&utm_medium=m&ref=2")


def robots_txt(source: str) -> str:
    """Deterministic robots.txt for every host of ``source``: a named
    smartbot group (tests group selection — it must hide '*' for that
    agent), a '*' group with prefix / wildcard / anchored rules, and for
    odd-numbered sources an allow-overrides-disallow pair on /articles/
    (longest-match tie-breaking). Pure function of the source string so
    the SQL oracle can replicate every decision."""
    odd = int(source[3:]) % 2 == 1
    lines = [
        f"# synthetic robots for {source}",
        "User-agent: smartbot",
        "Disallow: /a/",
        "Allow: /a/news/",
        "",
        f"Sitemap: https://{source}.com/sitemap.xml",
        "",
        "User-agent: *",
        "Crawl-delay: 2",
        "Disallow: /track/",
        "Disallow: /post/*/",
        "Disallow: /*.pdf$",
    ]
    if odd:
        lines += ["Disallow: /articles/", "Allow: /articles/202"]
    return "\n".join(lines)
