"""Deterministic web-page synthesizer: wraps a plain document text in
realistic boilerplate chrome (nav menus, ads, sidebars, comments,
footers) so the main-content extractor (functions/htmlx.py) can be
exercised — and oracle-checked — without external data.

Everything is a pure function of (doc_id, text): the same inputs always
render the same page, so ``extract(wrap(text)) == normalize(text)`` is a
DuckDB-expressible identity the driver can hash. Four templates vary the
chrome order and volume; junk text comes from a per-doc LCG so no two
pages share boilerplate strings (a dedup-style extractor can't cheat by
frequency).
"""

from __future__ import annotations

import html as _html

_JUNK_WORDS = (
    "home about contact login signup subscribe trending popular latest "
    "sports politics tech culture shop deals sale offer free shipping "
    "newsletter privacy terms careers advertise sitemap help faq press "
    "categories tags archive author share tweet like follow more"
).split()

_AD_LINES = (
    "Buy now and save 50% today only!",
    "Limited offer: free shipping on all orders.",
    "Sign up for our newsletter and win prizes.",
    "Hot deal: premium membership half price.",
    "Download our app for exclusive discounts.",
)

_COMMENTS = (
    "great post thanks",
    "totally agree with this",
    "first!",
    "interesting read, bookmarked",
    "can you do a follow up",
)


class _Lcg:
    """Tiny deterministic PRNG (numpy-free so wrapping stays cheap and
    stable across library versions)."""

    def __init__(self, seed: int):
        self.s = (seed * 6364136223846793005 + 1442695040888963407) % (1 << 64)

    def next(self, n: int) -> int:
        self.s = (self.s * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        return (self.s >> 33) % n


def _nav(rng: _Lcg, n: int) -> str:
    items = "".join(
        f'<li><a href="/{_JUNK_WORDS[rng.next(len(_JUNK_WORDS))]}">'
        f"{_JUNK_WORDS[rng.next(len(_JUNK_WORDS))].title()}</a></li>"
        for _ in range(n)
    )
    return f'<nav class="top-menu"><ul>{items}</ul></nav>'


def _ads(rng: _Lcg, n: int) -> str:
    blocks = "".join(
        f'<div class="ad-banner"><a href="/promo{rng.next(999)}">'
        f"{_AD_LINES[rng.next(len(_AD_LINES))]}</a></div>"
        for _ in range(n)
    )
    return f'<div class="ads">{blocks}</div>'


def _sidebar(rng: _Lcg) -> str:
    links = "".join(
        f'<a href="/tag/{_JUNK_WORDS[rng.next(len(_JUNK_WORDS))]}">'
        f"{_JUNK_WORDS[rng.next(len(_JUNK_WORDS))]}</a> "
        for _ in range(12)
    )
    return (
        '<div class="sidebar widget"><h3>Related</h3>'
        f"<p>{links}</p></div>"
    )


def _comments(rng: _Lcg, n: int) -> str:
    items = "".join(
        f'<div class="comment"><span class="byline">user{rng.next(9999)}'
        f"</span><p>{_COMMENTS[rng.next(len(_COMMENTS))]}</p></div>"
        for _ in range(n)
    )
    return f'<section class="comments">{items}</section>'


def _chunk_words(text: str, k: int) -> list[str]:
    w = text.split()
    return [" ".join(w[i:i + k]) for i in range(0, len(w), k)] if w else []


def wrap_html(doc_id: int, text: str, with_images: bool = True) -> str:
    """Render ``text`` as the main content of a boilerplate-laden page.
    Deterministic in (doc_id, text); template chosen by doc_id % 4.

    The extractor contract: ``extract_main_text(wrap_html(i, t))``
    equals whitespace-normalized ``t`` (media spans are interleaved but
    don't contribute text)."""
    rng = _Lcg(doc_id)
    tpl = doc_id % 4
    paras = _chunk_words(text, 10 + tpl * 3)
    body_parts: list[str] = []
    for j, p in enumerate(paras):
        body_parts.append(f"<p>{_html.escape(p)}</p>")
        if with_images and doc_id % 3 == 0 and j == len(paras) // 2:
            body_parts.append(f'<img src="img://{doc_id}/{j}" alt="">')
    main = (
        f'<article class="post-body"><h1>{_html.escape(f"Story {doc_id}")}'
        f"</h1>{''.join(body_parts)}</article>"
    )
    n_words = len(text.split())
    stats_table = (
        '<div class="widget stats"><table>'
        "<tr><th>k</th><th>v</th></tr>"
        f"<tr><td>id</td><td>{doc_id}</td></tr>"
        f"<tr><td>words</td><td>{n_words}</td></tr>"
        f"<tr><td>tpl</td><td>{tpl}</td></tr>"
        "</table></div>"
    )
    chrome_head = _nav(rng, 6 + tpl) + _ads(rng, 1 + tpl % 2)
    chrome_side = _sidebar(rng) + stats_table
    chrome_tail = _comments(rng, 2 + tpl) + (
        '<footer class="site-footer"><p>'
        + " ".join(_JUNK_WORDS[rng.next(len(_JUNK_WORDS))] for _ in range(8))
        + "</p></footer>"
    )
    if tpl == 0:
        body = chrome_head + main + chrome_side + chrome_tail
    elif tpl == 1:
        body = chrome_head + chrome_side + main + chrome_tail
    elif tpl == 2:
        body = _ads(rng, 2) + chrome_head + main + chrome_tail + chrome_side
    else:
        body = chrome_head + '<div class="wrap">' + chrome_side + main + "</div>" + chrome_tail
    # deterministic head metadata (harvested by functions/metax.py):
    # og:title mirrors the H1, description = first 8 body words,
    # JSON-LD carries type/headline/wordCount
    words = text.split()
    desc = _html.escape(" ".join(words[:8]))
    ld = ('{"@type": "Article", "headline": "Story %d", "wordCount": %d}'
          % (doc_id, n_words))
    return (
        "<!DOCTYPE html><html><head><title>"
        f"Story {doc_id}</title>"
        f'<meta property="og:title" content="Story {doc_id}">'
        f'<meta name="description" content="{desc}">'
        f'<script type="application/ld+json">{ld}</script>'
        "<script>var x=1;</script>"
        "<style>.ads{color:red}</style></head>"
        f"<body>{body}</body></html>"
    )
