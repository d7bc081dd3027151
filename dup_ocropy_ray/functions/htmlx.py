"""Main-content extraction from HTML: a from-scratch DOM builder on the
stdlib ``html.parser`` plus density-based boilerplate stripping.

The heuristics follow the published boilerplate-detection literature
(Kohlschuetter et al., "Boilerplate Detection using Shallow Text
Features", WSDM 2010) and the readability family of DOM scorers: score
block-level candidates by text mass and punctuation density, discount by
link density, apply tag/class prior lists, pick the best container, and
emit its block texts in document order. No reference-engine counterpart
exists (ocropy is image-side extraction); this is the HTML leg of the
north rule's main-content extraction pipeline.

Pure scalar kernel: one HTML string in, spans out. Distribution happens
in ``pipelines/extract.py`` (stateless ``map_batches`` over pruned
columns — per-doc parse, no shuffle, scale-safe at 100 TB).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser

# Elements whose subtree is never content.
_KILL_TAGS = frozenset(
    "script style noscript template nav header footer aside form iframe "
    "svg button select option label input textarea".split()
)
# Void elements (no closing tag).
_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track "
    "wbr".split()
)
# Block-level text carriers emitted as individual spans.
_TEXT_BLOCKS = frozenset("p h1 h2 h3 h4 h5 h6 li pre blockquote td dd dt".split())
# Containers eligible as the main-content candidate.
_CANDIDATE_TAGS = frozenset("div article section main body td".split())

_NEGATIVE_RE = re.compile(
    r"nav|menu|footer|foot|sidebar|side-bar|advert|\bad\b|ads|banner|promo|"
    r"sponsor|comment|share|social|breadcrumb|related|widget|cookie|popup|"
    r"masthead|byline|meta|pagination|shopping|legal",
    re.I,
)
_POSITIVE_RE = re.compile(
    r"article|\bbody\b|content|\bmain\b|post|story|text|entry|blog|page",
    re.I,
)
_WS_RE = re.compile(r"\s+")


class Node:
    """Minimal DOM element. Children are Nodes or plain strings."""

    __slots__ = ("tag", "attrs", "children", "parent")

    def __init__(self, tag: str, attrs=None, parent=None):
        self.tag = tag
        self.attrs = dict(attrs or {})
        self.children: list = []
        self.parent = parent

    def class_id(self) -> str:
        return f"{self.attrs.get('class', '')} {self.attrs.get('id', '')}"

    def iter(self):
        """Depth-first pre-order over element nodes."""
        stack = [self]
        while stack:
            n = stack.pop()
            yield n
            stack.extend(c for c in reversed(n.children) if isinstance(c, Node))


class _DomBuilder(HTMLParser):
    """Tolerant tree builder: unclosed tags pop to the nearest match,
    stray end tags are ignored (real-web HTML is never well-formed)."""

    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = Node("#root")
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        node = Node(tag, attrs, parent=self._stack[-1])
        self._stack[-1].children.append(node)
        if tag not in _VOID_TAGS:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(Node(tag, attrs, parent=self._stack[-1]))

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        if data and not data.isspace():
            self._stack[-1].children.append(data)


def parse_html(html: str) -> Node:
    b = _DomBuilder()
    try:
        b.feed(html)
        b.close()
    except AssertionError:
        # stdlib _markupbase asserts (not raises HTMLParseError) on some
        # malformed declarations, e.g. '<![;' — keep whatever DOM was
        # built up to the bad byte (tolerant-parser contract: garbage
        # never crashes an extraction partition)
        pass
    return b.root


def _clean_text(parts: list[str]) -> str:
    return _WS_RE.sub(" ", " ".join(parts)).strip()


def _collect(node: Node, texts: list[str], links: list[str]) -> None:
    """Gather text under ``node``, skipping kill-list subtrees; link
    text is ALSO recorded separately for link-density scoring."""
    for c in node.children:
        if isinstance(c, str):
            texts.append(c)
        elif c.tag in _KILL_TAGS:
            continue
        else:
            if c.tag == "a":
                sub: list[str] = []
                _collect(c, sub, links)
                links.extend(sub)
                texts.extend(sub)
            else:
                _collect(c, texts, links)


def _node_text_and_linkdensity(node: Node) -> tuple[str, float]:
    texts: list[str] = []
    links: list[str] = []
    _collect(node, texts, links)
    text = _clean_text(texts)
    if not text:
        return "", 0.0
    ltext = _clean_text(links)
    return text, min(1.0, len(ltext) / max(1, len(text)))


def score_candidate(node: Node) -> float:
    """Boilerpipe-style shallow-feature score: capped text mass plus
    punctuation count, discounted by link density, nudged by class/id
    priors. Higher = more likely the main-content container."""
    text, link_density = _node_text_and_linkdensity(node)
    if len(text) < 25:
        return 0.0
    commas = text.count(",") + text.count(".") + text.count(";")
    score = min(len(text) / 10.0, 300.0) + commas
    score *= 1.0 - link_density
    cid = node.class_id()
    if _NEGATIVE_RE.search(cid):
        score *= 0.2
    if _POSITIVE_RE.search(cid):
        score *= 1.5
    return score


def _best_candidate(root: Node) -> Node | None:
    best, best_score = None, 0.0
    for n in root.iter():
        if n.tag not in _CANDIDATE_TAGS:
            continue
        if any(p.tag in _KILL_TAGS for p in _ancestors(n)):
            continue
        s = score_candidate(n)
        # strictly-greater keeps the OUTERMOST of tied nested candidates
        # (pre-order visits parents first)
        if s > best_score:
            best, best_score = n, s
    return best


def _ancestors(node: Node):
    p = node.parent
    while p is not None:
        yield p
        p = p.parent


def extract_spans(html: str) -> list[dict]:
    """Extract the main content of ``html`` as an ordered span list
    ``[{kind, text, media_ref, offset}, ...]`` — text spans are the
    candidate's block texts in document order; ``<img src>`` inside the
    main content become kind='media' spans (interleaved, north-rule
    span-sequence contract)."""
    root = parse_html(html)
    cand = _best_candidate(root)
    if cand is None:
        # text-light pages (e.g. media-only documents) never reach the
        # 25-char scoring floor: fall back to <body> (readability's own
        # fallback) — the kill/negative-class/link-density filters below
        # still strip the chrome
        cand = next((n for n in root.iter() if n.tag == "body"), root)
    spans: list[dict] = []

    def emit_text(node: Node) -> None:
        texts: list[str] = []
        links: list[str] = []
        _collect(node, texts, links)
        text = _clean_text(texts)
        if not text:
            return
        ltext = _clean_text(links)
        # a block that is mostly link text is navigation, not content
        if len(ltext) / max(1, len(text)) > 0.5:
            return
        spans.append({"kind": "text", "text": text,
                      "media_ref": None, "offset": len(spans)})

    def walk(node: Node) -> None:
        for c in node.children:
            if isinstance(c, str):
                t = _clean_text([c])
                if t:
                    spans.append({"kind": "text", "text": t,
                                  "media_ref": None, "offset": len(spans)})
                continue
            if c.tag in _KILL_TAGS:
                continue
            if _NEGATIVE_RE.search(c.class_id()):
                continue
            if c.tag == "img":
                src = c.attrs.get("src")
                if src:
                    spans.append({"kind": "media", "text": None,
                                  "media_ref": src, "offset": len(spans)})
            elif c.tag in _TEXT_BLOCKS:
                emit_text(c)
                for d in c.iter():
                    if d is not c and d.tag == "img" and d.attrs.get("src"):
                        spans.append({"kind": "media", "text": None,
                                      "media_ref": d.attrs["src"],
                                      "offset": len(spans)})
            else:
                walk(c)

    walk(cand)
    return spans


def extract_main_text(html: str) -> str:
    """Main content as one string: text spans joined by single spaces
    (media spans skipped)."""
    return " ".join(
        s["text"] for s in extract_spans(html) if s["kind"] == "text"
    )


def extract_tables(html: str) -> list[list[list[str]]]:
    """Structured-data extraction: all <table>s not under kill-list
    subtrees, each as rows (tr) of cell texts (td/th, whitespace-
    normalized). Unlike the main-content path, class priors do NOT
    exclude a table — tables are data, boilerplate-ness is the caller's
    call. Rows of nested tables are reported under the OUTERMOST table
    only."""
    root = parse_html(html)
    out: list[list[list[str]]] = []
    seen: set[int] = set()
    for n in root.iter():
        if n.tag != "table" or id(n) in seen:
            continue
        if any(p.tag in _KILL_TAGS for p in _ancestors(n)):
            continue
        for d in n.iter():
            if d.tag == "table":
                seen.add(id(d))
        rows: list[list[str]] = []
        for tr in n.iter():
            if tr.tag != "tr":
                continue
            cells: list[str] = []
            for c in tr.children:
                if isinstance(c, Node) and c.tag in ("td", "th"):
                    texts: list[str] = []
                    links: list[str] = []
                    _collect(c, texts, links)
                    cells.append(_clean_text(texts))
            if cells:
                rows.append(cells)
        if rows:
            out.append(rows)
    return out


# ----------------------------------------------- jusText block classifier

# Inline elements whose text merges into the enclosing block; every
# other element boundary starts a new block (jusText's paragraph
# segmentation rule).
_INLINE_TAGS = frozenset(
    "a b i u em strong span small sub sup code abbr cite q s tt font "
    "mark time label".split()
)


def segment_blocks(html: str) -> list[dict]:
    """jusText-style paragraph segmentation: walk the DOM, cutting a new
    block at every non-inline element boundary; inline tags (a, b,
    span, …) merge into the enclosing block. Kill-list subtrees
    (script/style/…) are dropped entirely. Each block carries its text
    and link density."""
    root = parse_html(html)
    blocks: list[dict] = []
    cur_text: list[str] = []
    cur_link: list[str] = []

    def flush():
        text = _clean_text(cur_text)
        if text:
            ltext = _clean_text(cur_link)
            blocks.append({
                "text": text,
                "link_density": min(1.0, len(ltext) / max(1, len(text))),
            })
        cur_text.clear()
        cur_link.clear()

    def walk(node: Node, in_link: bool) -> None:
        for c in node.children:
            if isinstance(c, str):
                cur_text.append(c)
                if in_link:
                    cur_link.append(c)
            elif c.tag in _KILL_TAGS:
                continue
            elif c.tag in _INLINE_TAGS:
                walk(c, in_link or c.tag == "a")
            else:
                flush()
                walk(c, in_link)
                flush()

    walk(root, False)
    flush()
    return blocks


def classify_context_free(blocks: list[dict], length_low: int = 40,
                          length_high: int = 150,
                          max_link_density: float = 0.2) -> list[str]:
    """Context-free jusText classes: bad if link density exceeds
    ``max_link_density``; short if under ``length_low`` chars; neargood
    under ``length_high``; good otherwise."""
    out = []
    for b in blocks:
        if b["link_density"] > max_link_density:
            out.append("bad")
        elif len(b["text"]) < length_low:
            out.append("short")
        elif len(b["text"]) < length_high:
            out.append("neargood")
        else:
            out.append("good")
    return out


def justext_classify(blocks: list[dict], length_low: int = 40,
                     length_high: int = 150,
                     max_link_density: float = 0.2) -> list[str]:
    """jusText classification (Pomikálek 2011) in language-independent
    mode (empty stoplist — the stopword-density tests are skipped, as
    the published algorithm specifies for stopless languages).

    Context-free pass via :func:`classify_context_free`.
    Context-sensitive (simplified, documented): each doubtful block
    looks at its nearest non-doubtful neighbours — good on both sides
    -> good, bad on both sides -> bad; on a good/bad boundary a
    neargood joins the good side and a short joins the bad side.
    Returns the final class per block."""
    ctx = classify_context_free(blocks, length_low, length_high,
                                max_link_density)
    n = len(ctx)
    # nearest non-doubtful class on each side ('bad' beyond the edges,
    # matching jusText's implicit page-boundary rule)
    prev_edge = ["bad"] * n
    last = "bad"
    for i in range(n):
        prev_edge[i] = last
        if ctx[i] in ("good", "bad"):
            last = ctx[i]
    next_edge = ["bad"] * n
    last = "bad"
    for i in range(n - 1, -1, -1):
        next_edge[i] = last
        if ctx[i] in ("good", "bad"):
            last = ctx[i]

    final = []
    for i, c in enumerate(ctx):
        if c in ("good", "bad"):
            final.append(c)
        elif prev_edge[i] == "good" and next_edge[i] == "good":
            final.append("good")
        elif prev_edge[i] == "bad" and next_edge[i] == "bad":
            final.append("bad")
        else:  # good/bad boundary: neargood leans good, short leans bad
            final.append("good" if c == "neargood" else "bad")
    return final


def justext_stats(html: str) -> dict:
    """Per-page jusText summary: context-free class counts, final
    good-block count and the good-block text mass."""
    blocks = segment_blocks(html)
    final = justext_classify(blocks)
    cf = classify_context_free(blocks)
    return {
        "n_blocks": len(blocks),
        "n_bad": cf.count("bad"),
        "n_short": cf.count("short"),
        "n_neargood": cf.count("neargood"),
        "n_good": cf.count("good"),
        "n_good_final": final.count("good"),
        "good_chars": sum(len(b["text"]) for b, c in zip(blocks, final)
                          if c == "good"),
    }


def extract_links(html: str) -> list[dict]:
    """All hyperlinks of the page, in document order — the crawl
    frontier / link-graph view, so chrome links (nav, ads, sidebar)
    are INCLUDED; only non-content containers (script/style/template)
    can't contain anchors anyway. Returns [{href, text}] with
    whitespace-normalized anchor text."""
    out: list[dict] = []
    for n in parse_html(html).iter():
        if n.tag == "a":
            href = n.attrs.get("href")
            if not href:
                continue
            texts: list[str] = []
            _collect(n, texts, [])
            out.append({"href": href, "text": _clean_text(texts)})
    return out
