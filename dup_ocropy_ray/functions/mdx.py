"""HTML -> Markdown conversion of the extracted main content.

The standard LLM-corpus representation for web documents: after the
density heuristics (functions/htmlx.py) locate the main-content
container, this module renders THAT subtree as GitHub-flavored-ish
Markdown — headings, paragraphs, lists, blockquotes, fenced code,
links, images, pipe tables — instead of flattening it to one string.

Pure scalar kernel (one HTML string in, one Markdown string out);
distribution happens in a stateless ``map_batches`` stage exactly like
the plain-text extractor.  Text content is passed through verbatim (no
Markdown escaping) — the consumer is a training corpus, not a renderer,
and escaping would corrupt the text for the model.
"""

from __future__ import annotations

from .htmlx import (
    _KILL_TAGS,
    _NEGATIVE_RE,
    _WS_RE,
    Node,
    _best_candidate,
    _collect,
    _clean_text,
    parse_html,
)

_HEADINGS = {"h1": 1, "h2": 2, "h3": 3, "h4": 4, "h5": 5, "h6": 6}
_CONTAINERS = frozenset("div article section main body span figure".split())


def _inline(node: Node) -> str:
    """Render inline children: links, emphasis, code; everything else
    collapses to its text."""
    parts: list[str] = []
    for c in node.children:
        if isinstance(c, str):
            parts.append(c)
        elif c.tag in _KILL_TAGS:
            continue
        elif c.tag == "a":
            label = _inline(c)
            href = c.attrs.get("href", "")
            parts.append(f"[{label}]({href})" if label else "")
        elif c.tag in ("strong", "b"):
            t = _inline(c)
            parts.append(f"**{t}**" if t else "")
        elif c.tag in ("em", "i"):
            t = _inline(c)
            parts.append(f"*{t}*" if t else "")
        elif c.tag == "code":
            t = _inline(c)
            parts.append(f"`{t}`" if t else "")
        elif c.tag == "br":
            parts.append(" ")
        elif c.tag == "img":
            src = c.attrs.get("src")
            if src:
                parts.append(f"![{c.attrs.get('alt', '')}]({src})")
        else:
            parts.append(_inline(c))
    return _WS_RE.sub(" ", " ".join(p for p in parts if p)).strip()


def _raw_text(node: Node) -> str:
    """Verbatim text (for <pre>): whitespace preserved."""
    out: list[str] = []
    for c in node.children:
        if isinstance(c, str):
            out.append(c)
        elif isinstance(c, Node) and c.tag not in _KILL_TAGS:
            out.append(_raw_text(c))
    return "".join(out)


def _link_density_ok(node: Node) -> bool:
    texts: list[str] = []
    links: list[str] = []
    _collect(node, texts, links)
    text = _clean_text(texts)
    if not text:
        return False
    return len(_clean_text(links)) / max(1, len(text)) <= 0.5


def _table_block(node: Node) -> str:
    rows: list[list[str]] = []
    for tr in (n for n in node.iter() if n.tag == "tr"):
        cells = [c for c in tr.children
                 if isinstance(c, Node) and c.tag in ("td", "th")]
        if cells:
            rows.append([_inline(c) for c in cells])
    if not rows:
        return ""
    width = max(len(r) for r in rows)
    rows = [r + [""] * (width - len(r)) for r in rows]
    lines = ["| " + " | ".join(rows[0]) + " |",
             "|" + "|".join([" --- "] * width) + "|"]
    lines += ["| " + " | ".join(r) + " |" for r in rows[1:]]
    return "\n".join(lines)


def _render_block(node: Node, blocks: list[str], ordered_depth: int = 0) -> None:
    tag = node.tag
    if tag in _KILL_TAGS or _NEGATIVE_RE.search(node.class_id()):
        return
    if tag in _HEADINGS:
        t = _inline(node)
        if t:
            blocks.append("#" * _HEADINGS[tag] + " " + t)
    elif tag == "p":
        if _link_density_ok(node):
            t = _inline(node)
            if t:
                blocks.append(t)
    elif tag == "img":
        src = node.attrs.get("src")
        if src:
            blocks.append(f"![{node.attrs.get('alt', '')}]({src})")
    elif tag in ("ul", "ol"):
        items: list[str] = []
        n = 0
        for c in node.children:
            if isinstance(c, Node) and c.tag == "li":
                t = _inline(c)
                if t:
                    n += 1
                    items.append(f"{n}. {t}" if tag == "ol" else f"- {t}")
        if items:
            blocks.append("\n".join(items))
    elif tag == "blockquote":
        inner: list[str] = []
        _render_children(node, inner)
        if inner:
            blocks.append("\n".join("> " + ln for b in inner
                                    for ln in b.split("\n")))
    elif tag == "pre":
        t = _raw_text(node).strip("\n")
        if t.strip():
            blocks.append(f"```\n{t}\n```")
    elif tag == "table":
        t = _table_block(node)
        if t:
            blocks.append(t)
    elif tag == "hr":
        blocks.append("---")
    elif tag in _CONTAINERS or tag in ("dl", "dd", "dt", "li"):
        _render_children(node, blocks)
    else:
        # unknown block-ish tag: render its children
        _render_children(node, blocks)


def _render_children(node: Node, blocks: list[str]) -> None:
    buf: list[str] = []  # loose inline runs between block children

    def flush() -> None:
        t = _WS_RE.sub(" ", " ".join(buf)).strip()
        if t:
            blocks.append(t)
        buf.clear()

    for c in node.children:
        if isinstance(c, str):
            if c.strip():
                buf.append(c)
            continue
        if c.tag in ("a", "strong", "b", "em", "i", "code", "br"):
            t = _inline_wrap(c)
            if t:
                buf.append(t)
            continue
        flush()
        _render_block(c, blocks)
    flush()


def _inline_wrap(node: Node) -> str:
    # single inline element floating between blocks
    holder = Node("p")
    holder.children = [node]
    return _inline(holder)


def to_markdown(html: str) -> str:
    """Render the main content of ``html`` as Markdown blocks joined by
    blank lines.  Same candidate selection (and body fallback) as
    ``htmlx.extract_spans``, so the Markdown covers exactly the spans the
    plain-text extractor keeps."""
    root = parse_html(html)
    cand = _best_candidate(root)
    if cand is None:
        cand = next((n for n in root.iter() if n.tag == "body"), root)
    blocks: list[str] = []
    _render_children(cand, blocks)
    # candidate may itself be a renderable block (e.g. a bare <td>)
    if not blocks and cand.tag not in _CONTAINERS:
        _render_block(cand, blocks)
    return "\n\n".join(blocks)
