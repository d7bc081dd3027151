"""From-scratch URL parsing, normalization and registered-domain
extraction — the string kernels behind web-corpus curation (C4 /
RefinedWeb-style URL filtering: UT1-like blocklists key on the
registered domain, dedup keys on the normalized URL).

No urllib: the normalization rules here (default-port strip,
dot-segment resolution, tracking-param removal) must be reproducible
verbatim in the DuckDB oracle, so the exact behavior is spelled out in
this module rather than inherited from a library.
"""

from __future__ import annotations

# Longest-match public-suffix snippet (a deliberately small, documented
# subset of the PSL — enough for multi-label suffixes like co.uk to be
# exercised; unknown TLDs fall back to the last label).
PUBLIC_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "com.au", "co.jp",
    "com", "org", "net", "edu", "gov", "io", "info",
)

# UT1-style category blocklist, keyed on registered domain.
BLOCKED_DOMAINS = frozenset(
    f"src{i}.net" for i in range(1, 20, 2)
)

_TRACKING_PREFIX = "utm_"
_DEFAULT_PORTS = {"http": "80", "https": "443"}


def parse_url(url: str) -> dict:
    """Split ``scheme://host[:port]/path?query#fragment`` into parts.
    Scheme and host are case-insensitive per RFC 3986 and returned
    lowercased; path/query/fragment keep their case. No percent
    decoding (curation keys compare raw)."""
    s = url or ""
    scheme, rest = "", s
    i = s.find("://")
    if i > 0:
        scheme, rest = s[:i].lower(), s[i + 3:]
    frag = ""
    j = rest.find("#")
    if j >= 0:
        rest, frag = rest[:j], rest[j + 1:]
    query = ""
    j = rest.find("?")
    if j >= 0:
        rest, query = rest[:j], rest[j + 1:]
    path = ""
    j = rest.find("/")
    if j >= 0:
        rest, path = rest[:j], rest[j:]
    netloc = rest.lower()
    host, port = netloc, ""
    j = netloc.rfind(":")
    if j >= 0 and netloc[j + 1:].isdigit():
        host, port = netloc[:j], netloc[j + 1:]
    return {"scheme": scheme, "host": host, "port": port,
            "path": path, "query": query, "fragment": frag}


def resolve_dot_segments(path: str) -> str:
    """RFC 3986 §5.2.4 remove_dot_segments over an absolute path."""
    out: list[str] = []
    for seg in path.split("/"):
        if seg == ".":
            continue
        if seg == "..":
            if out:
                out.pop()
            continue
        out.append(seg)
    res = "/".join(out)
    if path.startswith("/") and not res.startswith("/"):
        res = "/" + res
    return res or "/"


def strip_tracking_params(query: str) -> str:
    """Drop ``utm_*`` parameters, preserving the order of the rest."""
    if not query:
        return ""
    kept = [p for p in query.split("&")
            if p and not p.split("=", 1)[0].lower().startswith(
                _TRACKING_PREFIX)]
    return "&".join(kept)


def normalize_url(url: str) -> str:
    """Canonical curation key: lowercase scheme+host, strip the scheme
    default port, resolve ./.. path segments (empty path -> /), drop
    utm_* params and the fragment."""
    p = parse_url(url)
    host = p["host"]
    port = p["port"]
    if port and port != _DEFAULT_PORTS.get(p["scheme"], ""):
        host = f"{host}:{port}"
    path = resolve_dot_segments(p["path"] or "/")
    query = strip_tracking_params(p["query"])
    out = f"{p['scheme']}://{host}{path}" if p["scheme"] else host + path
    if query:
        out += "?" + query
    return out


def registered_domain(host: str) -> str:
    """eTLD+1 under the PUBLIC_SUFFIXES snippet (longest suffix wins);
    a bare suffix or dotless host returns itself."""
    for suf in PUBLIC_SUFFIXES:  # ordered multi-label-first
        if host == suf:
            return host
        if host.endswith("." + suf):
            stem = host[: -(len(suf) + 1)]
            return stem.rsplit(".", 1)[-1] + "." + suf
    if "." in host:
        return ".".join(host.rsplit(".", 2)[-2:])
    return host


def path_depth(path: str) -> int:
    """Number of non-empty segments in an already-resolved path."""
    return sum(1 for seg in path.split("/") if seg)


def url_features(url: str) -> dict:
    """The per-URL curation record: parsed host, registered domain,
    normalized key, path depth, non-tracking param count, blocklist
    flag."""
    p = parse_url(url)
    norm = normalize_url(url)
    npath = resolve_dot_segments(p["path"] or "/")
    query = strip_tracking_params(p["query"])
    dom = registered_domain(p["host"])
    return {
        "scheme": p["scheme"],
        "host": p["host"],
        "domain": dom,
        "norm_url": norm,
        "path_depth": path_depth(npath),
        "n_params": len(query.split("&")) if query else 0,
        "blocked": dom in BLOCKED_DOMAINS,
    }
