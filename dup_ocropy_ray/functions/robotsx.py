"""From-scratch Robots Exclusion Protocol engine (RFC 9309 semantics).

The crawl-politeness gate every web-scale ingestion pipeline needs:
parse a ``robots.txt``, select the rule group for our user agent, and
answer allow/deny per URL path with the spec's longest-match rule.

Semantics implemented:
- groups = consecutive ``User-agent`` lines sharing the following rules;
  a crawler obeys the group with the MOST SPECIFIC matching agent token
  (longest token that is a case-insensitive substring of the crawler's
  product token), falling back to ``*``; groups do NOT combine across
  tokens — a named match hides the ``*`` group entirely;
- rule patterns are literal path prefixes, ``*`` matches any octet
  sequence, a trailing ``$`` anchors the end;
- the most specific (longest-pattern) matching rule wins; on a tie,
  ``Allow`` wins; no matching rule means allowed; an empty
  ``Disallow:`` value matches nothing (allow-all idiom);
- ``Crawl-delay`` and ``Sitemap`` lines are surfaced as metadata.

Pure scalar kernel: parse once per (domain, fetch), evaluate per URL.
Distribution shape: robots bodies are domain-scale (small side) — parse
results are cached per domain inside the filtering stage, never
re-shipped per row.
"""

from __future__ import annotations

import re


class RobotsGroup:
    __slots__ = ("agents", "rules")

    def __init__(self):
        self.agents: list[str] = []
        # (allow: bool, pattern: str) in file order
        self.rules: list[tuple[bool, str]] = []


class Robots:
    __slots__ = ("groups", "sitemaps", "crawl_delays")

    def __init__(self):
        self.groups: list[RobotsGroup] = []
        self.sitemaps: list[str] = []
        # agent-token -> seconds (as written; float)
        self.crawl_delays: dict[str, float] = {}


def parse_robots(text: str) -> Robots:
    out = Robots()
    group: RobotsGroup | None = None
    in_agents = False  # consecutive User-agent lines stack into one group
    for raw in (text or "").splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not in_agents:
                group = RobotsGroup()
                out.groups.append(group)
                in_agents = True
            group.agents.append(value.lower())
            continue
        if field == "sitemap":
            in_agents = False
            if value:
                out.sitemaps.append(value)
            continue
        if group is None:
            continue  # rules before any User-agent line are ignored
        in_agents = False
        if field == "disallow":
            if value:  # empty Disallow == allow all (matches nothing)
                group.rules.append((False, value))
        elif field == "allow":
            if value:
                group.rules.append((True, value))
        elif field == "crawl-delay":
            try:
                delay = float(value)
            except ValueError:
                continue
            for a in group.agents:
                out.crawl_delays[a] = delay
    return out


def select_rules(robots: Robots, user_agent: str) -> list[tuple[bool, str]]:
    """Rules of the most specific matching group ('*' fallback; named
    match hides '*'); groups sharing the winning token merge in order."""
    ua = (user_agent or "").lower()
    best_token = None
    for g in robots.groups:
        for a in g.agents:
            if a != "*" and a and a in ua:
                if best_token is None or len(a) > len(best_token):
                    best_token = a
    rules: list[tuple[bool, str]] = []
    if best_token is not None:
        for g in robots.groups:
            if best_token in g.agents:
                rules.extend(g.rules)
        return rules
    for g in robots.groups:
        if "*" in g.agents:
            rules.extend(g.rules)
    return rules


def _pattern_regex(pattern: str) -> re.Pattern:
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    rx = "".join(".*" if ch == "*" else re.escape(ch) for ch in pattern)
    return re.compile("^" + rx + ("$" if anchored else ""))


class Matcher:
    """Compiled allow/deny evaluator for one (robots, user-agent)."""

    __slots__ = ("_rules",)

    def __init__(self, robots: Robots, user_agent: str):
        # pre-sort by specificity so evaluation is first-match;
        # stable sort keeps allow-beats-disallow on ties by ordering
        # allows first within a length class
        rules = select_rules(robots, user_agent)
        decorated = sorted(
            ((len(p), allow, _pattern_regex(p)) for allow, p in rules),
            key=lambda t: (-t[0], not t[1]),
        )
        self._rules = [(allow, rx) for _, allow, rx in decorated]

    def is_allowed(self, path: str) -> bool:
        if not path.startswith("/"):
            path = "/" + path
        for allow, rx in self._rules:
            if rx.match(path):
                return allow
        return True


def is_allowed(robots_text: str, user_agent: str, path: str) -> bool:
    """One-shot convenience (parse + match); batch callers should build
    a ``Matcher`` per domain instead."""
    return Matcher(parse_robots(robots_text), user_agent).is_allowed(path)
