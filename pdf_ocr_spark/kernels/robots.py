"""robots.txt engine (RFC 9309, the Google REP subset a crawl frontier
needs): group selection by user-agent token, Allow/Disallow patterns
with ``*`` wildcards and ``$`` end anchor, longest-match precedence with
Allow winning ties.

Not present in the reference (a single-machine OCR tool) — required
upstream of the link-graph/frontier operators: a 10^12-page crawl must
drop disallowed URLs before fetch.  Pure python reference implementation
here; the distributed path emits each rule as an anchored regex (RE2-safe,
identical under Java regex and DuckDB) plus its specificity so the
longest-match argmax runs as DataFrame ops (pipeline/extract_job.py
``robots_rules`` / ``frontier_allowed``).
"""

from __future__ import annotations

import re
from typing import List, NamedTuple


class RobotsRule(NamedTuple):
    agent: str       # lowercased user-agent token ('*' for the catch-all)
    allow: bool      # Allow vs Disallow
    pattern: str     # raw pattern as written
    regex: str       # anchored RE2-safe regex equivalent
    specificity: int  # pattern length in chars — longest-match precedence
    order: int       # document order (stable tiebreak only)


# '$' included: it is special only at PATTERN END (handled separately) —
# a literal mid-pattern '$' must be escaped or it becomes an end anchor
# that makes the rule match nothing
_SPECIAL = re.compile(r"[.^$+?{}\[\]|()\\]")


def pattern_regex(pattern: str) -> str:
    """robots pattern → anchored regex: escape regex metachars, ``*`` →
    ``.*``, trailing ``$`` → end anchor; prefix-match otherwise.  Uses
    only RE2-safe constructs so Java regex and DuckDB agree."""
    anchored_end = pattern.endswith("$")
    body = pattern[:-1] if anchored_end else pattern
    out = []
    for ch in body:
        if ch == "*":
            out.append(".*")
        elif _SPECIAL.match(ch):
            out.append("\\" + ch)
        else:
            out.append(ch)
    return "^" + "".join(out) + ("$" if anchored_end else "")


def parse_robots(text: str) -> List[RobotsRule]:
    """Parse a robots.txt body into rules.  Group semantics per RFC 9309:
    consecutive ``User-agent`` lines open a group that the following
    Allow/Disallow lines join; a rule line without a preceding agent line
    belongs to ``*``.  An empty-pattern rule ('Disallow:' = allow
    everything) becomes a zero-specificity allow-all sentinel — it keeps
    the GROUP in existence (an agent with an empty group must NOT fall
    back to '*', RFC 9309 §2.2.1) while losing every longest-match
    contest."""
    rules: List[RobotsRule] = []
    agents: List[str] = []
    in_group_rules = False
    order = 0
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_rules:  # a new group starts
                agents = []
                in_group_rules = False
            agents.append(value.lower() or "*")
        elif field in ("allow", "disallow"):
            in_group_rules = True
            if not value:
                for agent in agents or ["*"]:
                    rules.append(RobotsRule(agent, True, "", "^", 0, order))
                order += 1
                continue
            for agent in agents or ["*"]:
                rules.append(
                    RobotsRule(
                        agent,
                        field == "allow",
                        value,
                        pattern_regex(value),
                        len(value),
                        order,
                    )
                )
            order += 1
        elif field == "crawl-delay":
            # not a fetch-permission rule, but it IS a group member: a
            # User-agent line after it starts a NEW group
            in_group_rules = True
        # sitemap etc.: ignored
    return rules


def is_allowed(rules: List[RobotsRule], agent: str, path: str) -> bool:
    """Reference matcher: pick the agent's group (exact token match,
    else '*'), take the longest matching pattern; Allow wins ties; no
    match → allowed."""
    agent = agent.lower()
    group = [r for r in rules if r.agent == agent]
    if not group:
        group = [r for r in rules if r.agent == "*"]
    best = None  # (specificity, allow_as_int)
    for r in group:
        if re.match(r.regex, path):
            key = (r.specificity, 1 if r.allow else 0)
            if best is None or key > best:
                best = key
    return True if best is None else bool(best[1])


def parse_crawl_delays(text: str) -> List[Tuple[str, float]]:
    """Per-agent-group ``Crawl-delay`` directives (the de-facto REP
    extension most crawlers honor for politeness rate-limiting): one
    (agent, delay_seconds) per group that declares it.  Group selection
    mirrors :func:`parse_robots`; non-numeric values are ignored."""
    out: List[Tuple[str, float]] = []
    agents: List[str] = []
    in_group_rules = False
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        field, _, value = line.partition(":")
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if in_group_rules:
                agents = []
                in_group_rules = False
            agents.append(value.lower() or "*")
        elif field in ("allow", "disallow"):
            in_group_rules = True
        elif field == "crawl-delay":
            in_group_rules = True
            try:
                delay = float(value)
            except ValueError:
                continue
            for agent in agents or ["*"]:
                out.append((agent, delay))
    return out


def parse_sitemaps(text: str) -> List[str]:
    """``Sitemap:`` URLs in document order (RFC 9309 §2.3 allows them
    anywhere in the file, outside group scope), first occurrence kept —
    a crawl seeds its frontier from these."""
    out: List[str] = []
    seen = set()
    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if ":" not in line:
            continue
        field, _, value = line.partition(":")
        if field.strip().lower() == "sitemap":
            value = value.strip()
            if value and value not in seen:
                seen.add(value)
                out.append(value)
    return out


_LOC_RE = re.compile(rb"<loc>\s*([^<]+?)\s*</loc>", re.I)
_LASTMOD_RE = re.compile(rb"<lastmod>\s*([^<]+?)\s*</lastmod>", re.I)
_ENTRY_RE = re.compile(rb"<(url|sitemap)\b[^>]*>(.*?)</\1>", re.I | re.S)


def parse_sitemap_xml(data: bytes) -> List[tuple]:
    """Sitemap-protocol XML (sitemaps.org) → [(loc, lastmod|None, kind)]
    where kind is 'url' for <urlset> page entries and 'sitemap' for
    <sitemapindex> children (which a crawler fetches recursively).
    Gzipped payloads (.xml.gz) decompress transparently; the scan is a
    regex pass (no XML library dependency), tolerant of namespaces and
    attribute noise; malformed input yields what parsed.  Entity-decoded
    locs (sitemap XML escapes & as &amp;), first occurrence kept."""
    import html as _h
    import zlib as _z

    if data[:2] == b"\x1f\x8b":
        try:
            data = _z.decompress(data, 16 + _z.MAX_WBITS)
        except _z.error:
            return []
    out: List[tuple] = []
    seen = set()
    for m in _ENTRY_RE.finditer(data):
        kind = m.group(1).decode("ascii").lower()
        body = m.group(2)
        lm = _LOC_RE.search(body)
        if not lm:
            continue
        loc = _h.unescape(lm.group(1).decode("utf-8", "replace")).strip()
        if not loc or loc in seen:
            continue
        seen.add(loc)
        dm = _LASTMOD_RE.search(body)
        lastmod = dm.group(1).decode("ascii", "replace").strip() if dm else None
        out.append((loc, lastmod, kind))
    return out


_FEED_ITEM_RE = re.compile(rb"<(item|entry)\b[^>]*>(.*?)</\1>", re.I | re.S)
_FEED_LINK_TAG_RE = re.compile(rb"<link\b([^>]*?)/?>(?:([^<]*)</link>)?", re.I | re.S)
_FEED_HREF_RE = re.compile(rb"""href\s*=\s*(?:"([^"]*)"|'([^']*)')""", re.I)
_FEED_REL_RE = re.compile(rb"""rel\s*=\s*(?:"([^"]*)"|'([^']*)')""", re.I)
_FEED_DATE_RE = re.compile(
    rb"<(pubDate|published|updated)\b[^>]*>([^<]*)</\1>", re.I
)
_FEED_TITLE_RE = re.compile(rb"<title\b[^>]*>(.*?)</title>", re.I | re.S)
_CDATA_RE = re.compile(rb"<!\[CDATA\[(.*?)\]\]>", re.S)


def parse_feed(data: bytes) -> List[tuple]:
    """RSS 2.0 / Atom feed → [(link, title|None, date|None)] per item —
    the third frontier-discovery channel next to sitemaps and page
    links (feeds surface NEW urls fastest).  RSS ``<item><link>text``
    and Atom ``<entry><link href=…>`` both parse; Atom alternate links
    win over self/enclosure rels; CDATA and entities unwrap; gzip
    transparent.  Regex pass like the sitemap parser — tolerant,
    deterministic, first occurrence kept."""
    import html as _h
    import zlib as _z

    if data[:2] == b"\x1f\x8b":
        try:
            data = _z.decompress(data, 16 + _z.MAX_WBITS)
        except _z.error:
            return []
    out: List[tuple] = []
    seen = set()

    def _text(raw: bytes) -> str:
        cm = _CDATA_RE.search(raw)
        if cm:
            raw = cm.group(1)
        return _h.unescape(raw.decode("utf-8", "replace")).strip()

    for m in _FEED_ITEM_RE.finditer(data):
        body = m.group(2)
        link = None
        fallback = None
        for lm in _FEED_LINK_TAG_RE.finditer(body):
            attrs, inner = lm.group(1), lm.group(2)
            hm = _FEED_HREF_RE.search(attrs)
            if hm:  # Atom form
                href = _h.unescape(
                    (hm.group(1) or hm.group(2) or b"").decode("utf-8", "replace")
                ).strip()
                rm = _FEED_REL_RE.search(attrs)
                rel = ((rm.group(1) or rm.group(2) or b"") if rm else b"")
                rel = rel.decode("ascii", "replace").lower()
                if rel in ("", "alternate"):
                    link = href
                    break
                fallback = fallback or href
            elif inner:  # RSS form: <link>url</link>
                link = _text(inner)
                break
        link = link or fallback
        if not link or link in seen:
            continue
        seen.add(link)
        tm = _FEED_TITLE_RE.search(body)
        title = _text(tm.group(1)) if tm else None
        dm = _FEED_DATE_RE.search(body)
        date = _text(dm.group(2)) if dm else None
        out.append((link, title or None, date or None))
    return out
