"""Real XML sitemap parsing (sitemaps.org protocol).

The robots.txt files the synthetic origin serves advertise a
``Sitemap:`` URL per host (corpus.make_robots_txt); this module is
the real parsing half of that discovery path: a tolerant streaming
scanner for ``<urlset>`` documents — XML declaration, namespace
attributes, ``<!-- comments -->``, whitespace-insensitive tag
bodies — extracting per-``<url>`` entries (loc, lastmod, changefreq,
priority). No XML library is used (none needed for the sitemap
subset, and the scanner shape matches what a 100-TB crawler does:
one linear pass per fetched sitemap, no DOM).

Oracle-gated end to end by ``sitemap_extract`` (the DuckDB twin
replays every entry from the generator's closed form without
touching XML text).
"""

from __future__ import annotations


def _tag_text(chunk: str, tag: str) -> str | None:
    """Text content of the first <tag>…</tag> inside chunk, or None;
    tolerant of whitespace inside the element body."""
    open_t, close_t = f"<{tag}>", f"</{tag}>"
    i = chunk.find(open_t)
    if i < 0:
        return None
    j = chunk.find(close_t, i)
    if j < 0:
        return None
    return chunk[i + len(open_t):j].strip()


def parse_sitemap(text: str) -> list[dict]:
    """Parse a sitemaps.org ``<urlset>`` document into entry dicts
    with keys loc / lastmod / changefreq / priority (missing optional
    fields → None; priority parsed to float). Raises ValueError on a
    document without a <urlset> root. Comments are stripped first —
    a commented-out <url> block must NOT be emitted."""
    # strip comments (linear scan, no nesting per XML spec)
    parts: list[str] = []
    pos = 0
    while True:
        i = text.find("<!--", pos)
        if i < 0:
            parts.append(text[pos:])
            break
        parts.append(text[pos:i])
        j = text.find("-->", i + 4)
        if j < 0:
            break  # unterminated comment swallows the rest
        pos = j + 3
    text = "".join(parts)

    if "<urlset" not in text:
        raise ValueError("not a sitemap urlset document")
    entries: list[dict] = []
    pos = 0
    while True:
        i = text.find("<url>", pos)
        if i < 0:
            break
        j = text.find("</url>", i)
        if j < 0:
            raise ValueError("unterminated <url> entry")
        chunk = text[i + 5:j]
        pos = j + 6
        loc = _tag_text(chunk, "loc")
        if loc is None:
            raise ValueError("sitemap <url> entry without <loc>")
        prio = _tag_text(chunk, "priority")
        entries.append({
            "loc": loc,
            "lastmod": _tag_text(chunk, "lastmod"),
            "changefreq": _tag_text(chunk, "changefreq"),
            "priority": float(prio) if prio is not None else None,
        })
    return entries
