"""URL canonicalization and host parsing.

The reference parses hosts with ``new URL(...)`` and truncates to the
last 3 dot-labels for domain counting
(master/other/domain_count.js:41-44). Canonicalization is a rebuild
addition (the reference stores raw item strings) needed by the
north-star URL-seen dedup: one canonical form per logical URL.
"""

from __future__ import annotations

from urllib.parse import urlsplit, urlunsplit

_DEFAULT_PORTS = {"http": "80", "https": "443"}


def canonicalize_url(url: str) -> str:
    """Canonical URL form: lowercase scheme/host, strip fragment,
    strip default port, collapse empty path to '/', drop trailing
    '?' . Query strings are preserved (order untouched — reordering
    can change semantics)."""
    url = url.strip()
    try:
        parts = urlsplit(url)
    except ValueError:
        return url
    scheme = (parts.scheme or "http").lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    netloc = host
    if port is not None and str(port) != _DEFAULT_PORTS.get(scheme, ""):
        netloc = f"{host}:{port}"
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, parts.query, ""))


def parse_host(url: str) -> str:
    """Hostname of a URL, '' when unparseable (reference domain_count.js:41-42)."""
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def truncate_host_labels(host: str, keep: int = 3) -> str:
    """Keep the last ``keep`` dot-labels (reference domain_count.js:43-44)."""
    labels = host.split(".")
    return ".".join(labels[-keep:]) if len(labels) > keep else host
