"""HTML cleaning + link extraction stages (reference M3-M5).

``clean_html_batch`` strips <script>/<style>/<noscript> blocks and
HTML comments with compiled regexes, vectorized over an Arrow string
column — the rebuild of the reference's regex clean_html
(crawler/src/http_worker.ts:131-164) and DOM variant
(crawler/src/browser_worker.ts:690-746).

``extract_links_batch`` pulls <a href> targets and parses hosts
truncated to the last 3 labels — the rebuild of the cheerio pass in
master/other/domain_count.js:30-52 (feeds the per-host count G7).

Both are plain functions → stateless ``map_batches`` tasks; the
regexes are module-level compiled once per worker process.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

from ..functions.urltools import parse_host, truncate_host_labels

# same tag set as the reference (http_worker.ts:144-161)
_SCRIPT_RE = r"<\s*script[^>]*>[\s\S]*?<\s*/\s*script\s*>"
_STYLE_RE = r"<\s*style[^>]*>[\s\S]*?<\s*/\s*style\s*>"
_NOSCRIPT_RE = r"<\s*noscript[^>]*>[\s\S]*?<\s*/\s*noscript\s*>"
_COMMENT_RE = r"<!--[\s\S]*?-->"

_HREF_RE = re.compile(r"""<a\s[^>]*?href\s*=\s*["']([^"'#]+)["']""", re.I)


def clean_html_string(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Vectorized strip via pyarrow.compute.replace_substring_regex."""
    out = col
    for pat in (_SCRIPT_RE, _STYLE_RE, _NOSCRIPT_RE, _COMMENT_RE):
        out = pc.replace_substring_regex(out, pat, "")
    return out


def clean_html_batch(batch: pa.Table, column: str = "text",
                     out_column: str = "clean_text") -> pa.Table:
    return batch.append_column(out_column, clean_html_string(batch[column]))


_TAG_META_RE = re.compile(r"<meta\b[^>]*>", re.I)
_TAG_LINK_RE = re.compile(r"<link\b[^>]*>", re.I)
_ATTR_RE = re.compile(r"""(\w[\w-]*)\s*=\s*["']([^"']*)["']""")


def _tag_attrs(tag: str) -> dict[str, str]:
    """Attribute dict of one HTML tag, keys lower-cased —
    ORDER-INDEPENDENT (a fixed name-then-content pattern breaks on
    half the synthetic corpus, whose generator flips attribute order
    by a hash bit)."""
    return {k.lower(): v for k, v in _ATTR_RE.findall(tag)}


def page_indexability(html: str) -> dict:
    """Indexability signals of one page, the decision layer a crawler
    runs between fetch and enqueue: robots meta directives
    (noindex/nofollow from ``<meta name="robots">``, comma-separated,
    case/whitespace-insensitive), the canonical target
    (``<link rel="canonical">`` href, '' when absent), and the
    followable link count — anchors extracted AFTER clean_html, so
    script-embedded decoy anchors don't count. Oracle-gated by
    ``indexability_stats``."""
    noindex = nofollow = False
    for tag in _TAG_META_RE.findall(html):
        attrs = _tag_attrs(tag)
        if attrs.get("name", "").lower() == "robots":
            tokens = {t.strip().lower()
                      for t in attrs.get("content", "").split(",")}
            noindex = noindex or "noindex" in tokens
            nofollow = nofollow or "nofollow" in tokens
    canonical = ""
    for tag in _TAG_LINK_RE.findall(html):
        attrs = _tag_attrs(tag)
        if attrs.get("rel", "").lower() == "canonical":
            canonical = attrs.get("href", "")
            break
    cleaned = clean_html_string(pa.array([html]))[0].as_py()
    n_links = len(_HREF_RE.findall(cleaned))
    return {"noindex": noindex, "nofollow": nofollow,
            "canonical": canonical, "n_links": n_links}


def extract_links_batch(batch: pa.Table, text_column: str = "text",
                        id_column: str = "doc_id") -> pa.Table:
    """Explode each document into (src_doc, href, out_host) rows."""
    ids = batch[id_column].to_pylist()
    texts = batch[text_column].to_pylist()
    src, hrefs, hosts = [], [], []
    for doc, text in zip(ids, texts):
        for href in _HREF_RE.findall(text or ""):
            src.append(doc)
            hrefs.append(href)
            hosts.append(truncate_host_labels(parse_host(href)))
    return pa.table({"src_doc": pa.array(src, pa.string()),
                     "href": pa.array(hrefs, pa.string()),
                     "out_host": pa.array(hosts, pa.string())})
