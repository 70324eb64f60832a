"""Deterministic synthetic crawl corpus (FIXTURES.md F1-F4).

Everything is a pure function of (seed, url) — no stored fixture files
are required at crawl time; the same functions are evaluated inside
the FetchSim actors (engine path) and inside the single-threaded
oracle (test path), so per-row span-sequence equality is checkable
end to end (BASELINE.json input_hint).

The seed-URL generator mirrors the reference's items-file ingest
(newline URL lists, master/src/services/crawltask.service.ts:1076-1088;
tutorial top-10k workload master/ctrl.js:270-282): Zipf-distributed
hosts (hot-host skew is deliberate — it exercises the salted
partitioning path), ~2% duplicate URLs (the reference queue allows
duplicates, crawltask.service.ts:782-785).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import md5_id, stable_hash64

_FETCH_SALT = 0xFE7C
_LINK_SALT = 0x117C
_SPAN_SALT = 0x59A7

_VOCAB = [f"tok{i:03d}" for i in range(512)]


def make_seed_urls(n: int, seed: int = 42, num_hosts: int | None = None,
                   dup_rate: float = 0.02,
                   host_dist: str = "zipf") -> pa.Table:
    """FIXTURES F2 seed list: (enqueue_seq, url, host, depth, priority).

    ``host_dist``: 'zipf' (default — realistic skew; the hottest host
    carries ~18% of URLs, so per-host politeness budgets BIND) or
    'uniform' (no hot host — used by the politeness-ON bench to
    measure the token-bucket machinery instead of the synthetic
    hot-host wait)."""
    num_hosts = num_hosts or max(8, n // 50)
    rng = np.random.default_rng(seed)
    if host_dist == "uniform":
        host_ids = rng.integers(0, num_hosts, size=n)
    else:
        # Zipf(a=1.2) host ids truncated to num_hosts
        host_ids = rng.zipf(1.2, size=n) % num_hosts
    path_ids = rng.integers(0, max(4, n * 4), size=n)
    urls = [f"http://h{h}.example/p{p:06x}" for h, p in zip(host_ids, path_ids)]
    # ~dup_rate duplicates: overwrite a slot with an earlier URL
    ndup = int(n * dup_rate)
    if ndup and n > 1:
        dup_pos = rng.integers(1, n, size=ndup)
        src_pos = rng.integers(0, dup_pos)  # earlier index, deterministic given seed
        for d, s in zip(dup_pos, src_pos):
            urls[d] = urls[s]
    hosts = [u.split("/")[2] for u in urls]
    return pa.table({
        "enqueue_seq": pa.array(np.arange(n, dtype=np.uint64)),
        "url": pa.array(urls, pa.string()),
        "host": pa.array(hosts, pa.string()),
        "depth": pa.array(np.zeros(n, dtype=np.int32)),
        "priority": pa.array(np.ones(n, dtype=np.int32)),
    })


def doc_id_for_url(url: str) -> str:
    """Stable doc id, md5-derived (reference md5 request ids,
    crawler/src/persistant_handler.ts:159-162)."""
    return "d-" + md5_id(url)[:12]


def fetch_outcome(url: str, attempt: int, seed: int = 42) -> dict:
    """FIXTURES F4 oracle: deterministic simulated fetch result.

    status: 'completed' | 'failed' | 'blocked'
      ~6% of URLs fail for their first 1-2 attempts then succeed
        (drives retry semantics, retry_failed_items=3),
      ~2% fail permanently (terminal failed after 3 retries),
      ~2% are 'blocked' on attempt 0 only (proxy-block signature —
        reference R6: retry not consumed, crawler/src/handler.ts:171-176).
    """
    h = stable_hash64(url, seed ^ _FETCH_SALT)
    r = h % 100
    latency_ms = int(5 + (h >> 16) % 95)
    if r < 6:
        fail_until = 1 + ((h >> 8) % 2)
        status = "failed" if attempt < fail_until else "completed"
        err = "net::ERR_CONNECTION_TIMED_OUT" if status == "failed" else ""
    elif r < 8:
        status, err = "failed", "HTTP 500"
    elif r < 10:
        status = "blocked" if attempt == 0 else "completed"
        err = "HTTP 429" if status == "blocked" else ""
    else:
        status, err = "completed", ""
    return {"status": status, "error": err, "latency_ms": latency_ms}


def link_children(url: str, depth: int, seed: int = 42, max_depth: int = 2,
                  num_hosts: int = 64) -> list[str]:
    """FIXTURES F3 link graph: 0..5 deterministic children per URL.

    ~70% same-host children, ~30% cross-host — drives worker-side
    frontier expansion (reference enqueue(), crawler/src/enqueue.ts:71-116).
    """
    if depth >= max_depth:
        return []
    h = stable_hash64(url, seed ^ _LINK_SALT)
    k = h % 6
    host = url.split("/")[2] if "://" in url else "h0.example"
    out = []
    for i in range(k):
        hi = stable_hash64(f"{url}#{i}", seed ^ _LINK_SALT)
        child_host = host if hi % 10 < 7 else f"h{hi % num_hosts}.example"
        out.append(f"http://{child_host}/c{(hi >> 8) % (1 << 24):06x}")
    return out


_VOCAB_ARR = np.asarray(_VOCAB, dtype=object)
_SPAN_J = np.arange(96 + 192, dtype=np.uint64)          # max ntok
_SPAN_SHIFTS = (_SPAN_J % np.uint64(48))
_SPAN_MULT = ((_SPAN_J + np.uint64(1)) % np.uint64(len(_VOCAB)))


def make_spans(url: str, seed: int = 42) -> list[dict]:
    """FIXTURES F1 interleaved text+media spans for one document.

    n_spans = 1 + (id_hash * 2654435761 mod 13); spans alternate
    text/media starting with text; offsets are cumulative text char
    offsets; all content is a pure function of (seed, doc_id, span_idx).

    Token selection is vectorized (numpy shift/mod over precomputed
    index tables — bit-identical to the scalar expression
    ``(sh >> (j % 48)) * (j + 1) % V`` via modular decomposition);
    this function runs once per fetched document in the crawl hot
    path, so its cost IS the simulated per-URL work.
    """
    doc_id = doc_id_for_url(url)
    idh = stable_hash64(doc_id, seed ^ _SPAN_SALT)
    n_spans = 1 + (idh * 2654435761) % 13
    host = url.split("/")[2] if "://" in url else "h0.example"
    spans = []
    offset = 0
    for i in range(n_spans):
        sh = stable_hash64(f"{doc_id}|{i}", seed ^ _SPAN_SALT)
        if i % 2 == 0:  # text span — sized so docs average ~4-5 KB of
            # text (realistic page-scale payloads; exercises the
            # streaming/write path and the per-doc signature cost)
            ntok = 96 + sh % 192
            shifted = (np.uint64(sh) >> _SPAN_SHIFTS[:ntok]) % np.uint64(len(_VOCAB))
            idx = (shifted * _SPAN_MULT[:ntok]) % np.uint64(len(_VOCAB))
            text = " ".join(_VOCAB_ARR[idx.astype(np.int64)])
            spans.append({"kind": "text", "text": text, "media_ref": "",
                          "offset": offset})
            offset += len(text)
        else:  # media span — reference-not-payload (SURVEY.md §7.4)
            spans.append({"kind": "media", "text": "",
                          "media_ref": f"m://{host}/{md5_id(f'{doc_id}|{i}')[:10]}",
                          "offset": offset})
    return spans


def spans_arrow_type() -> pa.DataType:
    """Arrow type of the documents.spans column (input_hint schema)."""
    return pa.list_(pa.struct([
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]))


PPM_STEP = 31  # coprime with 256 → the pixel stream walks ALL residues


def make_media_payload(media_ref: str) -> bytes:
    """Deterministic synthetic THUMBNAIL bytes for a media ref: a REAL
    binary PPM (P6) image — magic + comment + dims + maxval header,
    then raw RGB raster. The reference's browser worker stores fetched
    media blobs next to the page (browser_worker.ts:26-748); this
    generator is that origin/storage stand-in, sized as a thumbnail
    (8–31 × 8–23 px, ≤ ~2.2 KB) so wide-binary batches stay small.

    Everything is closed-form in hh = stable_hash64(ref): dims
    w = 8 + (hh>>32) % 24, h = 8 + (hh>>40) % 16; flat pixel i holds
    (hh%256 + 31·i) mod 256. gcd(31,256)=1 makes each 256-run of
    pixels a full residue cycle (sum 32640, sum-of-squares 5559680),
    which is what lets the DuckDB oracle replay exact pixel statistics
    without materializing rasters (training._media_decode_oracle_sql).
    """
    hh = stable_hash64(media_ref)
    w = 8 + (hh >> 32) % 24
    h = 8 + (hh >> 40) % 16
    base = hh % 256
    n = w * h * 3
    px = ((np.uint64(base)
           + np.uint64(PPM_STEP) * np.arange(n, dtype=np.uint64))
          % np.uint64(256)).astype(np.uint8)
    header = f"P6\n# thumb {w}x{h} for {media_ref}\n{w} {h}\n255\n"
    return header.encode("ascii") + px.tobytes()


def fetch_media_payloads(batch: pa.Table) -> pa.Table:
    """Simulated media STORAGE FETCH: append each ref's payload bytes
    as a binary column — the stand-in for the blob GET the reference
    workers issue per media asset. Per-ref generation is inherent
    (variable-size binary rows), matching the per-asset fetch shape."""
    payloads = [make_media_payload(r)
                for r in batch["media_ref"].to_pylist()]
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


AUDIO_RATE = 8000  # synthetic WAV sample rate (Hz)


def make_audio_payload(media_ref: str) -> bytes:
    """Deterministic synthetic AUDIO bytes for a media ref: a REAL
    RIFF/WAVE file — 'RIFF' size 'WAVE' + an 18-byte 'fmt ' chunk
    (PCM, mono, 8 kHz, 16-bit, with the optional cbSize field so the
    parser must honor chunk sizes, not fixed offsets) + a junk 'cue '
    chunk the decoder has to SKIP + the 'data' chunk.

    Closed-form in hh = stable_hash64(ref): n_samples =
    256 + (hh>>48) % 1792 (≤ 4 KB of PCM); sample i is the image
    generator's stride-31 residue walk widened to int16 full scale:
      v_i = (hh%256 + 31·i) mod 256 ;  s_i = 257·v_i − 32768
    so Σs = 257·Σv − 32768·n and Σs² = 257²·Σv² − 2·257·32768·Σv +
    n·32768² — both exact integers the DuckDB oracle replays from the
    same full-cycle constants (32640 / 5559680) + enumerated partial
    (training._audio_decode_oracle_sql)."""
    import struct

    hh = stable_hash64(media_ref)
    n = 256 + (hh >> 48) % 1792
    base = hh % 256
    v = (np.uint64(base)
         + np.uint64(PPM_STEP) * np.arange(n, dtype=np.uint64)) \
        % np.uint64(256)
    samples = (v.astype(np.int64) * 257 - 32768).astype("<i2")
    fmt = struct.pack("<HHIIHHH", 1, 1, AUDIO_RATE, AUDIO_RATE * 2, 2,
                      16, 0)  # PCM, mono, 16-bit, cbSize=0
    cue = b"\x00" * 12  # skippable junk chunk
    data = samples.tobytes()
    body = (b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"cue " + struct.pack("<I", len(cue)) + cue
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def fetch_audio_payloads(batch: pa.Table) -> pa.Table:
    """Audio variant of fetch_media_payloads (WAV bytes)."""
    payloads = [make_audio_payload(r)
                for r in batch["media_ref"].to_pylist()]
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


VIDEO_FPS = (25, 1)  # synthetic Y4M frame rate


def make_video_payload(media_ref: str) -> bytes:
    """Deterministic synthetic VIDEO bytes for a media ref: a REAL
    YUV4MPEG2 (.y4m) stream — the uncompressed video container the
    mjpegtools/ffmpeg family exchanges: an ASCII parameter line
    ('YUV4MPEG2 W.. H.. F25:1 Ip A1:1 C444\\n'), then per frame a
    'FRAME\\n' marker + raw 4:4:4 Y,U,V planes.

    Closed-form in hh = stable_hash64(ref): w = 4 + (hh>>32) % 12,
    h = 4 + (hh>>40) % 8, n_frames = 2 + (hh>>56) % 6 (≤ ~3.5 KB);
    the plane bytes are ONE stride-31 residue walk continuing across
    all frames — flat byte j holds (hh%256 + 31·j) mod 256 — so total
    Σ and Σ² replay from the same full-cycle constants + enumerated
    partial as the image/audio oracles
    (training._video_decode_oracle_sql)."""
    hh = stable_hash64(media_ref)
    w = 4 + (hh >> 32) % 12
    h = 4 + (hh >> 40) % 8
    f = 2 + (hh >> 56) % 6
    base = hh % 256
    per_frame = w * h * 3
    v = (np.uint64(base) + np.uint64(PPM_STEP)
         * np.arange(f * per_frame, dtype=np.uint64)) % np.uint64(256)
    raw = v.astype(np.uint8).tobytes()
    out = [f"YUV4MPEG2 W{w} H{h} F{VIDEO_FPS[0]}:{VIDEO_FPS[1]} "
           f"Ip A1:1 C444\n".encode("ascii")]
    for k in range(f):
        out.append(b"FRAME\n")
        out.append(raw[k * per_frame:(k + 1) * per_frame])
    return b"".join(out)


def fetch_video_payloads(batch: pa.Table) -> pa.Table:
    """Video variant of fetch_media_payloads (Y4M bytes)."""
    payloads = [make_video_payload(r)
                for r in batch["media_ref"].to_pylist()]
    return batch.append_column("payload", pa.array(payloads, pa.binary()))


_ROBOTS_SALT = 0x0B07  # same salt family as the simulated RobotsCache
_SITEMAP_SALT = 0x51E7


_HTTP_SALT = 0x177E
_HTML_SALT = 0x4A7B


def make_html_page(url: str, seed: int = 42) -> str:
    """Deterministic synthetic HTML page TEXT for a URL — the
    indexability-relevant head/body a real crawler must parse:
    optional ``<meta name="robots">`` (noindex/nofollow draws, with
    ATTRIBUTE ORDER flipped by a hash bit so fixed-pattern matching
    fails), optional ``<link rel="canonical">``, a ``<script>`` block
    containing a DECOY ``<a href>`` that link extraction must not see
    (it must run after clean_html), and the real anchor list.

    Closed-form in h = stable_hash64(url, seed ^ 0x4A7B), m = h%100:
      noindex  = m < 15 ; nofollow = 10 <= m < 25  (10–14 both)
      canonical present iff (h>>8)%100 < 20, target
        '/p<(h>>16) % 16^6 :06x>' on the same host
      n_links  = 2 + (h>>40) % 4, link k → '/p<(h ^ k·0x9E3779B9)
        % 16^6 :06x>'
    Mirrored in training._indexability_oracle_sql."""
    h = stable_hash64(url, seed ^ _HTML_SALT)
    m = h % 100
    host = url.split("/")[2] if "://" in url else "h0.example"
    head = ["<!doctype html>", "<html>", "<head>",
            f"<title>page {url}</title>"]
    flags = []
    if m < 15:
        flags.append("noindex")
    if 10 <= m < 25:
        flags.append("nofollow")
    if flags:
        content = ", ".join(flags)
        if (h >> 32) & 1:  # attribute order flipped
            head.append(f'<meta content="{content}" name="robots">')
        else:
            head.append(f'<meta name="robots" content="{content}">')
    if (h >> 8) % 100 < 20:
        tgt = f"http://{host}/p{(h >> 16) % (1 << 24):06x}"
        head.append(f'<link href="{tgt}" rel="canonical">')
    head.append("</head>")
    body = ["<body>",
            "<script>var decoy = '<a href=\"/decoy\">x</a>';</script>"]
    n_links = 2 + (h >> 40) % 4
    for k in range(n_links):
        pid = (h ^ (k * 0x9E3779B9)) % (1 << 24)
        body.append(f'<p>see <a href="/p{pid:06x}">link {k}</a></p>')
    body += ["</body>", "</html>"]
    return "\n".join(head + body)


def make_http_response(url: str, seed: int = 42,
                       if_none_match: str | None = None) -> bytes:
    """Deterministic synthetic raw HTTP/1.1 response BYTES for a URL —
    real wire format: status line, CRLF header block (case-varied
    keys), empty line, then a body that for 200s uses CHUNKED
    transfer coding (hex sizes, a chunk extension on the first chunk,
    terminating 0-chunk) the client must actually de-frame.

    Closed-form in h = stable_hash64(url, seed ^ 0x177E), r = h%100:
      r < 80 → 200: body = stride-31 residue walk, n = 100 + (h>>8)%400
               bytes, base = (h>>16)%256, chunk size c = 64+(h>>24)%64;
               (h>>40)&1 selects Content-Encoding: gzip (the chunked
               framing wraps the compressed stream)
      r < 90 → 301: Location: /p<(h>>8) % 16^6 :06x> on the same host,
               empty body
      r < 95 → 404, else 500: fixed 5-byte body 'error'
    200s carry a strong validator ``ETag: "<md5(url)[:8]>"``; a
    request presenting it via ``if_none_match`` gets a 304 Not
    Modified with empty body (this origin's resources are immutable).
    Mirrored in training._http_parse_oracle_sql (one extra hash
    recursion replays the redirect target's status) and
    _http_revalidate_oracle_sql (the 304 path)."""
    h = stable_hash64(url, seed ^ _HTTP_SALT)
    r = h % 100
    host = url.split("/")[2] if "://" in url else "h0.example"
    rid = md5_id(url)[:8]
    if r < 80:
        etag = f'"{md5_id(url)[:8]}"'
        if if_none_match is not None and if_none_match == etag:
            # conditional revalidation hit: the resource is immutable
            # in this origin, so a matching validator always 304s
            return (f"HTTP/1.1 304 Not Modified\r\n"
                    f"ETag: {etag}\r\n"
                    f"Content-Length: 0\r\n\r\n").encode("ascii")
        n = 100 + (h >> 8) % 400
        base = (h >> 16) % 256
        c = 64 + (h >> 24) % 64
        body = ((np.uint64(base) + np.uint64(PPM_STEP)
                 * np.arange(n, dtype=np.uint64)) % np.uint64(256)) \
            .astype(np.uint8).tobytes()
        # half the 200s ship gzip-compressed (most real origins do);
        # the chunked framing then wraps the COMPRESSED stream, so the
        # client must de-frame AND decompress to recover the walk
        gz = (h >> 40) & 1
        enc_hdr = ""
        if gz:
            import gzip as _gzip
            body = _gzip.compress(body, mtime=0)
            enc_hdr = "Content-Encoding: gzip\r\n"
        chunks = []
        for i, off in enumerate(range(0, len(body), c)):
            piece = body[off:off + c]
            ext = b";gen=synthetic" if i == 0 else b""
            chunks.append(b"%x" % len(piece) + ext + b"\r\n"
                          + piece + b"\r\n")
        head = (f"HTTP/1.1 200 OK\r\n"
                f"Content-Type: text/html; charset=utf-8\r\n"
                f"x-request-id: {rid}\r\n"
                f"ETag: {etag}\r\n"
                f"{enc_hdr}"
                f"Transfer-Encoding: chunked\r\n\r\n").encode("ascii")
        return head + b"".join(chunks) + b"0\r\n\r\n"
    if r < 90:
        loc = f"/p{(h >> 8) % (1 << 24):06x}"
        return (f"HTTP/1.1 301 Moved Permanently\r\n"
                f"Location: http://{host}{loc}\r\n"
                f"Content-Length: 0\r\n\r\n").encode("ascii")
    code, reason = (404, "Not Found") if r < 95 else (500, "Server Error")
    return (f"HTTP/1.1 {code} {reason}\r\n"
            f"Content-Length: 5\r\n"
            f"x-request-id: {rid}\r\n\r\nerror").encode("ascii")


def make_sitemap_xml(host: str, seed: int = 42) -> str:
    """Deterministic synthetic sitemap.xml TEXT for a host — a real
    sitemaps.org urlset document (XML declaration, namespaced root,
    an XML comment AND a commented-out decoy <url> block the parser
    must not emit, mixed optional fields).

    Closed-form in sh = stable_hash64(host, seed ^ 0x51E7):
      n   = 5 + sh % 20                       entries
      entry k (0-based):
        pid_k       = (sh >> 8) ⊕ (k · 2654435761)  mod 16^6 → loc path
        prio_e1_k   = 1 + ((sh >> (k mod 32)) & 7)  → '0.<p>'
        day_k       = 1 + ((sh >> (k mod 16)) & 15) → lastmod 2026-07-DD
        changefreq  = (daily, weekly, monthly)[k mod 3]
        lastmod/changefreq are OMITTED when k mod 5 == 4 (optional
        fields must be optional in the parser, and the oracle must
        model the omission)
    Mirrored in training._sitemap_oracle_sql."""
    sh = stable_hash64(host, seed ^ _SITEMAP_SALT)
    n = 5 + sh % 20
    freqs = ("daily", "weekly", "monthly")
    lines = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f"<!-- synthetic sitemap for {host} -->",
        '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
        "  <!-- decoy entry, must be skipped:",
        f"  <url><loc>http://{host}/decoy</loc></url> -->",
    ]
    for k in range(n):
        pid = ((sh >> 8) ^ (k * 2654435761)) % (1 << 24)
        prio = 1 + ((sh >> (k % 32)) & 7)
        day = 1 + ((sh >> (k % 16)) & 15)
        lines.append("  <url>")
        lines.append(f"    <loc>http://{host}/p{pid:06x}</loc>")
        if k % 5 != 4:
            lines.append(f"    <lastmod>2026-07-{day:02d}</lastmod>")
            lines.append(f"    <changefreq>{freqs[k % 3]}</changefreq>")
        lines.append(f"    <priority>0.{prio}</priority>")
        lines.append("  </url>")
    lines.append("</urlset>")
    return "\n".join(lines)


def make_robots_txt(host: str, seed: int = 42) -> str:
    """Deterministic synthetic robots.txt TEXT for a host — a real
    REP file the chunk of which a crawler must actually parse:
    comments, a decoy record for a different bot (Disallow: / that
    the engine's agent must NOT inherit), stacked directives, a
    Crawl-delay, wildcard and $-anchored patterns, and an Allow
    override nested inside a disallowed tree (exercising
    longest-match + allow-wins-tie precedence).

    Corpus paths are '/p' + 6 hex digits, so every rule is closed-form
    in rh = stable_hash64(host, seed ^ 0x0B07):
      d1 = rh & 15, d2 = (rh>>4) & 15   → 'Disallow: /p<x>'   (len 3)
      e  = (rh>>8) & 15                 → 'Allow: /p<d1><e>'  (len 4)
      g  = (rh>>16) & 15                → 'Disallow: /*<g>$'  (len 4)
      delay = 1 + (rh>>12) % 5
    Verdict for path h1..h6 (the DuckDB twin,
    training._robots_real_oracle_sql): allow if (h1=d1 ∧ h2=e)
    [len-4 tie → allow wins]; else disallow if h6=g [len 4]; else
    disallow if h1 ∈ {d1,d2} [len 3]; else allow [len 0]."""
    rh = stable_hash64(host, seed ^ _ROBOTS_SALT)
    d1, d2 = rh & 15, (rh >> 4) & 15
    e, g = (rh >> 8) & 15, (rh >> 16) & 15
    delay = 1 + (rh >> 12) % 5
    lines = [
        f"# synthetic robots for {host}",
        "User-agent: other-bot",
        "Disallow: /",
        "",
        "User-agent: graft-crawler",
        "User-agent: *",
        f"Crawl-delay: {delay}",
        f"Disallow: /p{d1:x}",
    ]
    if d2 != d1:
        lines.append(f"Disallow: /p{d2:x}")
    lines += [
        f"Allow: /p{d1:x}{e:x}  # re-allowed subtree",
        f"Disallow: /*{g:x}$",
        "Sitemap: http://" + host + "/sitemap.xml",
        "",
    ]
    return "\n".join(lines)
