"""M8 randomizer surface: UA / accept-language / viewport columns.

The reference draws a random desktop user agent (the ``user-agents``
npm package, crawler/src/helpers.ts:28-38), a random Accept-Language
header (helpers.ts:40-48) and a random viewport from a fixed list of
common screen sizes (crawler/src/config.ts:32-33, helpers.ts:50-59) —
all UNSEEDED, per crawl. The rebuild's determinism requirement
(SURVEY.md §7.4) replaces wall-clock randomness with a stable per-URL
hash draw: the same (seed, url) always yields the same UA/locale/
viewport, so parallel runs and retries are replayable, while the
distribution across a corpus is still uniform over the lists.

The lists are generic public values (standard browser UA shapes,
BCP-47 language tags, common screen resolutions) — not copied from the
reference's bundled package data.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .hashing import stable_hash64

USER_AGENTS = [
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/119.0.0.0 Safari/537.36 Edg/119.0.0.0",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Macintosh; Intel Mac OS X 10_15_7) AppleWebKit/605.1.15 "
    "(KHTML, like Gecko) Version/17.1 Safari/605.1.15",
    "Mozilla/5.0 (X11; Linux x86_64) AppleWebKit/537.36 "
    "(KHTML, like Gecko) Chrome/120.0.0.0 Safari/537.36",
    "Mozilla/5.0 (Windows NT 10.0; Win64; x64; rv:121.0) "
    "Gecko/20100101 Firefox/121.0",
    "Mozilla/5.0 (X11; Ubuntu; Linux x86_64; rv:121.0) "
    "Gecko/20100101 Firefox/121.0",
]

ACCEPT_LANGUAGES = [
    "en-US,en;q=0.9",
    "en-GB,en;q=0.9",
    "de-DE,de;q=0.9,en;q=0.7",
    "fr-FR,fr;q=0.9,en;q=0.7",
    "es-ES,es;q=0.9,en;q=0.7",
    "pt-BR,pt;q=0.9,en;q=0.7",
    "it-IT,it;q=0.9,en;q=0.7",
    "nl-NL,nl;q=0.9,en;q=0.7",
]

# common desktop screen sizes (reference keeps a similar fixed list,
# crawler/src/config.ts:32-33)
VIEWPORTS = [
    (1366, 768), (1920, 1080), (1536, 864), (1440, 900),
    (1280, 720), (1600, 900), (2560, 1440), (1680, 1050),
]

_UA_SALT = 0x0A11
_LANG_SALT = 0x1A22
_VP_SALT = 0x2A33


def randomize_batch(batch: pa.Table, *, seed: int = 42,
                    url_column: str = "url") -> pa.Table:
    """Append (user_agent, accept_language, viewport_w, viewport_h)
    drawn deterministically per URL. Vectorized: one hash per row per
    field, list indexing via numpy take."""
    urls = batch[url_column].to_pylist()
    n = len(urls)
    ua_idx = np.fromiter((stable_hash64(u, seed ^ _UA_SALT) % len(USER_AGENTS)
                          for u in urls), dtype=np.int64, count=n)
    lg_idx = np.fromiter(
        (stable_hash64(u, seed ^ _LANG_SALT) % len(ACCEPT_LANGUAGES)
         for u in urls), dtype=np.int64, count=n)
    vp_idx = np.fromiter((stable_hash64(u, seed ^ _VP_SALT) % len(VIEWPORTS)
                          for u in urls), dtype=np.int64, count=n)
    ua_arr = np.asarray(USER_AGENTS, dtype=object)
    lg_arr = np.asarray(ACCEPT_LANGUAGES, dtype=object)
    vw = np.asarray([v[0] for v in VIEWPORTS], dtype=np.int32)
    vh = np.asarray([v[1] for v in VIEWPORTS], dtype=np.int32)
    return (batch
            .append_column("user_agent", pa.array(ua_arr[ua_idx], pa.string()))
            .append_column("accept_language",
                           pa.array(lg_arr[lg_idx], pa.string()))
            .append_column("viewport_w", pa.array(vw[vp_idx]))
            .append_column("viewport_h", pa.array(vh[vp_idx])))
