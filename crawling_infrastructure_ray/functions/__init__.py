from .scalars import average, gaussian, format_bytes, time_format, chunk, seeded_rng
from .hashing import stable_hash64, md5_id, rolling_fingerprint
from .urltools import canonicalize_url, parse_host, truncate_host_labels

__all__ = [
    "average", "gaussian", "format_bytes", "time_format", "chunk", "seeded_rng",
    "stable_hash64", "md5_id", "rolling_fingerprint",
    "canonicalize_url", "parse_host", "truncate_host_labels",
]
