"""Real robots.txt (Robots Exclusion Protocol) parsing + matching.

The reference deploys a robots-aware crawler fleet; the sandboxed
engine's LIVE verdicts are the deterministic hash-simulated
``state.politeness.RobotsCache`` (no network). This module is the
REAL text path: a line-based REP parser (user-agent group selection,
Allow/Disallow with ``*`` wildcards and ``$`` end anchors,
Crawl-delay) plus Google-REP matching semantics — longest pattern
wins, Allow wins length ties. ``state.politeness.RealRobots`` wraps
it behind the same ``allowed(url)`` interface as RobotsCache, fed by
the synthetic per-host robots.txt origin
(sources.corpus.make_robots_txt), and the whole text → parse → match
chain is oracle-gated by ``robots_real_verdicts`` (the DuckDB twin
replays every verdict from the generator's closed form without
parsing any text).

Public-spec references: RFC 9309 (Robots Exclusion Protocol) and the
Google robots.txt specification (wildcard/anchor matching, longest
match, allow-on-tie).
"""

from __future__ import annotations


def _match(pattern: str, path: str) -> bool:
    """REP pattern match: ``*`` spans any chars, ``$`` (only
    meaningful at the end) anchors; otherwise prefix semantics.

    Middle chunks match greedily left-to-right (earliest occurrence —
    correct for existence, it leaves maximal room for later chunks);
    an anchored FINAL chunk must match at the END of the path
    (endswith, at or after the middle-match frontier) — a plain
    leftmost find would miss '/p..g' under '/*g$' when 'g' also
    occurs earlier in the path."""
    anchored = pattern.endswith("$")
    if anchored:
        pattern = pattern[:-1]
    chunks = pattern.split("*")
    if len(chunks) == 1:  # no wildcard
        return path == pattern if anchored else path.startswith(pattern)
    if not path.startswith(chunks[0]):
        return False
    pos = len(chunks[0])
    for chunk in chunks[1:-1]:
        if not chunk:
            continue  # consecutive '*' spans freely
        i = path.find(chunk, pos)
        if i < 0:
            return False
        pos = i + len(chunk)
    last = chunks[-1]
    if not last:  # pattern ends with '*': tail is free either way
        return True
    if anchored:
        return path.endswith(last) and len(path) - len(last) >= pos
    return path.find(last, pos) >= 0


class RobotsRules:
    """One parsed robots.txt, specialized to one user agent."""

    __slots__ = ("rules", "crawl_delay")

    def __init__(self, rules: list[tuple[bool, str]],
                 crawl_delay: float | None):
        # rules sorted by (pattern length desc, allow first) so the
        # FIRST match is the winner under longest-wins/allow-on-tie
        self.rules = sorted(rules,
                            key=lambda r: (-len(r[1]), not r[0]))
        self.crawl_delay = crawl_delay

    def decision(self, path: str) -> tuple[bool, int]:
        """(allowed, winning_pattern_length) — length 0 when no rule
        matches (default allow)."""
        for allow, pat in self.rules:
            if _match(pat, path):
                return allow, len(pat)
        return True, 0

    def allowed(self, path: str) -> bool:
        return self.decision(path)[0]


def parse_robots_txt(text: str, agent: str = "*") -> RobotsRules:
    """Parse robots.txt text and select the record that governs
    ``agent``: the group whose User-agent token is the LONGEST
    case-insensitive substring of ``agent`` wins; a ``*`` group is
    the fallback. Comments (#…) stripped; unknown directives
    ignored; multiple stacked User-agent lines share one record."""
    agent_l = agent.lower()
    records: list[tuple[list[str], list[tuple[bool, str]], float | None]] = []
    cur_agents: list[str] = []
    cur_rules: list[tuple[bool, str]] = []
    cur_delay: float | None = None
    in_rules = False

    def flush():
        nonlocal cur_agents, cur_rules, cur_delay, in_rules
        if cur_agents:
            records.append((cur_agents, cur_rules, cur_delay))
        cur_agents, cur_rules, cur_delay = [], [], None
        in_rules = False

    for raw in text.splitlines():
        line = raw.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if in_rules:  # a new record starts
                flush()
            cur_agents.append(val.lower())
        elif key in ("allow", "disallow"):
            in_rules = True
            if val:  # empty Disallow: == allow everything (no rule)
                cur_rules.append((key == "allow", val))
        elif key == "crawl-delay":
            in_rules = True
            try:
                cur_delay = float(val)
            except ValueError:
                pass
        # sitemap/other directives: legal, record-independent, ignored
    flush()

    best: tuple[int, list[tuple[bool, str]], float | None] | None = None
    fallback = None
    for agents, rules, delay in records:
        for a in agents:
            if a == "*":
                fallback = (rules, delay)
            elif a and a in agent_l:
                if best is None or len(a) > best[0]:
                    best = (len(a), rules, delay)
    if best is not None:
        return RobotsRules(best[1], best[2])
    if fallback is not None:
        return RobotsRules(fallback[0], fallback[1])
    return RobotsRules([], None)
