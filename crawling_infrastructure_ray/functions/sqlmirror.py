"""DuckDB transliteration of stable_hash64 (hashing.py:23-35).

The oracle-SQL gate needs DuckDB to recompute the engine's
deterministic hash draws (M8 randomizers, HLL registers) bit-for-bit.
64-bit wrapping arithmetic is expressed as HUGEINT products reduced
mod 2^64; constants >= 2^63 are decomposed into 32-bit halves
(a*c mod 2^64 = (a*c_lo mod 2^64 + (a*c_hi mod 2^32) << 32) mod 2^64
— every intermediate fits HUGEINT). FNV-1a walks the string bytes in
a recursive CTE (inputs are ASCII by construction); the splitmix64
finalizer is 6 chained CTE stages.
"""

from __future__ import annotations

M64 = 1 << 64
FNV_OFF = 0xcbf29ce484222325
FNV_P = 0x100000001b3
_GOLD = 0x9E3779B97F4A7C15
_C1, _C2 = 0xBF58476D1CE4E5B9, 0x94D049BB133111EB

# Python str.split() for ASCII text == split on this class, dropping
# empty tokens. NOT '\s+': RE2 \s is [\t\n\f\r ] (no \v), and a bare
# trim() in DuckDB strips spaces only, so trim+'\s+' silently emits
# empty edge tokens for '\t'/'\n'-padded text and fails to split on
# '\v' — both plain-ASCII divergences from the engine's tokenizers.
SQL_WS_CLASS = r"[ \t\n\r\f\v]+"


def tokens_sql(expr: str) -> str:
    """SQL expr: the token LIST of ``expr`` with Python-str.split()
    semantics for ASCII input (class split, empties dropped)."""
    return (f"list_filter(string_split_regex({expr}, '{SQL_WS_CLASS}'), "
            f"__x -> __x <> '')")


def mul_mod64(a: str, c: int) -> str:
    """SQL expr: (a * c) mod 2^64 for a UBIGINT expr ``a`` (< 2^64)
    and a Python-int constant ``c``."""
    if c < (1 << 63):  # (<2^64) x (<2^63) fits HUGEINT
        return f"CAST((CAST({a} AS HUGEINT) * {c}) % {M64} AS UBIGINT)"
    chi, clo = c >> 32, c & 0xFFFFFFFF
    return (f"CAST(((CAST({a} AS HUGEINT) * {clo}) % {M64} + "
            f"((CAST({a} AS HUGEINT) * {chi}) % {1 << 32}) * {1 << 32}) "
            f"% {M64} AS UBIGINT)")


def splitmix_stage_exprs(col: str) -> list[str]:
    """The 6 splitmix64 finalizer steps as SQL exprs over column
    ``col`` — apply one per chained CTE stage."""
    return [
        f"CAST((CAST({col} AS HUGEINT) + {_GOLD}) % {M64} AS UBIGINT)",
        f"xor({col}, {col} >> 30)",
        mul_mod64(col, _C1),
        f"xor({col}, {col} >> 27)",
        mul_mod64(col, _C2),
        f"xor({col}, {col} >> 31)",
    ]


def stable_hash64_cte(source_sql: str, text_col: str,
                      seeds: dict[str, int],
                      carry_cols: tuple[str, ...] = (),
                      prefix: str = "__",
                      include_with: bool = True) -> tuple[str, str]:
    """Build ``WITH RECURSIVE ...`` SQL computing stable_hash64 of
    ``text_col`` (an ASCII string column of the single-SELECT
    ``source_sql``) for each (output column -> seed) in ``seeds``.

    Returns (with_clause, final_cte_name); the final CTE has columns
    (text_col, *carry_cols, *seeds-keys) with each seed column holding
    the finished 64-bit hash as UBIGINT. Pass distinct ``prefix``es
    (and ``include_with=False`` on all but the first) to compose
    several hash recursions in one query — DuckDB allows multiple
    recursive members under one WITH RECURSIVE.
    """
    cols = list(seeds)
    carry = "".join(f", {c}" for c in carry_cols)
    init = ", ".join(
        f"CAST({(FNV_OFF ^ s) & (M64 - 1)} AS UBIGINT) AS {c}"
        for c, s in seeds.items())
    step = ", ".join(
        f"CAST((CAST(xor({c}, CAST(ord(substr({text_col}, i, 1)) AS UBIGINT))"
        f" AS HUGEINT) * {FNV_P}) % {M64} AS UBIGINT) AS {c}"
        for c in cols)
    head = "WITH RECURSIVE " if include_with else ", "
    sql = (
        f"{head}{prefix}src AS ({source_sql}), "
        f"{prefix}fnv AS (SELECT {text_col}{carry}, 1 AS i, {init} "
        f"FROM {prefix}src "
        f"UNION ALL SELECT {text_col}{carry}, i + 1, {step} "
        f"FROM {prefix}fnv WHERE i <= length({text_col})), "
        f"{prefix}done AS (SELECT {text_col}{carry}, {', '.join(cols)} "
        f"FROM {prefix}fnv WHERE i = length({text_col}) + 1)")
    prev = f"{prefix}done"
    for k in range(6):
        exprs = ", ".join(f"{splitmix_stage_exprs(c)[k]} AS {c}"
                          for c in cols)
        sql += (f", {prefix}mix{k} AS (SELECT {text_col}{carry}, {exprs} "
                f"FROM {prev})")
        prev = f"{prefix}mix{k}"
    return sql, prev


def splitmix64_cte(source_sql: str, expr: str, out_col: str,
                  carry_cols: tuple[str, ...] = (),
                  prefix: str = "__sm",
                  include_with: bool = True) -> tuple[str, str]:
    """Chained-CTE SQL computing splitmix64 of the UBIGINT expression
    ``expr`` (over the single-SELECT ``source_sql``) into ``out_col``
    — the DuckDB twin of hashing.splitmix64_np. No recursion needed:
    the 6 finalizer stages chain as plain CTEs. Returns
    (with_clause, final_cte_name); the final CTE carries
    (*carry_cols, out_col)."""
    carry = ", ".join(carry_cols)
    head = "WITH " if include_with else ", "
    sql = (f"{head}{prefix}0 AS (SELECT {carry}{', ' if carry else ''}"
           f"CAST({expr} AS UBIGINT) AS {out_col} FROM ({source_sql}) __s)")
    prev = f"{prefix}0"
    for k, stage in enumerate(splitmix_stage_exprs(out_col)):
        sql += (f", {prefix}{k + 1} AS (SELECT {carry}"
                f"{', ' if carry else ''}{stage} AS {out_col} FROM {prev})")
        prev = f"{prefix}{k + 1}"
    return sql, prev
