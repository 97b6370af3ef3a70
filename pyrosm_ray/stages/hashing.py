"""Deterministic 64-bit hashing, engine-side (numpy) AND oracle-side (SQL).

Every dedup/similarity operator that feeds a DuckDB oracle uses exactly two
primitives, each with a bit-identical SQL rendering:

* :func:`stable64` — md5 of the UTF-8 string, last 8 digest bytes read
  little-endian. This IS DuckDB's ``md5_number_lower``, so the oracle can
  hash shingles/words with a single builtin call.
* :func:`hash64` — an xorshift-multiply mix (splitmix/murmur-style
  avalanche) over uint64 with wrapping arithmetic. :func:`hash64_sql`
  renders the identical computation in SQL: XOR/shift run in the UBIGINT
  domain, and each wrapping 64-bit multiply is expressed as HUGEINT modular
  arithmetic split at 32 bits (a*b mod 2^64 =
  ((hi(a)*b mod 2^32) << 32 + lo(a)*b) mod 2^64 — every intermediate fits
  a 128-bit HUGEINT).

Python's builtin ``hash()`` is salted per process and DuckDB's ``hash()``
is version-dependent; these two are the process- and engine-stable
replacements.
"""

from __future__ import annotations

import hashlib

import numpy as np

MASK64 = (1 << 64) - 1
_MUL1 = 0xFF51AFD7ED558CCD
_MUL2 = 0xC4CEB9FE1A85EC53
_SEED_MUL = 0x9E3779B97F4A7C15


def stable64(s: str) -> int:
    """Process-stable 64-bit string hash == DuckDB ``md5_number_lower``."""
    return int.from_bytes(
        hashlib.md5(s.encode("utf-8")).digest()[8:], "little")


def stable64_sql(expr: str) -> str:
    """SQL rendering of :func:`stable64` (UBIGINT result)."""
    return f"md5_number_lower({expr})"


def hash64(arr: np.ndarray, seed: int) -> np.ndarray:
    """Vectorised xorshift-multiply mix of uint64 -> uint64."""
    with np.errstate(over="ignore"):
        x = arr.astype(np.uint64) + np.uint64(
            (seed * _SEED_MUL or 1) & MASK64)
        x ^= x >> np.uint64(33)
        x *= np.uint64(_MUL1)
        x ^= x >> np.uint64(33)
        x *= np.uint64(_MUL2)
        x ^= x >> np.uint64(33)
    return x


def _mulmod_sql(x: str, c: int) -> str:
    """(x * c) mod 2^64 with every intermediate inside HUGEINT range."""
    return (f"CAST((((({x} >> 32) * {c}::HUGEINT) % 4294967296) * 4294967296"
            f" + ({x} & 4294967295) * {c}::HUGEINT) % 18446744073709551616"
            f" AS UBIGINT)")


def hash64_sql(expr: str, seed: int) -> str:
    """SQL rendering of ``hash64(expr, seed)``; ``expr`` must be UBIGINT."""
    add = (seed * _SEED_MUL or 1) & MASK64
    # wrapping add in HUGEINT, back to UBIGINT
    x = (f"CAST((CAST({expr} AS HUGEINT) + {add}::HUGEINT)"
         f" % 18446744073709551616 AS UBIGINT)")
    x = f"xor({x}, {x} >> 33)"
    x = _mulmod_sql(f"CAST({x} AS HUGEINT)", _MUL1)
    x = f"xor({x}, {x} >> 33)"
    x = _mulmod_sql(f"CAST({x} AS HUGEINT)", _MUL2)
    x = f"xor({x}, {x} >> 33)"
    return x


def _mulmod_sql_expr(x: str, c: str) -> str:
    """(x * c) mod 2^64 where ``c`` is a SQL expression (HUGEINT, < 2^64)."""
    return (f"CAST((((({x} >> 32) * ({c})) % 4294967296) * 4294967296"
            f" + ({x} & 4294967295) * ({c})) % 18446744073709551616"
            f" AS UBIGINT)")


def hash64_sql_dynamic(expr: str, seed_expr: str) -> str:
    """SQL rendering of ``hash64(expr, seed)`` where the seed is itself a
    SQL expression (BIGINT >= 1; the ``or 1`` zero-seed escape never
    triggers for positive seeds)."""
    add = _mulmod_sql_expr(f"CAST({seed_expr} AS HUGEINT)",
                           f"{_SEED_MUL}::HUGEINT")
    x = (f"CAST((CAST({expr} AS HUGEINT) + CAST({add} AS HUGEINT))"
         f" % 18446744073709551616 AS UBIGINT)")
    x = f"xor({x}, {x} >> 33)"
    x = _mulmod_sql(f"CAST({x} AS HUGEINT)", _MUL1)
    x = f"xor({x}, {x} >> 33)"
    x = _mulmod_sql(f"CAST({x} AS HUGEINT)", _MUL2)
    x = f"xor({x}, {x} >> 33)"
    return x


def to_int64(arr: np.ndarray) -> np.ndarray:
    """uint64 -> int64 two's-complement wrap (Arrow-friendly dtype)."""
    return arr.astype(np.uint64).view(np.int64)


def to_int64_sql(expr: str) -> str:
    """SQL rendering of the uint64 -> int64 wrap for a UBIGINT ``expr``."""
    return (f"CAST(CASE WHEN {expr} >= 9223372036854775808"
            f" THEN CAST({expr} AS HUGEINT) - 18446744073709551616"
            f" ELSE CAST({expr} AS HUGEINT) END AS BIGINT)")
