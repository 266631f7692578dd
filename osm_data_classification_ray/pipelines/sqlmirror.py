"""Shared DuckDB mirrors of the engine's counter-based hash kernels.

The fixtures derive every synthetic value from splitmix64 / FNV-1a
(fixtures/gen.py, functions/strhash.py), so SQL oracles can reproduce them
bit-exactly: 64-bit multiplies run in HUGEINT decomposed into 32-bit limbs
mod 2^64 (HUGEINT alone overflows on a 64x64 product), xor/shift stay on
UBIGINT. Validated bit-exact against gen.uniform01 / strhash.fnv1a_list in
tests (q35/q39/q52 oracles all hash-match the Ray side).
"""

from __future__ import annotations

SM_PRIME = 0x100000001B3
SM_GOLDEN = 0x9E3779B97F4A7C15
SM_C1 = 0xBF58476D1CE4E5B9
SM_C2 = 0x94D049BB133111EB
SM_MOD = 1 << 64
# the engine's FROZEN round-1 constants (functions/strhash.py) — the offset
# basis deliberately differs from the textbook FNV-1a value
FNV_OFFSET = 1469598103934665603
FNV_PRIME = 1099511628211


def sm64_base(stream: int, seed: int = 42) -> int:
    """Python-int mirror of gen.hash_u64's per-stream base constant."""
    x = (seed * SM_PRIME + stream) % SM_MOD
    x = (x + SM_GOLDEN) % SM_MOD
    x = ((x ^ (x >> 30)) * SM_C1) % SM_MOD
    x = ((x ^ (x >> 27)) * SM_C2) % SM_MOD
    return x ^ (x >> 31)


def mulmod_sql(xcol: str, c: int) -> str:
    """(xcol * c) mod 2^64 in DuckDB via 32-bit limb products (HUGEINT-safe)."""
    clo, chi = c & 0xFFFFFFFF, c >> 32
    return (
        f"CAST((CAST(({xcol}) & 4294967295 AS HUGEINT) * {clo}"
        f" + ((CAST(({xcol}) & 4294967295 AS HUGEINT) * {chi}) % 4294967296) * 4294967296"
        f" + ((CAST(({xcol}) >> 32 AS HUGEINT) * {clo}) % 4294967296) * 4294967296)"
        f" % {SM_MOD} AS UBIGINT)"
    )


def sm64_steps(cte_prefix: str, src_cte: str, key_cols: str, x0_expr: str) -> str:
    """CTE chain applying the splitmix64 finalizer to ``x0_expr``; the last
    CTE ``{cte_prefix}f`` carries ``{key_cols}`` plus ``hv`` (the hash)."""
    p = cte_prefix
    return f"""
{p}0 AS (SELECT {key_cols}, {x0_expr} AS x0 FROM {src_cte}),
{p}1 AS (SELECT {key_cols}, CAST((CAST(x0 AS HUGEINT) + {SM_GOLDEN}) % {SM_MOD} AS UBIGINT) AS x1 FROM {p}0),
{p}2 AS (SELECT {key_cols}, {mulmod_sql('xor(x1, x1 >> 30)', SM_C1)} AS x2 FROM {p}1),
{p}3 AS (SELECT {key_cols}, {mulmod_sql('xor(x2, x2 >> 27)', SM_C2)} AS x3 FROM {p}2),
{p}f AS (SELECT {key_cols}, xor(x3, x3 >> 31) AS hv FROM {p}3)"""
