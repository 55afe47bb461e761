"""Cross-engine deterministic expression builders.

Every operator in this engine is validated against a DuckDB oracle by
value hash, so any computed value must be BIT-IDENTICAL across Spark
and DuckDB. These helpers emit matched (Spark SQL, DuckDB SQL)
expression pairs for the places where naive code would diverge:

1. ``poly_hash``   — polynomial string hash over unicode code points,
   exact 64-bit integer arithmetic in both engines (Spark's murmur3 /
   xxhash64 and DuckDB's hash() are engine-specific, so we roll our
   own). h = fold(h*31 + codepoint) mod 1_000_000_007, seed 7.
   Intermediates stay < 3.1e10 << 2^63: no overflow anywhere.
2. ``tokens``      — lowercase alnum tokenization via the same regex
   class (safe subset of Java regex ∩ RE2).
3. decimal money aggregation — float sums are order-dependent, so
   money math casts to DECIMAL first (exact, associative), rounds,
   then casts to DOUBLE for a stable comparison dtype.

Spark-side expressions are plain SQL strings usable with F.expr()
— they stay inside whole-stage codegen (no Python UDFs).
"""

from __future__ import annotations

HASH_MOD = 1_000_000_007
HASH_SEED = 7
HASH_MULT = 31


# ---------------------------------------------------------------- hashing
def spark_poly_hash(col: str) -> str:
    """Spark SQL expr: polynomial hash of a string column."""
    return (
        f"aggregate(filter(split({col}, ''), x -> x != ''), "
        f"CAST({HASH_SEED} AS BIGINT), "
        f"(acc, x) -> (acc * {HASH_MULT} + ascii(x)) % {HASH_MOD})"
    )


def duck_poly_hash(col: str) -> str:
    """DuckDB SQL: the same polynomial hash."""
    return (
        f"list_reduce(list_prepend(CAST({HASH_SEED} AS BIGINT), "
        f"list_transform(list_filter(regexp_split_to_array({col}, ''), x -> x != ''), "
        f"x -> CAST(unicode(x) AS BIGINT))), "
        f"(acc, x) -> (acc * {HASH_MULT} + x) % {HASH_MOD})"
    )


def minhash_params(k: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) pairs for k minhash permutations
    h_i(x) = (a_i*x + b_i) mod HASH_MOD."""
    return [(2 * i + 3, 97 * i + 13) for i in range(k)]


# ------------------------------------------------------------- tokenizing
TOKEN_SPLIT_RE = "[^a-z0-9]+"


def spark_tokens(col: str) -> str:
    """Spark SQL expr: array of lowercase alnum tokens (empties removed,
    multiplicity preserved)."""
    return f"filter(split(lower({col}), '{TOKEN_SPLIT_RE}'), x -> x != '')"


def duck_tokens(col: str) -> str:
    return f"list_filter(regexp_split_to_array(lower({col}), '{TOKEN_SPLIT_RE}'), x -> x != '')"


def spark_shingles(tokens_expr: str, n: int = 3) -> str:
    """Spark SQL expr: distinct word n-gram shingles from a token array.
    Uses 1-based element_at to mirror DuckDB list indexing. Guarded with
    if(): Spark's sequence(1, 0) yields a DESCENDING [1,0], not []."""
    grams = ", ".join(f"element_at({tokens_expr}, i + {j})" for j in range(n))
    return (
        f"if(size({tokens_expr}) < {n}, array(), "
        f"array_distinct(transform(sequence(1, size({tokens_expr}) - {n - 1}), "
        f"i -> concat_ws(' ', {grams}))))"
    )


def duck_shingles(tokens_expr: str, n: int = 3) -> str:
    joined = ", ".join(f"t[i + {j}]" for j in range(n))
    return (
        f"list_distinct(list_transform(range(1, greatest(len({tokens_expr}) - {n - 2}, 1)), "
        f"i -> concat_ws(' ', {', '.join(f'{tokens_expr}[i + {j}]' for j in range(n))})))"
    )


# ------------------------------------------------------ decimal money agg
# Determinism policy: NEVER round doubles (engines may tie-break
# differently). Aggregate money in DECIMAL (exact + associative →
# shuffle-order independent), then CAST the exact sum to DOUBLE
# (correctly-rounded conversion, identical in both engines). Scalar
# double expressions over identical operands are bit-identical by IEEE
# 754 and need no treatment; where truncation is wanted use floor6.


def money_sum(expr: str, alias: str) -> str:
    """Engine-shared aggregate: exact decimal sum surfaced as DOUBLE.
    ``expr`` must already be decimal (use dec())."""
    return f"CAST(SUM({expr}) AS DOUBLE) AS {alias}"


def dec(col: str, p: int = 18, s: int = 4) -> str:
    return f"CAST({col} AS DECIMAL({p},{s}))"


def ratio(num: str, den: str) -> str:
    """Engine-shared: int/int division as double (identical operands →
    identical IEEE result; no rounding)."""
    return f"CAST({num} AS DOUBLE) / CAST({den} AS DOUBLE)"


def floor6(expr: str) -> str:
    """Deterministic 6-digit truncation (floor is tie-free, unlike
    round): identical inputs → identical outputs in any engine."""
    return f"FLOOR(({expr}) * 1e6) / 1e6"


# ----------------------------------------------------- bi-engine templates
def bi_sql(template: str, **frags: tuple[str, str] | str) -> tuple[str, str]:
    """Render one SQL template for both engines. Each fragment is either
    a (spark_text, duck_text) pair or a single shared string. Returns
    (spark_sql, duckdb_sql). Keeping ONE template per query is what
    guarantees the Spark plan and the oracle stay structurally in sync.
    """
    s = {k: (v if isinstance(v, str) else v[0]) for k, v in frags.items()}
    d = {k: (v if isinstance(v, str) else v[1]) for k, v in frags.items()}
    return template.format(**s), template.format(**d)


def bit_probe(hash_expr: str, j: int) -> str:
    """Engine-shared bit extraction via pure integer arithmetic (no
    engine-specific shift/div operators): 1 if bit j of hash set else 0.
    Valid for non-negative hashes."""
    return f"(CASE WHEN ({hash_expr}) % {2 ** (j + 1)} >= {2 ** j} THEN 1 ELSE 0 END)"
