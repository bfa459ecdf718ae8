"""Deterministic cross-engine hashing / shingling expression library.

Every function here has two faces that compute BIT-IDENTICAL results:
a Spark Column expression and a DuckDB SQL fragment (used by the
oracle gate). The shared primitive is a 60-bit integer drawn from
md5 — md5 is identical everywhere, 15 hex chars = 60 bits keeps all
downstream integer arithmetic inside signed-64 range:

    spark:  CAST(conv(substr(md5(x), 1, 15), 16, 10) AS BIGINT)
    duckdb: ('0x' || substr(md5(x), 1, 15))::BIGINT

MinHash permutations use the classic universal-hash family
h_i(x) = (a_i * x + b_i) mod P with P = 2^31 - 1 (Mersenne); inputs
are first reduced mod P, so a_i*x + b_i <= (2^31)^2 + 2^31 < 2^63 —
no overflow on either engine. The (a_i, b_i) constants are generated
once from a fixed seed at import and embedded as literals in both the
Spark plan and the oracle SQL.

Scale: all of this is pure JVM expression work (split / transform /
array_min / conv / md5) — no UDFs, no shuffles, whole-stage codegen
applies; a 100 TB corpus pays exactly one scan.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1

_rng = random.Random(42)
#: (a, b) pairs for the minhash permutation family, fixed at import.
MINHASH_PERMS: list[tuple[int, int]] = [
    (_rng.randrange(1, MERSENNE_P), _rng.randrange(0, MERSENNE_P)) for _ in range(16)
]
MINHASH_BANDS = 4  # 16 perms / 4 bands -> r=4 rows per band
SIMHASH_BITS = 60  # full width of the md5-derived base hash


# ----------------------------------------------------------------- Spark side
def md5_long(col: Column) -> Column:
    """60-bit integer from md5 (Spark side)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def words(text: Column) -> Column:
    return F.split(text, r"\s+")


def word_shingles(text: Column, k: int = 3) -> Column:
    """Array of word k-grams; empty when the document has < k words
    (guards Spark's descending `sequence` when stop < start)."""
    w = words(text)
    n = F.size(w)
    return F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def shingle_hashes(text: Column, k: int = 3) -> Column:
    """Array of 60-bit shingle hashes reduced mod P."""
    return F.transform(word_shingles(text, k), lambda s: md5_long(s) % MERSENNE_P)


def minhash_columns(hashes: Column) -> list[Column]:
    """The 16 minhash values as expressions over the hash array —
    no explode, no shuffle: array_min over a transform."""
    return [
        F.array_min(F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % MERSENNE_P))
        for a, b in MINHASH_PERMS
    ]


def band_signature(mh_cols: list[Column], band: int) -> Column:
    """md5 signature of one band's r minhash values."""
    r = len(MINHASH_PERMS) // MINHASH_BANDS
    vals = mh_cols[band * r : (band + 1) * r]
    return F.md5(F.concat_ws(",", *[v.cast("string") for v in vals]))


def _simhash_bit_merge(i: int):
    def merge(acc: Column, h: Column) -> Column:
        return acc + F.when(
            F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    return merge


def simhash(tokens_hashes: Column, bits: int = SIMHASH_BITS) -> Column:
    """SimHash fingerprint over an array of 60-bit token hashes:
    bit i is set iff sum over tokens of (+1 if bit i of hash else -1)
    is positive. Pure array aggregation — one pass, no shuffle."""
    out = F.lit(0).cast("bigint")
    for i in range(bits):
        bit_sum = F.aggregate(tokens_hashes, F.lit(0), _simhash_bit_merge(i))
        out = out + F.when(bit_sum > 0, F.lit(1 << i).cast("bigint")).otherwise(0)
    return out


# ---------------------------------------------------------------- DuckDB side
def sql_md5_long(expr: str) -> str:
    return f"(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def sql_word_shingles(text_expr: str, k: int = 3) -> str:
    """DuckDB list of word k-grams (1-based inclusive list slicing)."""
    return (
        f"[array_to_string(string_split_regex({text_expr}, '\\s+')[i:i+{k - 1}], ' ') "
        f"for i in generate_series(1, greatest(len(string_split_regex({text_expr}, '\\s+')) - {k - 1}, 0))]"
    )


def sql_shingle_hash(shingle_expr: str) -> str:
    return f"({sql_md5_long(shingle_expr)} % {MERSENNE_P})"


def sql_minhash_select(hash_list_expr: str) -> list[str]:
    """16 minhash expressions over a DuckDB list of hashes."""
    return [
        f"list_min([({a} * h + {b}) % {MERSENNE_P} for h in {hash_list_expr}])"
        for a, b in MINHASH_PERMS
    ]


def sql_simhash(hash_list_expr: str, bits: int = SIMHASH_BITS) -> str:
    terms = []
    for i in range(bits):
        bit_sum = (
            f"list_sum([CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END "
            f"for h in {hash_list_expr}])"
        )
        terms.append(f"(CASE WHEN {bit_sum} > 0 THEN (1::BIGINT << {i}) ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"
