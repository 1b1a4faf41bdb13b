"""SimHash (64-bit) near-duplicate fingerprinting.

Engine-internal variant of the portable minhash operator: uses Spark's
built-in ``xxhash64`` (JVM-side, codegen'd — no Python, no md5 string
round-trips). Per token the hash contributes +1/-1 to each of 64 bit
positions; the sign vector's bit pattern is the fingerprint. Documents
within a small Hamming distance are near-duplicates.

Fully columnar: tokens → int64 hashes → per-bit contributions via
bit arithmetic folded with ``aggregate`` — one projection, no explode,
no shuffle. (No SQL oracle: DuckDB lacks xxhash64; determinism and
near-dup behavior are pytest-verified instead.)
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# 2^b as signed-long literals; bit 63 is the sign bit (-2^63).
_POW2 = [1 << b for b in range(63)] + [-(1 << 63)]


def simhash64(tokens: Column) -> Column:
    """64-bit simhash of an array<string> column, as a signed long."""
    hashes = F.transform(tokens, lambda t: F.xxhash64(t))
    pows = F.array(*[F.lit(p).cast("long") for p in _POW2])
    # For each bit b: count tokens with bit set minus tokens with bit
    # clear; bit b of the result = (count > 0). Bit tests go through a
    # literal power-of-two array (shift-by-column isn't expressible in
    # the Python DSL; AND with 2^b is, and codegens identically).
    bit_counts = F.transform(
        F.sequence(F.lit(0), F.lit(63)),
        lambda b: F.aggregate(
            hashes,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.element_at(pows, b + 1)) != 0, 1).otherwise(-1),
        ),
    )
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(63)),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(
            F.element_at(bit_counts, b + 1) > 0,
            F.element_at(pows, b + 1),
        ).otherwise(F.lit(0).cast("long")),
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit fingerprints."""
    return F.bit_count(a.bitwiseXOR(b))


def simhash_documents(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → (doc_id, simhash) using whitespace tokens."""
    return df.select(
        "doc_id", simhash64(F.split(F.col(text_col), " ")).alias("simhash")
    )
