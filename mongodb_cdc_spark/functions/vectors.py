"""Vector math over ArrayType(Float) embedding columns — pure expression
builders (no UDFs; everything stays JVM-side).

Determinism across engines: a dot product written as a fold/aggregate is
engine-ordered, and DuckDB's ``list_cosine_similarity`` may accumulate in
float32 — so for exact-oracle paths we UNROLL the dot product into a
left-associative ``a[1]*b[1] + a[2]*b[2] + ...`` chain. Both engines then
parse an identical expression tree and execute the identical sequence of
IEEE-754 double ops: bit-exact agreement, no tolerance needed. 64 terms
inline is well within codegen limits and compiles to a straight-line loop
body.

For non-oracle hot paths (ANN bucketing at scale) the higher-order
``aggregate(zip_with(...))`` form is equivalent and shorter; both are
provided.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

DIM = 64  # embeddings table dimension (FIXTURES.md)


def _ix(arr: str, i: int, dialect: str) -> str:
    """1-based element access: Spark ``element_at(a, i)``; DuckDB ``a[i]``
    (DuckDB's element_at is map-only)."""
    return f"element_at({arr}, {i})" if dialect == "spark" else f"{arr}[{i}]"


def dot_unrolled_sql(a: str, b: str, dim: int = DIM, dialect: str = "spark") -> str:
    """Left-associative unrolled dot product for the given SQL dialect."""
    terms = " + ".join(
        f"CAST({_ix(a, i, dialect)} AS DOUBLE) * CAST({_ix(b, i, dialect)} AS DOUBLE)"
        for i in range(1, dim + 1)
    )
    return f"({terms})"


def cosine_unrolled_sql(a: str, b: str, dim: int = DIM, dialect: str = "spark") -> str:
    """Exact-parity cosine similarity: unrolled dot / (sqrt · sqrt).
    sqrt and divide are correctly-rounded IEEE ops — deterministic."""
    d = dialect
    return (
        f"({dot_unrolled_sql(a, b, dim, d)} / "
        f"(sqrt({dot_unrolled_sql(a, a, dim, d)}) * sqrt({dot_unrolled_sql(b, b, dim, d)})))"
    )


def dot(a: Column | str, b: Column | str) -> Column:
    """Fold-style dot product for non-oracle paths:
    ``aggregate(zip_with(a, b, *), 0.0, +)`` — sequential fold, JVM-side."""
    a = F.col(a) if isinstance(a, str) else a
    b = F.col(b) if isinstance(b, str) else b
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def cosine(a: Column | str, b: Column | str) -> Column:
    """Fold-style cosine for non-oracle paths."""
    return dot(a, b) / (F.sqrt(dot(a, a)) * F.sqrt(dot(b, b)))


# ------------------------------------------- random-hyperplane LSH ----

LSH_BITS = 16  # signature width; production widens this with corpus size
LSH_BANDS = 4  # 4 bands of 4 bits


def hyperplane_sign(bit: int, i: int) -> float:
    """Deterministic ±1 hyperplane component for signature bit ``bit``,
    vector dimension ``i`` (1-based) — Knuth multiplicative hash of the
    (bit, dim) index, folded to one bit. Pure integer arithmetic: the
    same literal constants are baked into the Spark plan and the DuckDB
    oracle, so the hyperplanes are shared by construction (no RNG, no
    seed-state to ship cross-engine)."""
    x = ((bit * DIM + i + 1) * 2654435761) % (2**32)
    x ^= x >> 16
    return 1.0 if x & 1 else -1.0


def lsh_bit_sum_sql(bit: int, arr: str, dim: int = DIM, dialect: str = "spark") -> str:
    """Left-associative signed sum Σ ±arr[i] for one signature bit —
    the same IEEE-754 sequence in both dialects, so the sign test
    (``> 0``) and hence every signature bit is bit-identical
    cross-engine (same determinism argument as the unrolled cosine)."""
    return " + ".join(
        f"({hyperplane_sign(bit, i)} * CAST({_ix(arr, i, dialect)} AS DOUBLE))"
        for i in range(1, dim + 1)
    )
