"""Vector (embedding) column expressions.

Built on higher-order functions (``zip_with`` / ``aggregate``) so the
arithmetic runs inside whole-stage codegen on the JVM — no UDF, no
Arrow hop. SURVEY §4 calls this out as the one place a custom Catalyst
expression was considered; higher-order functions make it unnecessary.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(col) -> Column:
    return F.col(col) if isinstance(col, str) else col


def dot(a, b) -> Column:
    prod = F.zip_with(_c(a), _c(b), lambda x, y: x.cast("double") * y.cast("double"))
    return F.aggregate(prod, F.lit(0.0), lambda acc, x: acc + x)


def norm(a) -> Column:
    sq = F.aggregate(_c(a), F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    return F.sqrt(sq)


def cosine(a, b) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def l2_distance(a, b) -> Column:
    diff = F.zip_with(_c(a), _c(b), lambda x, y: (x.cast("double") - y.cast("double")) * (x.cast("double") - y.cast("double")))
    return F.sqrt(F.aggregate(diff, F.lit(0.0), lambda acc, x: acc + x))


def unit(a) -> Column:
    """The vector scaled to unit L2 norm (doubles). Pre-normalizing
    each row ONCE turns every downstream pairwise cosine into a single
    dot fold — 1 aggregate per pair instead of 3 (dot + both norms),
    which is the difference between 5 s and 15 s on a half-million-pair
    brute-force verification join."""
    n = norm(a)
    return F.transform(_c(a), lambda x: x.cast("double") / n)


def sign_projection_bits(a, planes: list[list[float]]) -> Column:
    """Random-hyperplane LSH signature: for each plane, bit = dot>=0.
    Returns a compact string like '0110…' usable as a bucket key.
    ``planes`` are driver-side constants (seeded) folded into the plan
    as literals — broadcast-free, codegen'd."""
    bits = []
    for p in planes:
        plane = F.array(*[F.lit(float(v)) for v in p])
        bits.append(F.when(dot(a, plane) >= 0, F.lit("1")).otherwise(F.lit("0")))
    return F.concat(*bits)


def dot_literal(a, const_vec: list[float]) -> Column:
    """Dot product against a driver-side constant vector folded into the
    plan as literals (for centroid scoring — no broadcast join needed)."""
    return dot(a, F.array(*[F.lit(float(v)) for v in const_vec]))
