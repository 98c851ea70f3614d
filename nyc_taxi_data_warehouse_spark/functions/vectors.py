"""Vector expressions over `array<float>` embedding columns.

Built-in higher-order functions only (`zip_with`/`aggregate`): the arithmetic
runs in the JVM per row, no Python boundary. Elements are cast to double
before arithmetic so results are bit-compatible with a double-precision
oracle (float math would round differently).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _col(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def as_double(vec: Column | str) -> Column:
    return F.transform(_col(vec), lambda x: x.cast("double"))


def quantize(vec: Column | str, quant: int = 1000) -> Column:
    """floor(x·quant) per element, as array<long>.

    The bit-reproducibility primitive (NOTES "SRP oracle lesson"): float
    sums are not order-stable across engines, but integer sums are exact in
    any order, so any operator that quantizes first can be verified by a
    SQL oracle bit-for-bit."""
    return F.transform(as_double(vec), lambda x: F.floor(x * quant).cast("long"))


def dot(a: Column | str, b: Column | str) -> Column:
    """Sequential left-fold dot product (deterministic summation order)."""
    prods = F.zip_with(as_double(a), as_double(b), lambda x, y: x * y)
    return F.aggregate(prods, F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column | str) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column | str, b: Column | str) -> Column:
    return (dot(a, b) / (norm(a) * norm(b))).cast("double")
