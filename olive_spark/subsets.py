"""Vertex-subset algebra — the reference's bitmap/VertexSubset surface.

The reference keeps frontiers as bitmaps/queues with atomic set ops
(bitmap.h:44-199: AND/OR/XOR/set/unset/get; vertexSubset.h:38-95 dense
queue vs sparse workset). Here a vertex subset IS a one-column
DataFrame of ids, and the set algebra is Spark's relational algebra —
distributed, no atomics needed. The dense/sparse duality collapses:
Catalyst/AQE switches between broadcast (small subset) and shuffle
plans by size, which is exactly the dense-queue/sparse-bitmap kernel
dispatch (oliver.h:150-168).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def make_subset(spark: SparkSession, ids) -> DataFrame:
    """Subset from an iterable of ids (VertexSubset(size, vid) /
    universal constructors, vertexSubset.h:59-95)."""
    return spark.createDataFrame([(int(i),) for i in ids], "id long")


def subset_and(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bitmap AND (bitmap.h:144-155)."""
    return a.select("id").intersect(b.select("id"))


def subset_or(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bitmap OR (bitmap.h:157-168)."""
    return a.select("id").union(b.select("id")).distinct()


def subset_xor(a: DataFrame, b: DataFrame) -> DataFrame:
    """Bitmap XOR (bitmap.h:170-181)."""
    aa, bb = a.select("id"), b.select("id")
    return aa.union(bb).subtract(aa.intersect(bb))  # EXCEPT DISTINCT


def subset_minus(a: DataFrame, b: DataFrame) -> DataFrame:
    """a AND NOT b (bitmap unset over a set, bitmap.h:85-97)."""
    return a.select("id").subtract(b.select("id"))


def subset_contains(a: DataFrame, vid: int) -> bool:
    """Membership probe (Bitmap::get, bitmap.h:99-110)."""
    return a.filter(F.col("id") == vid).limit(1).count() > 0


def subset_size(a: DataFrame) -> int:
    """Queue size / popcount (vertexSubset.h:99-107)."""
    return a.select("id").distinct().count()
