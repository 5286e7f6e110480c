"""Z-order (Morton) interleaving for multi-dimensional data layout.

Sorting/partitioning by a Morton code co-locates rows that are close
in BOTH dimensions, so range predicates on either column map to few
contiguous file ranges — the layout trick behind Delta/Iceberg
Z-ordering, expressed as a plain column expression. Writing
`df.repartitionByRange(N, zorder2(x, y)).sortWithinPartitions(...)`
yields files whose min/max stats prune on x AND y at once.

Pure bit arithmetic in JVM expressions (16 bits per dimension →
32-bit code); no UDF, no shuffle beyond the layout write itself.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BITS = 16


def zorder2(x: Column, y: Column) -> Column:
    """Interleave the low 16 bits of two non-negative ints:
    bit j of x → bit 2j, bit j of y → bit 2j+1."""
    xs = x.cast("long").bitwiseAND((1 << BITS) - 1)
    ys = y.cast("long").bitwiseAND((1 << BITS) - 1)
    z = F.lit(0).cast("long")
    for j in range(BITS):
        z = (
            z
            + F.shiftleft(F.shiftright(xs, j).bitwiseAND(F.lit(1)), 2 * j)
            + F.shiftleft(F.shiftright(ys, j).bitwiseAND(F.lit(1)), 2 * j + 1)
        )
    return z


def identity_partition_keys(spark, n: int) -> list[int]:
    """Constants ``k_0..k_{n-1}`` with ``pmod(murmur3(k_i), n) == i``,
    so ``df.repartition(n, key_col)`` with ``key_col = k[bucket]``
    becomes a DIRECT partitioner: every row lands in the partition
    EQUAL to its bucket id, deterministically. ``repartitionByRange``
    decides boundaries from a row SAMPLE, so file edges wobble
    run-to-run — a 16-file Morton layout intermittently straddled
    tile boundaries and broke its own pruning bound (round-11 flake:
    9/16 files kept vs the ≤8 a tile-aligned layout guarantees).
    Hash placement has no sample. The k_i come from asking Spark's
    own Murmur3 (one ``spark.range`` probe job, driver gets n ints)
    rather than reimplementing the hash — no drift risk; callers run
    this inside a build-once store build, so the probe is paid once
    per corpus version."""
    rows = (
        spark.range(0, 64 * n)
        .select(F.pmod(F.hash(F.col("id")), F.lit(n)).alias("p"), F.col("id"))
        .groupBy("p")
        .agg(F.min("id").alias("k"))
        .collect()
    )
    m = {r["p"]: r["k"] for r in rows}
    assert len(m) == n, f"murmur3 residue probe missed buckets: {sorted(m)}"
    return [m[i] for i in range(n)]


def scale_to_grid(c: Column, lo: float, hi: float, buckets: int = 256) -> Column:
    """Map [lo, hi] onto [0, buckets-1] so both dimensions occupy the
    FULL interleave grid. Raw keys usually fill only the low bits of
    their 16-bit field, which leaves Morton cells thin slivers whose
    min/max rectangles are wide; normalizing first (the Delta/Iceberg
    Z-order trick — theirs is rank-based, this is min/max affine, right
    for near-uniform keys) makes a contiguous Z range a compact square."""
    span = max(float(hi) - float(lo), 1.0)
    scaled = ((c.cast("double") - float(lo)) * (buckets - 1) / span)
    return F.least(F.greatest(F.round(scaled).cast("long"), F.lit(0)), F.lit(buckets - 1))
