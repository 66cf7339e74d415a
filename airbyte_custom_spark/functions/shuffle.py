"""Deterministic corpus shuffle + sharding for training exports.

Trainers consume a corpus as N shard files read sequentially, and the
read order IS the training order — so the export step must (a) spread
examples across shards independent of their source layout (a shard must
not be "all of one crawl"), and (b) order examples within each shard
pseudo-randomly, reproducibly.  ``DataFrame.repartition`` + a random
sort gives neither: the assignment depends on the input partitioning
and the RNG seed schedule, so a re-export after an incremental refresh
would reshuffle everything.

Both decisions here are pure functions of the example id:

- ``shard``        = ``h31(id) % n_shards`` — the engine-portable
  polynomial hash (``functions/text.py::h31``), so the assignment is
  oracle-checkable bit-for-bit in DuckDB (xxhash64 exists only in
  Spark);
- ``shuffle_key``  = ``md5(id)`` — lowercase hex in Spark, DuckDB, and
  ANSI alike; sorting by it within a shard is a deterministic
  pseudo-random permutation (the same top-bits-uniform argument as the
  md5-threshold sampler in ``functions/sampling.py``).

Determinism across reruns, partitionings, AND engines means an
incremental refresh drops its new examples into exactly the shards and
positions a full re-export would have chosen — downstream shard readers
see a stable world.

Scale shape: the assignment columns are zero-exchange codegen'd row
expressions; the write path adds exactly ONE hash exchange on ``shard``
plus an in-task (spillable) sort — never a global sort.  Parallelism of
the sharded write is bounded by ``n_shards``, so size it at or above
the cluster's core count (training exports use 1k–16k shards at 100 TB,
which also keeps each shard file O(10 GB)).

Reference analog: the reference hands training consumers its final
tables in table order and leaves shard/shuffle to downstream trainers;
this is that missing step expressed as a deterministic Spark transform
(reference scope anchor: base-typing-deduping's final-table contract,
`DefaultTyperDeduper.java` — final state in, training artifacts out).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from airbyte_custom_spark.functions.text import h31

__all__ = ["example_id", "shuffle_key", "shard_assign", "shuffled_shards"]


def example_id(id_cols: list[str]) -> Column:
    """The example's stable identity as ONE string: the id columns cast
    to string and joined with ``:`` (e.g. ``conv_id`` alone for whole
    conversations, ``conv_id:window_id`` for packed context windows).
    Callers must pick columns that uniquely key an example — the shard
    and order of an example follow its id, so two examples sharing an id
    would collide into the same slot."""
    return F.concat_ws(":", *[F.col(c).cast("string") for c in id_cols])


def shuffle_key(id_cols: list[str]) -> Column:
    """Deterministic pseudo-random sort key: ``md5`` hex of the example
    id.  Lexicographic order on it is the shuffle order."""
    return F.md5(example_id(id_cols))


def shard_assign(id_cols: list[str], n_shards: int) -> Column:
    """Shard id in ``[0, n_shards)`` from the portable ``h31`` hash of
    the example id.  h31 is independent of md5 (different construction
    entirely), so shard membership and within-shard order don't
    correlate."""
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    return (h31(example_id(id_cols)) % F.lit(n_shards)).cast("long")


def shuffled_shards(
    df: DataFrame, id_cols: list[str], n_shards: int
) -> DataFrame:
    """Add ``shard`` and ``shuffle_key`` columns (all input columns pass
    through).  The caller writes with::

        out.repartition("shard")
           .sortWithinPartitions("shard", "shuffle_key")
           .write.partitionBy("shard").parquet(path)

    — one exchange, in-task sort, and every ``shard=K`` directory's file
    order is the shuffle order (rows within each written file keep task
    order, which the sort made (shard, key)-ascending)."""
    return df.withColumn("shard", shard_assign(id_cols, n_shards)).withColumn(
        "shuffle_key", shuffle_key(id_cols)
    )
