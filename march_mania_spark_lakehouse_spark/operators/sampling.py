"""Training-data sampling & packing operators (pipeline north star).

Three shapes a large-scale training pipeline needs on top of dedup and
similarity:

- **Deterministic hash split** (train/val/test): membership is a pure
  function of the document id, so the split is stable across runs,
  engines, and re-partitioning — no sampling state, no RNG. The bucket
  function is engine-neutral integer arithmetic (multiplicative hashing
  with explicit modulus), NOT ``F.hash`` — Spark's Murmur3 and an
  external SQL engine's ``hash()`` disagree, and a split must be
  reproducible anywhere the data goes.
- **Quota sampling** (top-N per group by a quality order): a window
  ``row_number`` — one shuffle on the group key; deterministic tiebreak
  so the selected sample is stable.
- **Sequence packing** (concat-then-chunk token binning): documents are
  ordered within a shard, token counts prefix-summed, and each document
  assigned to the context-window bin where it *starts*. Sharding bounds
  the window partition (a single global ORDER BY would serialize at
  100 TB); each shard's window sorts locally after one shuffle.

All pure built-ins — no UDFs, map-side combinable, codegen-friendly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Engine-neutral multiplicative hash constants (Knuth 2654435761 is the
#: golden-ratio multiplier for 2^32). All intermediates stay < 2^63 for
#: any id < ~3.4e9, so the arithmetic is exact (and ANSI-overflow-safe)
#: in every engine.
HASH_MULT = 2654435761
HASH_ADD = 40503
HASH_MOD = 2**32


def hash_bucket(id_col: Column | str, buckets: int = 100) -> Column:
    """Deterministic bucket in [0, buckets) from an integer id — the
    same value in any engine that has 64-bit ``*``/``+``/``%``."""
    c = F.col(id_col) if isinstance(id_col, str) else id_col
    return ((c * F.lit(HASH_MULT) + F.lit(HASH_ADD)) % F.lit(HASH_MOD)) % F.lit(
        buckets
    )


def sql_hash_bucket(id_expr: str, buckets: int = 100) -> str:
    """ANSI-SQL rendering of :func:`hash_bucket` (oracle side)."""
    return f"((({id_expr}) * {HASH_MULT} + {HASH_ADD}) % {HASH_MOD}) % {buckets}"


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: tuple[tuple[str, int], ...] = (("train", 98), ("val", 1), ("test", 1)),
    split_col: str = "split",
) -> DataFrame:
    """Attach a deterministic split label; weights are percents of the
    100-bucket space ((name, weight) with weights summing to ≤ 100)."""
    bucket = hash_bucket(id_col)
    expr: Column | None = None
    acc = 0
    branches = []
    for name, weight in splits:
        acc += weight
        branches.append((acc, name))
    expr = F.when(bucket < branches[0][0], F.lit(branches[0][1]))
    for threshold, name in branches[1:]:
        expr = expr.when(bucket < threshold, F.lit(name))
    return df.withColumn(split_col, expr)


def quota_sample(
    df: DataFrame,
    group_cols: list[str],
    order_by: list[Column],
    n_per_group: int,
) -> DataFrame:
    """Top-``n_per_group`` rows per group under a deterministic order —
    the per-domain/per-language quota pass of a data mixture."""
    w = Window.partitionBy(*group_cols).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= n_per_group)
        .drop("__rn")
    )


def pack_bins(
    df: DataFrame,
    id_col: str,
    token_col: str,
    budget: int = 2048,
    shard_size: int = 1000,
) -> DataFrame:
    """Assign each document to the context-window bin where it starts.

    Semantics: within a shard (``id // shard_size``), documents are laid
    out in id order and chunked every ``budget`` tokens; a document
    belongs to the bin containing its first token (bins may overflow by
    up to one document — concat-then-chunk, not first-fit). The prefix
    sum is an *exclusive* running total so the first document of a shard
    always lands in bin 0.

    Output columns: shard, bin, plus the input row. Aggregate downstream
    for bin stats. Window partitions are bounded by ``shard_size`` docs,
    so no single reducer ever sees more than one shard.
    """
    shard = F.expr(f"{id_col} div {shard_size}")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    excl = F.coalesce(F.sum(token_col).over(w), F.lit(0).cast("long"))
    return (
        df.withColumn("shard", shard)
        .withColumn("bin", F.floor(excl / F.lit(float(budget))))
    )
