"""Skew-handling primitives for hot keys at 100 TB.

AQE's skew-join splitting handles most cases automatically
(``spark.sql.adaptive.skewJoin.enabled``, on in our session builder), but
two manual patterns remain load-bearing and are implemented here:

- :func:`salted_aggregate` — two-phase aggregation for groupBy where one
  key holds a large share of all rows: phase 1 aggregates on
  (key, salt = hash(row) % N) spreading the hot key over N reducers;
  phase 2 merges the N partials. The result is EXACTLY the plain groupBy
  result (associative aggregates only), so the DuckDB oracle is the plain
  GROUP BY — the differential test proves the rewrite is semantics-
  preserving.
- :func:`salted_broadcast_left` — replicate-broadcast pattern notes for
  joining a skewed fact key against a dim too big to broadcast whole:
  salt the fact side, explode the dim side over the salt domain. Provided
  as a composition helper.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-phase salted groupBy for skewed keys.

    ``aggs`` maps output column name → "sum:col" | "count:*" | "min:col" |
    "max:col" (associative aggregates, so partial-then-merge is exact).
    """
    salt = F.pmod(F.xxhash64(*[F.col(c) for c in df.columns]), F.lit(salt_buckets))
    salted = df.withColumn("_salt", salt)

    phase1_exprs = []
    phase2_exprs = []
    for out, spec in aggs.items():
        op, _, col = spec.partition(":")
        if op == "count":
            phase1_exprs.append(F.count(F.lit(1)).alias(f"_p_{out}"))
            phase2_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif op == "sum":
            phase1_exprs.append(F.sum(col).alias(f"_p_{out}"))
            phase2_exprs.append(F.sum(f"_p_{out}").alias(out))
        elif op == "min":
            phase1_exprs.append(F.min(col).alias(f"_p_{out}"))
            phase2_exprs.append(F.min(f"_p_{out}").alias(out))
        elif op == "max":
            phase1_exprs.append(F.max(col).alias(f"_p_{out}"))
            phase2_exprs.append(F.max(f"_p_{out}").alias(out))
        else:
            raise ValueError(f"non-associative agg spec: {spec}")

    partial = salted.groupBy(*keys, "_salt").agg(*phase1_exprs)
    return partial.groupBy(*keys).agg(*phase2_exprs)


def salted_broadcast_left(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    salt_buckets: int = 8,
) -> DataFrame:
    """Join a skew-keyed fact to a dim by salting fact and exploding dim.

    fact gains salt = hash % N; dim is exploded N× with every salt value;
    the join key becomes (key, salt) so one hot key spreads over N tasks.
    Exact same rows as the plain inner join.
    """
    f = fact.withColumn("_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(salt_buckets)))
    d = dim.withColumn("_salt", F.explode(F.array(*[F.lit(i) for i in range(salt_buckets)])))
    return f.join(d, [key, "_salt"]).drop("_salt")
