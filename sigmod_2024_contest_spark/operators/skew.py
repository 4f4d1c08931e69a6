"""Skew-aware join: explicit key salting for hot-key shuffles.

At 100 TB a handful of hot keys (a viral user, an empty-string tenant,
a default category) can put one shuffle partition hours behind the
rest. Spark's AQE skew handling (`spark.sql.adaptive.skewJoin`) splits
oversized SORT-MERGE partitions at runtime and is the first tool to
reach for — but it only rebalances what a partition-split can: one
join key still hashes to one partition, so a SINGLE key hotter than a
task must be salted at the logical level. This module is that manual
path, kept result-identical to the plain join:

- big side: `salt = pmod(hash(disambig_col), n_salts)` — a
  deterministic spread of each hot key's rows across `n_salts`
  sub-keys (derived from a per-row column, never `rand()`, so retries
  and speculative tasks stay consistent);
- small side: replicated `n_salts`× via an explode of a literal salt
  array (rows × n_salts — bounded because the small side is the
  dimension), so every (key, salt) bucket finds its match;
- join on (key, salt): the hot key's work now lands on `n_salts`
  tasks instead of one.

Salting is a partitioning rewrite ONLY — the joined row multiset is
identical to the unsalted join, which is exactly what the registered
oracle (a plain SQL join) verifies every round.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_SALTS = 8


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    disambig_col: str,
    n_salts: int = N_SALTS,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``key`` with the big side salted
    across ``n_salts`` sub-keys. ``disambig_col`` is any big-side
    column that varies within a key (a row id / event id); its hash
    spreads the hot key deterministically."""
    salted_big = big.withColumn(
        "_salt", F.pmod(F.hash(F.col(disambig_col)), F.lit(n_salts))
    )
    salted_small = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(n_salts)]))
    )
    return salted_big.join(salted_small, [key, "_salt"], how).drop("_salt")


def salted_user_join(events: DataFrame, n_salts: int = N_SALTS) -> DataFrame:
    """(event_type, n_events, sum_user_total_c): every event joined
    with its user's lifetime value-total (a self-derived dimension),
    then rolled up per event type — the registry face of
    :func:`salted_join`.

    user_id is the archetypal skew axis of an event log (one hot user
    ≫ task size breaks the plain shuffle join); here the per-user
    totals table is the small side, replicated ``n_salts``×, and
    events salt on event_id. The oracle is the UNSALTED join+rollup —
    green means salting changed the partitioning and nothing else."""
    totals = events.groupBy("user_id").agg(
        F.sum(F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")).alias(
            "user_total_c"
        )
    )
    joined = salted_join(events, totals, "user_id", "event_id", n_salts)
    return joined.groupBy("event_type").agg(
        F.count("*").cast("long").alias("n_events"),
        F.sum("user_total_c").cast("long").alias("sum_user_total_c"),
    )


SALTED_USER_JOIN_SQL = """
WITH totals AS (
  SELECT user_id,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT))::BIGINT AS user_total_c
  FROM events GROUP BY user_id
)
SELECT event_type, count(*)::BIGINT AS n_events,
       sum(user_total_c)::BIGINT AS sum_user_total_c
FROM events JOIN totals USING (user_id)
GROUP BY event_type
"""
