"""Skew-resistant join strategies — the utilities a 100 TB shuffle needs
when AQE's skew splitting isn't enough (a single hot key that dwarfs every
split, or a build side that must stay un-broadcast).

Two complementary shapes:

- ``salted_join``: replicate the (smaller) right side SALTS× and scatter
  the left side across the replicas, so one hot key's rows land on SALTS
  reducers instead of one. Deterministic (hash-derived salt, no rand()),
  result-identical to the plain join.
- ``hot_cold_join``: split the left side on measured key frequency — the
  few hot keys take a broadcast join (no shuffle of their rows at all),
  the long tail takes the normal shuffle join; union the halves. This is
  the classic differentiated/skew-isolated join; unlike salting it also
  helps when the RIGHT side's hot-key rows are big.

Scale notes (SCALE.md): salting multiplies the right side's shuffle volume
by SALTS — use for moderate skew with a small-ish right side. hot_cold
collects only the hot KEYS (bounded by ``max_hot_keys``, default 1000) to
the driver, never rows; the broadcast side is filtered to those keys first,
so its size is hot_keys × right-rows-per-key.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_SALT = "__salt"


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    *,
    salts: int = 8,
    salt_expr: Column | None = None,
) -> DataFrame:
    """Equi-join with the left side's hot keys scattered over ``salts``
    partitions; result-identical to ``left.join(right, on, how)``.

    The left rows get a deterministic salt in [0, salts) (xxhash64 of the
    whole row by default — pass ``salt_expr`` to salt on a cheaper column);
    the right side is exploded ``salts``× so every (key, salt) pair finds
    its match. Supported ``how``: inner / left joins (the semantics where
    per-left-row fan-out is unchanged by salting).
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"salted_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)
    if salt_expr is None:
        salt_expr = F.xxhash64(*[F.col(c) for c in left.columns])
    salted_left = left.withColumn(_SALT, F.pmod(salt_expr, F.lit(salts)).cast("int"))
    salted_right = right.withColumn(
        _SALT, F.explode(F.sequence(F.lit(0), F.lit(salts - 1)))
    ).withColumn(_SALT, F.col(_SALT).cast("int"))
    return salted_left.join(salted_right, keys + [_SALT], how).drop(_SALT)


def hot_cold_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str] | str,
    how: str = "inner",
    *,
    hot_threshold: int = 100_000,
    max_hot_keys: int = 1000,
) -> DataFrame:
    """Differentiated skew join: keys whose left-side frequency exceeds
    ``hot_threshold`` are joined via broadcast (their rows never shuffle);
    the long tail takes the ordinary shuffle join. Result-identical to
    ``left.join(right, on, how)`` for inner/left joins.

    The driver collects at most ``max_hot_keys`` hot KEY TUPLES (raises
    past that — a sign the threshold is mis-sized), then ships them back
    as a literal filter, so both halves prune at the scan.
    """
    if how not in ("inner", "left", "leftouter", "left_outer"):
        raise ValueError(f"hot_cold_join supports inner/left joins, got {how!r}")
    keys = [on] if isinstance(on, str) else list(on)

    hot_rows = (
        left.groupBy(*keys)
        .count()
        .filter(F.col("count") > hot_threshold)
        .select(*keys)
        .limit(max_hot_keys + 1)
        .collect()
    )
    if len(hot_rows) > max_hot_keys:
        raise ValueError(
            f"more than {max_hot_keys} hot keys at threshold {hot_threshold};"
            " raise hot_threshold or max_hot_keys"
        )
    if not hot_rows:
        return left.join(right, keys, how)

    hot_keys = [tuple(r[k] for k in keys) for r in hot_rows]
    key_types = {f.name: f.dataType for f in left.schema.fields}
    key_struct = F.struct(*[F.col(k) for k in keys])
    hot_lits = [
        F.struct(
            *[F.lit(v).cast(key_types[k]) for k, v in zip(keys, t)]
        )
        for t in hot_keys
    ]
    is_hot = key_struct.isin(*hot_lits)

    hot_part = left.filter(is_hot).join(
        F.broadcast(right.filter(is_hot)), keys, how
    )
    cold_part = left.filter(~is_hot).join(right, keys, how)
    return hot_part.unionByName(cold_part)
