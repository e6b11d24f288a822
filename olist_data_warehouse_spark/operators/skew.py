"""Skew mitigation: salted join.

A hash join shuffles both sides on the join key — one hot key lands
its entire row set on one reducer, and at 100 TB that task runs for
hours while the rest of the cluster idles. AQE's skew-join splitting
catches post-shuffle partition skew, but only for sort-merge joins it
can see at runtime; `salted_join` is the explicit, always-available
form: append a salt in [0, n) to the big side's key (any per-row value
works — which salt a row gets only affects placement, never the join
result) and replicate the small side once per salt value, so the hot
key's rows spread over n reducers.

Cost model: small side is duplicated n× (choose n ≈ the hot key's
excess over a healthy partition); big side is unchanged. Join result
is row-identical to the unsalted join — verified by the oracle, which
runs the plain join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Join ``big`` ⋈ ``small`` on ``on`` with the shuffle key salted
    n ways. Supports inner/left joins (the shapes where small-side
    replication is lossless)."""
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left joins")
    # monotonically_increasing_id spreads even a single hot key value
    # across all n salts; which salt a row gets only chooses its
    # reducer, never the join result.
    bs = big.withColumn(
        "_salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salts))
    )
    ss = small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i).cast("long") for i in range(n_salts)]))
    )
    return bs.join(ss, [*on, "_salt"], how).drop("_salt")
