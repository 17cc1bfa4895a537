"""Skew-mitigation join: explicit key salting.

AQE's skew-join splitting (on in session.py) handles moderate skew by
splitting oversized shuffle partitions. Salting is the manual
escalation for pathological keys (one key ≫ one executor's memory even
after AQE splits): spread the big side's hot keys across ``n_salts``
sub-keys and replicate the small side once per salt, turning one
hot partition into ``n_salts`` even ones at the cost of
``|small| × n_salts`` replicated rows through the shuffle.

Deterministic by construction: the salt is a hash of the big side's
whole row (not rand()), so retries/replays land rows on the same salt —
required for restartable stages and reproducible tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SALT_COL = "__salt"


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    n_salts: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Equi-join ``big ⋈ small`` on ``on`` with salted shuffle keys.

    ``big`` rows get a deterministic salt in [0, n_salts); ``small`` is
    replicated once per salt value so every (key, salt) pair finds its
    match. The physical join key becomes (on..., salt) — hot keys now
    hash to n_salts different shuffle partitions.

    Supported ``how``: inner / left joins (semantics preserved — each
    big row joins exactly the same small rows as unsalted). Right/full
    would duplicate unmatched small rows across salts; rejected.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt = F.pmod(
        F.xxhash64(*[F.col(c) for c in big.columns]), F.lit(n_salts)
    ).cast("int")
    big_s = big.withColumn(SALT_COL, salt)
    small_s = small.withColumn(
        SALT_COL,
        F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)).cast("array<int>")),
    )
    return big_s.join(small_s, on + [SALT_COL], how).drop(SALT_COL)
