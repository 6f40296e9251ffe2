"""SLIMIT / SOFFSET — limit the number of *groups* (partitions), not rows.

Reference: ``PARTITION BY ... SLIMIT n [SOFFSET m]`` (parser/inc/sql.y
partition-limit clause; the executor applies the limit to the group
stream, keeping whole groups).

Scale design: the naive translation — ``dense_rank() OVER (ORDER BY
keys)`` with no partitioning — funnels EVERY row through a single
partition for the global window (correct at sf0.01, a straggler at
100 TB). Instead:

  1. ``distinct(keys)`` — tiny: |groups| rows, shuffled by key;
  2. global sort + limit over that tiny set (TakeOrdered, no full sort);
  3. broadcast semi-join back onto the fact table.

The fact table is scanned once, never globally sorted, and the only
wide operation over it is the broadcast semi-join — the same plan a
human would write by hand at scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def slimit(
    df: DataFrame,
    keys: list[str],
    n: int,
    offset: int = 0,
    ascending: bool = True,
) -> DataFrame:
    """Keep only the first ``n`` groups (by sorted ``keys``), whole.

    ``offset`` skips the first ``offset`` groups (SOFFSET). Ordering is
    the group-key sort order, matching the reference's deterministic
    partition ordering.
    """
    if not keys:
        raise ValueError("slimit requires at least one group key")
    order = [F.col(k).asc() if ascending else F.col(k).desc() for k in keys]
    picked = df.select(*keys).distinct().orderBy(*order).limit(n + offset)
    if offset:
        # the offset window is tiny (n+offset group keys on the driver
        # side of a limit) — a second limit+subtract stays distributed
        skip = picked.limit(offset)
        picked = picked.join(skip, keys, "left_anti")
    return df.join(F.broadcast(picked), keys, "left_semi")
