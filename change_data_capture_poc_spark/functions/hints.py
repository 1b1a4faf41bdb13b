"""Config-gated join hints.

``F.broadcast`` on a corpus-DERIVED table (a vocabulary count, a
brand-filtered key slice) is a bet that the table stays driver-sized.
The bet is sound for Heaps-law vocabularies at any realistic corpus
(types grow ~sqrt of tokens), but when it loses, Spark hard-fails —
the 8 GB broadcast ceiling or a driver OOM — instead of degrading to
a shuffle join, and un-losing it requires editing the query (round-11
ADVICE).

``vocab_broadcast`` keeps the hint as the default (the 8x probe
measured dropping it as a 10.8x-62.5x shuffle-byte blowup on the
occurrence stream) but lets a deployment whose derived tables outgrow
the driver turn it off with ONE config, no code edit:

    spark.conf.set("spark.graft.vocab.broadcast", "false")

With the flag off the join degrades to a shuffle of the pre-aggregated
vocabulary-keyed stream — slower, never fatal. The flag is read per
call, so it can be flipped mid-session (e.g. only for the one query
whose vocabulary is pathological).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

VOCAB_BROADCAST_CONF = "spark.graft.vocab.broadcast"


def vocab_broadcast_enabled(spark) -> bool:
    return (
        str(spark.conf.get(VOCAB_BROADCAST_CONF, "true")).lower() != "false"
    )


def vocab_broadcast(df: DataFrame) -> DataFrame:
    """``F.broadcast(df)`` unless ``spark.graft.vocab.broadcast`` is
    ``false`` — the escape hatch for corpus-derived tables that outgrow
    driver memory. Scalar/1-row frames don't need this; hint those
    unconditionally."""
    if vocab_broadcast_enabled(df.sparkSession):
        return F.broadcast(df)
    return df
