"""State-partition sizing for streaming queries.

Structured Streaming pins the number of STATE partitions (and thus
state-store instances) to ``spark.sql.shuffle.partitions`` at the first
micro-batch and persists it in the checkpoint.  Inheriting the BATCH
shuffle width is wrong on both ends of the scale:

* small state / wide session (this engine's bench: 96 batch shuffle
  partitions on 32 cores): every micro-batch pays per-store overhead —
  task scheduling, delta-file commit, maintenance — for hundreds of
  near-empty stores.  A stream-stream join keeps FOUR stores per
  partition; measured on the interval join at sf0.1 (100k events,
  370 output rows): 96 partitions -> 47 s end-to-end, 8 partitions ->
  6-10 s, with the empty watermark-finalization batch alone dropping
  from 24 s to ~1.5 s;
* huge state / narrow default: a 10^12-event deployment with 10^9 live
  keys needs state sharded across hundreds-to-thousands of partitions
  so each store's working set fits memory and maintenance parallelizes.

So the knob must track STATE VOLUME (live keys x per-key state), not
compute width.  ``state_partitions`` scopes the override to one query
start: the streaming engine clones the session (and its conf) inside
``.start()``, so restoring the session value immediately afterwards is
race-free — verified empirically (query runs at the override, session
conf unchanged for concurrent batch work).

``STATE_PARTITIONS = 8`` fits every corpus this engine benches (at most
~10^4 live keys); a production deployment passes its own value.
"""

from __future__ import annotations

from contextlib import contextmanager

from pyspark.sql import SparkSession

STATE_PARTITIONS = 8

_CONF = "spark.sql.shuffle.partitions"


@contextmanager
def state_partitions(spark: SparkSession, n: int = STATE_PARTITIONS):
    """Scope ``spark.sql.shuffle.partitions`` to a streaming query
    start; the query keeps the override (session cloned at start), the
    session gets its batch width back on exit."""
    old = spark.conf.get(_CONF)
    spark.conf.set(_CONF, str(n))
    try:
        yield
    finally:
        spark.conf.set(_CONF, old)
