"""Stateful streaming sessionization: the applyInPandasWithState operator
must agree with its batch (lag+cumsum) twin on closed sessions."""

from __future__ import annotations

import shutil

from textextraction_spark.streaming.stateful import (
    batch_sessionization,
    run_sessionization,
)

SRC = "/root/testdata/sf0.001/events.parquet"
GAP = 600  # 10 min


class TestSessionization:
    def test_stream_matches_batch(self, spark, tmp_path):
        events_dir = str(tmp_path / "events")
        spark.read.parquet(SRC).write.parquet(events_dir)

        # one state-store instance per shuffle partition — keep it small
        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        try:
            # NOTE: neither availableNow termination nor processAllAvailable
            # converges for timeout-state queries (timeouts keep scheduling
            # batches) — bound the wait and stop; the data batch has already
            # emitted every gap-closed session, which is what we assert on.
            q = run_sessionization(spark, events_dir, gap_seconds=GAP)
            q.awaitTermination(45)
            q.stop()
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)
        streamed = spark.sql(
            "select host, n_events, first_ts, last_ts from sessions"
        ).toPandas()

        batch = (
            batch_sessionization(spark, events_dir, gap_seconds=GAP)
            .select("host", "n_events", "first_ts", "last_ts")
            .toPandas()
        )

        # The stream emits only CLOSED sessions (last per host still open);
        # every emitted session must exist in the batch result verbatim.
        assert len(streamed) > 0
        bset = {tuple(r) for r in batch.itertuples(index=False, name=None)}
        missing = [
            t for t in streamed.itertuples(index=False, name=None) if tuple(t) not in bset
        ]
        assert not missing, missing[:3]

        # and most sessions should have closed (gap << data span)
        assert len(streamed) >= 0.8 * len(batch) - 10
