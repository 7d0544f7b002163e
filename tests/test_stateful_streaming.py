"""Stateful streaming operators (applyInPandasWithState): sessionization
must agree with its batch (lag+cumsum) twin on closed sessions; streaming
dedup-on-arrival must agree with the batch exact-dedup canonical set AND
suppress duplicates planted across micro-batch boundaries."""

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


class TestDedupStream:
    def test_first_arrival_dedup_across_batches(self, spark, tmp_path):
        """Two micro-batches (one file each); batch 2 re-sends 50 of
        batch 1's texts under new doc_ids.  The state must suppress every
        cross-batch duplicate, and the surviving set must equal the batch
        exact-dedup twin."""
        import pandas as pd

        from textextraction_spark.streaming.dedup_stream import (
            batch_dedup_twin,
            run_dedup_stream,
        )

        docs = pd.read_parquet("/root/testdata/sf0.001/documents.parquet")[
            ["doc_id", "text"]
        ].sort_values("doc_id")
        half = len(docs) // 2
        file1 = docs.iloc[:half]
        dups = docs.iloc[:50].copy()
        dups["doc_id"] = dups["doc_id"] + 100000  # planted cross-batch dups
        file2 = pd.concat([docs.iloc[half:], dups])

        docs_dir = tmp_path / "docs"
        docs_dir.mkdir()
        import time as _time

        # file-source batch order follows modification time: write 1 first
        file1.to_parquet(docs_dir / "part-1.parquet")
        _time.sleep(1.1)
        file2.to_parquet(docs_dir / "part-2.parquet")

        old = spark.conf.get("spark.sql.shuffle.partitions")
        spark.conf.set("spark.sql.shuffle.partitions", "2")
        try:
            q = run_dedup_stream(
                spark, str(docs_dir), str(tmp_path / "ckpt"), sink="deduped"
            )
            # availableNow terminates after draining both files; a False
            # return (timeout) would mean partial state — fail loudly
            assert q.awaitTermination(180)
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", old)

        streamed = spark.sql(
            "select fp, doc_id, n_chars from deduped"
        ).toPandas()
        twin = (
            batch_dedup_twin(spark, str(docs_dir))
            .select("fp", "doc_id", "n_chars")
            .toPandas()
        )

        # exactly one emission per unique fingerprint
        assert streamed["fp"].is_unique
        # none of the planted duplicate ids survived (their texts arrived
        # in batch 1 — only cross-batch STATE can know that)
        assert not (streamed["doc_id"] >= 100000).any()
        # canonical set identical to the batch twin
        got = {tuple(r) for r in streamed.itertuples(index=False, name=None)}
        want = {tuple(r) for r in twin.itertuples(index=False, name=None)}
        assert got == want
        # and the fixture really exercised dedup (planted + natural dups)
        assert len(streamed) < half * 2 + 50
