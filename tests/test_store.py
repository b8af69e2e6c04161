"""Write-path guarantees: monotonic height guard, idempotent replay,
checkpoint advance, shard checkpoints (reference write.go / read.go)."""

from __future__ import annotations

import pytest

from fluxdb_spark.store import ChangelogStore, WriteConsistencyError
from fluxdb_spark.operators import state_at
from tests.conftest import make_changelog


@pytest.fixture()
def store(spark, tmp_path):
    return ChangelogStore(spark, str(tmp_path / "db"))


def batch(spark, heights, tablet="tbl", pk="001"):
    return make_changelog(
        spark, [("tst", tablet, h, pk, f"v{h}") for h in heights]
    )


class TestWritePath:
    def test_write_then_read(self, spark, store):
        store.write_batch(batch(spark, [1, 2, 3]))
        ckpt = store.checkpoint()
        assert ckpt.height == 3 and ckpt.block_num == 3
        got = [
            (r.primary_key, r.height, r.value)
            for r in state_at(store.changelog(), "tbl", 3, collection="tst").collect()
        ]
        assert got == [("001", 3, "v3")]

    def test_monotonic_guard_rejects_hole(self, spark, store):
        # reference isNextBlock (write.go:331-347): last height must be
        # >= next write height - 1.
        store.write_batch(batch(spark, [1, 2]))
        with pytest.raises(WriteConsistencyError, match="hole"):
            store.write_batch(batch(spark, [5, 6]))

    def test_contiguous_batches_accepted(self, spark, store):
        store.write_batch(batch(spark, [1, 2]))
        store.write_batch(batch(spark, [3]))
        assert store.checkpoint().height == 3

    def test_idempotent_replay(self, spark, store):
        # reference shard injectors skip already-injected heights
        # (shardinject.go:153-155) — a replayed batch must not duplicate.
        store.write_batch(batch(spark, [1, 2, 3]))
        store.write_batch(batch(spark, [2, 3, 4]))
        assert store.checkpoint().height == 4
        assert store.changelog().filter("height = 3").count() == 1

    def test_empty_batch_noop(self, spark, store):
        store.write_batch(batch(spark, [1]))
        store.write_batch(batch(spark, []))
        assert store.checkpoint().height == 1

    def test_shard_checkpoints(self, spark, store):
        store.write_batch(batch(spark, [1, 2]), shard="0")
        store.write_batch(batch(spark, [1, 2, 3], pk="002"), shard="1")
        assert store.checkpoint("0").height == 2
        assert store.checkpoint("1").height == 3
        assert store.checkpoint() is None  # global untouched
        assert store.delete_shard_checkpoints() == 2
        assert store.checkpoint("0") is None

    def test_clean_db_precondition(self, spark, store):
        store.check_clean_for_sharding()  # empty: fine
        store.write_batch(batch(spark, [1]))
        with pytest.raises(WriteConsistencyError, match="non-clean"):
            store.check_clean_for_sharding()
