"""BlockMapper sources (sources/blocks.py): the reference's single
data-extraction extension point (types.go:40-42) in both its declarative
(from_json+explode) and arbitrary-decode (mapInPandas) forms.

Both paths must produce identical change-log rows from the same payloads,
and those rows must answer temporal reads correctly."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from fluxdb_spark.operators import state_at
from fluxdb_spark.sources import map_blocks_with_pandas, parse_json_blocks

BLOCKS = [
    {
        "block_id": "aa01",
        "block_num": 1,
        "parent_id": "",
        "rows": [
            {"tablet_id": "bal", "primary_key": "alice", "value": "100",
             "is_deletion": False},
            {"tablet_id": "bal", "primary_key": "bob", "value": "50",
             "is_deletion": False},
        ],
    },
    {
        "block_id": "aa02",
        "block_num": 2,
        "parent_id": "aa01",
        "rows": [
            {"tablet_id": "bal", "primary_key": "alice", "value": "75",
             "is_deletion": False},
            {"tablet_id": "bal", "primary_key": "bob", "value": None,
             "is_deletion": True},
        ],
    },
    {
        "block_id": "aa03",
        "block_num": 3,
        "parent_id": "aa02",
        "rows": [
            {"tablet_id": "bal", "primary_key": "carol", "value": "10",
             "is_deletion": False},
        ],
    },
]


@pytest.fixture(scope="module")
def raw(spark):
    return spark.createDataFrame(
        [(json.dumps(b),) for b in BLOCKS], "payload string"
    )


class TestJsonPath:
    def test_rows(self, raw):
        log = parse_json_blocks(raw)
        assert log.count() == 5
        r = {
            (x.height, x.primary_key): (x.value, x.is_deletion)
            for x in log.collect()
        }
        assert r[(2, "bob")] == (None, True)
        assert r[(1, "alice")] == ("100", False)

    def test_temporal_read_over_mapped_blocks(self, raw):
        log = parse_json_blocks(raw)
        got = {
            r.primary_key: r.value
            for r in state_at(log, "bal", 3, collection="blk").collect()
        }
        # bob tombstoned at 2; alice upserted at 2; carol added at 3
        assert got == {"alice": "75", "carol": "10"}

    def test_read_before_tombstone(self, raw):
        log = parse_json_blocks(raw)
        got = {
            r.primary_key: r.value
            for r in state_at(log, "bal", 1, collection="blk").collect()
        }
        assert got == {"alice": "100", "bob": "50"}


class TestPandasPath:
    def test_matches_json_path(self, raw):
        decoded = map_blocks_with_pandas(raw, json.loads)
        declarative = parse_json_blocks(raw)
        a = sorted(map(tuple, decoded.collect()))
        b = sorted(map(tuple, declarative.collect()))
        assert a == b

    def test_custom_binaryish_decoder(self, spark):
        """A non-JSON encoding ('num|id|tablet:pk=value;...') the declarative
        path can't express — the reason the pandas tier exists."""

        def decode(payload: str) -> dict:
            head, _, body = payload.partition("!")
            num, bid = head.split("|")
            rows = []
            for part in filter(None, body.split(";")):
                addr, _, value = part.partition("=")
                tablet, _, pk = addr.partition(":")
                rows.append(
                    {
                        "tablet_id": tablet,
                        "primary_key": pk,
                        "value": value or None,
                        "is_deletion": value == "",
                    }
                )
            return {"block_id": bid, "block_num": int(num), "rows": rows}

        raw = spark.createDataFrame(
            [("7|bb07!bal:alice=42;bal:bob=",)], "payload string"
        )
        out = map_blocks_with_pandas(raw, decode).collect()
        by_pk = {r.primary_key: r for r in out}
        assert by_pk["alice"].value == "42" and not by_pk["alice"].is_deletion
        assert by_pk["bob"].is_deletion and by_pk["bob"].height == 7


class TestUdtfPath:
    def test_matches_other_tiers(self, spark, raw):
        """The registered-UDTF tier (SQL LATERAL form) must produce exactly
        the mapInPandas/from_json rows."""
        from fluxdb_spark.sources import map_blocks_with_udtf

        via_udtf = map_blocks_with_udtf(spark, raw, json.loads)
        declarative = parse_json_blocks(raw)
        a = sorted(map(tuple, via_udtf.collect()))
        b = sorted(map(tuple, declarative.collect()))
        assert a == b

    def test_composes_in_sql(self, spark, raw):
        """The point of the UDTF form: plain SQL around the mapper."""
        from fluxdb_spark.sources import map_blocks_with_udtf

        log = map_blocks_with_udtf(spark, raw, json.loads)
        log.createOrReplaceTempView("udtf_log")
        n = spark.sql(
            "SELECT count(*) AS n FROM udtf_log WHERE is_deletion"
        ).first()["n"]
        assert n == 1
