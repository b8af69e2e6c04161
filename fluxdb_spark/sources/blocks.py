"""Block sources: the BlockMapper extension surface over raw block payloads.

The reference's only data-extraction extension point is `BlockMapper.Map:
Block -> *WriteRequest` (types.go:40-42), invoked on a preprocessor thread
pool (pipeline.go:57,134) — a UDTF: one block in, N versioned rows out.

Spark-first translation, two tiers:

- `parse_json_blocks` — the declarative fast path: `from_json` + `explode`,
  entirely JVM-side expressions (no Python per row), for blocks whose
  payload is JSON. At 100 TB this is a single map stage inside whole-stage
  codegen; parallelism is the source partitioning, exactly like the
  reference's preprocessor pool but without a pool to size.
- `map_blocks_with_pandas` — the arbitrary-decode path: a user Python
  decoder over `mapInPandas` (Arrow-batched, never row-at-a-time) for
  payloads Spark expressions can't parse (protobuf, custom binary). This is
  the literal BlockMapper analog: the user function sees one payload and
  returns its rows.

Both emit CHANGELOG_SCHEMA rows and plug straight into the write path /
temporal operators.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from fluxdb_spark.schema import CHANGELOG_COLUMNS

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# Payload carried by one block: its ref + the rows it mutates.
BLOCK_PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("block_id", T.StringType()),
        T.StructField("block_num", T.LongType()),
        T.StructField("parent_id", T.StringType()),
        T.StructField(
            "rows",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("tablet_id", T.StringType()),
                        T.StructField("primary_key", T.StringType()),
                        T.StructField("value", T.StringType()),
                        T.StructField("is_deletion", T.BooleanType()),
                    ]
                )
            ),
        ),
    ]
)


def parse_json_blocks(
    raw: DataFrame, payload_col: str = "payload", collection: str = "blk"
) -> DataFrame:
    """JSON block payloads -> change-log rows, all JVM-side.

    `raw` needs one string column (`payload_col`) holding a JSON object of
    BLOCK_PAYLOAD_SCHEMA shape. Height is the block number (the reference
    keys every row of a WriteRequest by its block's height, types.go:44-50).
    """
    b = raw.select(
        F.from_json(F.col(payload_col), BLOCK_PAYLOAD_SCHEMA).alias("b")
    )
    exploded = b.select("b.block_id", "b.block_num", F.explode("b.rows").alias("r"))
    return exploded.select(
        F.lit(collection).alias("collection"),
        F.col("r.tablet_id").alias("tablet_id"),
        F.col("block_num").alias("height"),
        F.col("r.primary_key").alias("primary_key"),
        F.col("r.value").alias("value"),
        F.coalesce(F.col("r.is_deletion"), F.lit(False)).alias("is_deletion"),
        F.col("block_id").alias("block_id"),
        F.col("block_num").alias("block_num"),
    )


BlockDecoder = Callable[[str], dict]
"""User decoder: payload -> {'block_id', 'block_num', 'rows': [row dicts]}."""


def map_blocks_with_pandas(
    raw: DataFrame,
    decoder: BlockDecoder,
    payload_col: str = "payload",
    collection: str = "blk",
) -> DataFrame:
    """Arbitrary-encoding BlockMapper: `decoder` runs per payload inside an
    Arrow-batched `mapInPandas` stage (the UDF slow path, used only when the
    encoding genuinely can't be expressed as Spark functions)."""

    def op(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in batches:
            out: list[dict] = []
            for payload in pdf[payload_col]:
                blk = decoder(payload)
                for r in blk.get("rows", []):
                    out.append(
                        {
                            "collection": collection,
                            "tablet_id": r["tablet_id"],
                            "height": int(blk["block_num"]),
                            "primary_key": r.get("primary_key", ""),
                            "value": r.get("value"),
                            "is_deletion": bool(r.get("is_deletion", False)),
                            "block_id": blk["block_id"],
                            "block_num": int(blk["block_num"]),
                        }
                    )
            yield pd.DataFrame(out, columns=CHANGELOG_COLUMNS)

    from fluxdb_spark.schema import CHANGELOG_SCHEMA

    return raw.mapInPandas(op, CHANGELOG_SCHEMA)


def map_blocks_with_udtf(
    spark,
    raw: DataFrame,
    decoder: BlockDecoder,
    payload_col: str = "payload",
    collection: str = "blk",
) -> DataFrame:
    """The BlockMapper as a registered Python UDTF — the SQL-native form of
    the same extension point: `LATERAL block_mapper(payload)` composes with
    arbitrary SQL around it, which is how a SQL-first user would consume a
    custom block decoder (the reference's BlockMapper is Go-API-only;
    types.go:40-42). Must yield exactly the rows the mapInPandas tier
    yields — pinned in tests/test_blocks.py.

    Registration uses FIXED names with replace semantics (uuid-per-call
    names accumulated catalog entries for a long-lived session's lifetime);
    the temp view is dropped once the returned plan is analyzed, so only
    the UDTF registration remains, overwritten by the next call. Not safe
    for concurrent callers on one session — each call briefly owns the
    shared view name."""
    from pyspark.sql.functions import udtf

    from fluxdb_spark.schema import CHANGELOG_SCHEMA

    @udtf(returnType=CHANGELOG_SCHEMA)
    class BlockMapperUDTF:
        def eval(self, payload: str):
            blk = decoder(payload)
            for r in blk.get("rows", []):
                yield (
                    collection,
                    r["tablet_id"],
                    int(blk["block_num"]),
                    r.get("primary_key", ""),
                    r.get("value"),
                    bool(r.get("is_deletion", False)),
                    blk["block_id"],
                    int(blk["block_num"]),
                )

    fn = "flux_block_mapper"
    view = "flux_raw_blocks"
    spark.udtf.register(fn, BlockMapperUDTF)
    raw.createOrReplaceTempView(view)
    try:
        # spark.sql analyzes eagerly; the returned plan holds the resolved
        # relation, so the view can be dropped immediately
        return spark.sql(
            f"SELECT m.* FROM {view} b, LATERAL {fn}(b.{payload_col}) m"
        )
    finally:
        spark.catalog.dropTempView(view)
