"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design per the brief: image/audio/video travel as `binary` columns with typed
metadata; decode / feature-extract / resize / frame-sample run as
Arrow-batched Pandas functions over `mapInPandas`. The decode itself is
STUBBED (no image/audio libs in this container): with Pillow/soundfile
absent, a clearly-marked deterministic fake decoder produces metadata from
the bytes, so the Spark-side plumbing — schema, batch iteration, UDF
signatures, partitioning — is real and tested while the pixel math is not
pretended.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real decoder if ever available; not in this image
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, width int, height int, checksum long"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"


def with_binary_payload(docs: DataFrame, col: str = "text") -> DataFrame:
    """Treat a text column as an opaque binary payload (the stand-in for
    image/audio bytes in this container)."""
    return docs.withColumn("payload", F.encode(F.col(col), "utf-8"))


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in for image decode. NOT a real decoder."""
    n = len(payload)
    width = (payload[0] % 64 + 1) if n else 0
    height = (payload[-1] % 64 + 1) if n else 0
    checksum = 0
    for i in range(0, n, max(1, n // 32)):  # sampled rolling checksum
        checksum = (checksum * 31 + payload[i]) % (1 << 60)
    return width, height, checksum


def decode_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched decode of payload -> typed metadata via mapInPandas.

    With a real imaging lib this is where Image.open(BytesIO(...)) would
    run; here the fake decoder keeps the batch shape and schema honest.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAVE_PIL:
                raise NotImplementedError(
                    "real image decode path not implemented in this build"
                )
            decoded = pdf["payload"].map(_fake_decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": pdf["payload"].map(len),
                    "width": decoded.map(lambda t: t[0]),
                    "height": decoded.map(lambda t: t[1]),
                    "checksum": decoded.map(lambda t: t[2]),
                }
            )

    return df.select("doc_id", "payload").mapInPandas(op, DECODE_SCHEMA)


def frame_sample(df: DataFrame, frame_size: int = 64, stride: int = 128) -> DataFrame:
    """'Video' frame sampling: cut the payload into fixed-size frames at a
    stride — the partition/batch shape of a real frame sampler."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_idx, out_bytes = [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for fi, start in enumerate(range(0, len(payload), stride)):
                    out_ids.append(doc_id)
                    out_idx.append(fi)
                    out_bytes.append(bytes(payload[start : start + frame_size]))
            yield pd.DataFrame(
                {
                    "doc_id": out_ids,
                    "frame_idx": out_idx,
                    "frame_bytes": out_bytes,
                }
            )

    return df.select("doc_id", "payload").mapInPandas(op, FRAME_SCHEMA)
