"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Design per the brief: image/audio/video travel as `binary` columns with
typed metadata; decode / feature-extract / frame-sample run as
Arrow-batched Pandas functions over `mapInPandas`.

No imaging/audio libraries exist in this container, so the PIXEL decode
(Image.open & co.) is gated behind an import-try and raises a
clearly-marked NotImplementedError if ever reached. Everything else is a
REAL bytes-level transform, not a fake:

- `decode_metadata` parses actual header bytes (magic byte, big-endian
  first-word) and computes a full-content md5-derived checksum — the same
  shape as parsing a BMP/WAV header + integrity hash, and every field has
  an exact DuckDB twin (catalog `multimodal_decode`);
- `frame_sample` slices the payload into fixed-size frames at a stride —
  the partition/batch shape of a real frame sampler, also oracle-twinned
  byte-for-byte (catalog `multimodal_frames`).

The payload here is utf-8 text bytes standing in for media bytes; the
oracle equivalence relies on the corpus being ASCII (asserted in
tests/test_multimodal.py) so DuckDB's string functions mirror byte
offsets exactly.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

try:  # real pixel decoder if ever available; not in this image
    from PIL import Image  # noqa: F401

    _HAVE_PIL = True
except Exception:
    _HAVE_PIL = False

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, magic int, header_word long, checksum long"
)
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_bytes binary"


def with_binary_payload(docs: DataFrame, col: str = "text") -> DataFrame:
    """Treat a text column as an opaque binary payload (the stand-in for
    image/audio bytes in this container)."""
    return docs.withColumn("payload", F.encode(F.col(col), "utf-8"))


def parse_payload(payload: bytes) -> tuple[int, int, int, int]:
    """REAL bytes-level parse of one payload:

    - n_bytes: exact byte length;
    - magic: the first byte (the 'format magic' slot of any container);
    - header_word: big-endian uint32 of the first 4 bytes, zero-padded —
      the way BMP/PNG/WAV headers encode dimensions/rates;
    - checksum: full-content integrity hash = first 60 bits of md5.
    """
    n = len(payload)
    magic = payload[0] if n else 0
    header_word = int.from_bytes(payload[:4].ljust(4, b"\0"), "big")
    checksum = int(hashlib.md5(payload).hexdigest()[:15], 16)
    return n, magic, header_word, checksum


def decode_metadata(df: DataFrame) -> DataFrame:
    """Arrow-batched decode of payload -> typed metadata via mapInPandas.

    With an imaging lib present this is where pixel decode would run
    (gated NotImplementedError below so a library appearing can't silently
    change results); the bytes-level header parse + checksum are real and
    oracle-checked either way.
    """

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if _HAVE_PIL:
                raise NotImplementedError(
                    "pixel decode path not implemented in this build"
                )
            parsed = pdf["payload"].map(parse_payload)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": parsed.map(lambda t: t[0]),
                    "magic": parsed.map(lambda t: t[1]),
                    "header_word": parsed.map(lambda t: t[2]),
                    "checksum": parsed.map(lambda t: t[3]),
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
