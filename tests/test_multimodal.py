"""Multimodal column plumbing (functions/multimodal.py): binary payload
columns + Arrow-batched mapInPandas decode / frame-sample. The pixel decode
is unavailable (no imaging libs in this container) but the bytes-level
header parse + checksum are real — these tests pin the Spark-side contract
(schemas, batch iteration, row expansion, determinism) and the byte math
against a plain-Python reference."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from fluxdb_spark.functions.multimodal import (
    decode_metadata,
    frame_sample,
    parse_payload,
    with_binary_payload,
)
from fluxdb_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return with_binary_payload(load_table(spark, SF, "documents")).persist()


class TestDecode:
    def test_schema(self, docs):
        out = decode_metadata(docs)
        assert [f.name for f in out.schema.fields] == [
            "doc_id", "n_bytes", "magic", "header_word", "checksum",
        ]

    def test_corpus_is_ascii(self, docs):
        # the DuckDB oracle mirrors byte offsets with string functions;
        # that equivalence requires ASCII payloads — pin it
        assert (
            docs.filter(
                F.octet_length("payload") != F.length("text")
            ).count()
            == 0
        )

    def test_matches_local_reference(self, docs):
        sample = {r.doc_id: bytes(r.payload) for r in docs.limit(5).collect()}
        got = {
            r.doc_id: (r.n_bytes, r.magic, r.header_word, r.checksum)
            for r in decode_metadata(docs).collect()
        }
        for doc_id, payload in sample.items():
            assert got[doc_id] == parse_payload(payload)

    def test_parse_payload_bytes_math(self):
        # real header semantics: big-endian first word, zero padded
        assert parse_payload(b"") == (0, 0, 0, int(
            hashlib.md5(b"").hexdigest()[:15], 16))
        n, magic, word, _ = parse_payload(b"AB")
        assert (n, magic) == (2, ord("A"))
        assert word == (ord("A") << 24) | (ord("B") << 16)

    def test_deterministic(self, docs):
        a = sorted(map(tuple, decode_metadata(docs).collect()))
        b = sorted(map(tuple, decode_metadata(docs).collect()))
        assert a == b


class TestFrameSample:
    def test_frame_count_and_bytes(self, docs):
        stride, size = 128, 64
        frames = frame_sample(docs, frame_size=size, stride=stride)
        lens = {r.doc_id: len(bytes(r.payload)) for r in docs.collect()}
        by_doc: dict[int, list] = {}
        for r in frames.collect():
            by_doc.setdefault(r.doc_id, []).append(r)
        for doc_id, n in lens.items():
            expect = (n + stride - 1) // stride
            assert len(by_doc[doc_id]) == expect
            first = min(by_doc[doc_id], key=lambda r: r.frame_idx)
            assert len(bytes(first.frame_bytes)) == min(size, n)

    def test_frame_bytes_slice_payload(self, docs):
        one = (
            docs.filter(F.octet_length("payload") > 256)
            .orderBy("doc_id")
            .limit(1)
            .collect()[0]
        )
        payload = bytes(one.payload)
        frames = (
            frame_sample(docs.filter(F.col("doc_id") == one.doc_id))
            .orderBy("frame_idx")
            .collect()
        )
        assert bytes(frames[0].frame_bytes) == payload[:64]
        assert bytes(frames[1].frame_bytes) == payload[128:192]
