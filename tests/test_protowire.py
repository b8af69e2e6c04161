"""Protobuf wire-format tier (functions/protowire.py).

The encoder and decoder are independent implementations, each pinned
against byte vectors from the protobuf encoding spec, so a matched-bug
round-trip cannot pass silently. The JVM from_protobuf tier is probed —
in this image the spark-protobuf jar is absent, so the gate must fall
back to the Arrow decoder (and say so deterministically).
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fluxdb_spark.functions import protowire as pw

I64 = st.integers(min_value=-(2**63), max_value=2**63 - 1)
U32 = st.integers(min_value=0, max_value=2**32 - 1)


class TestWireGolden:
    """Byte vectors from the public protobuf encoding documentation."""

    def test_varint_150(self):
        # the canonical `08 96 01` example: field 1, varint 150
        assert pw.tag(1, 0) + pw.varint(150) == b"\x08\x96\x01"

    def test_string_testing(self):
        # the canonical `12 07 74 65 73 74 69 6e 67` example: field 2 "testing"
        enc = pw.encode_demo(0, "testing", 0, 0)
        assert enc == b"\x12\x07testing"
        assert pw.decode_demo(enc)["src"] == "testing"

    def test_negative_int64_is_ten_bytes(self):
        # spec: negative int64 always encodes as 10-byte two's complement
        enc = pw.encode_demo(-2, "", 0, 0)
        assert len(enc) == 1 + 10
        assert pw.decode_demo(enc)["k"] == -2

    def test_zigzag_spec_table(self):
        # spec table: 0->0, -1->1, 1->2, -2->3, 2147483647->4294967294
        assert pw.zigzag(0) == 0
        assert pw.zigzag(-1) == 1
        assert pw.zigzag(1) == 2
        assert pw.zigzag(-2) == 3
        assert pw.zigzag(2147483647) == 4294967294

    def test_fixed32_little_endian(self):
        enc = pw.encode_demo(0, "", 0, 0x12345678)
        # tag (5<<3)|5 = 0x2d, then LE bytes
        assert enc == b"\x2d\x78\x56\x34\x12"

    def test_proto3_default_elision(self):
        assert pw.encode_demo(0, "", 0, 0) == b""
        assert pw.decode_demo(b"") == {
            "k": 0,
            "src": "",
            "delta": 0,
            "crc": 0,
        }


class TestWireProperties:
    @settings(max_examples=200, deadline=None)
    @given(k=I64, src=st.text(max_size=40), delta=I64, crc=U32)
    def test_round_trip(self, k, src, delta, crc):
        got = pw.decode_demo(pw.encode_demo(k, src, delta, crc))
        assert got == {"k": k, "src": src, "delta": delta, "crc": crc}

    @settings(max_examples=50, deadline=None)
    @given(k=I64)
    def test_unknown_fields_skipped(self, k):
        # splice an unknown varint field (99) and an unknown length-
        # delimited field (100) into the stream; the decoder must skip both
        extra = (
            pw.tag(99, 0)
            + pw.varint(12345)
            + pw.tag(100, 2)
            + pw.varint(3)
            + b"abc"
        )
        enc = pw.encode_demo(k, "x", 0, 0)
        assert pw.decode_demo(extra + enc)["k"] == k
        assert pw.decode_demo(enc + extra)["src"] == "x"

    def test_truncated_varint_raises(self):
        with pytest.raises(ValueError, match="truncated"):
            pw.decode_demo(b"\x08\x96")


class TestDescriptorSet:
    def test_structure_via_own_parser(self):
        """Walk the FileDescriptorSet with the generic wire reader and
        check the names land where descriptor.proto says they should."""
        blob = pw.demo_descriptor_set()
        # FileDescriptorSet.file == field 1, length-delimited
        tagv, i = pw._read_varint(blob, 0)
        assert tagv >> 3 == 1 and tagv & 7 == 2
        ln, i = pw._read_varint(blob, i)
        file_proto = blob[i : i + ln]
        assert i + ln == len(blob)
        for needle in (b"demo_value.proto", b"flux", b"DemoValue", b"proto3",
                       b"src", b"delta", b"crc"):
            assert needle in file_proto

    def test_deterministic(self):
        assert pw.demo_descriptor_set() == pw.demo_descriptor_set()


class TestColumnTiers:
    def test_arrow_round_trip_on_dataframe(self, spark):
        df = spark.createDataFrame(
            [(1, 150, "signup", -7, 123), (2, 0, "", 0, 0), (3, None, None, None, None)],
            "id long, k long, src string, delta long, crc long",
        )
        wire = df.select(
            "id",
            pw.encode_demo_udf()(
                F.col("k"), F.col("src"), F.col("delta"), F.col("crc")
            ).alias("value"),
        )
        out = {
            r.id: r.decoded
            for r in wire.select(
                "id", pw.decode_demo_udf()(F.col("value")).alias("decoded")
            ).collect()
        }
        assert out[1].k == 150 and out[1].src == "signup"
        assert out[1].delta == -7 and out[1].crc == 123
        assert out[2].k == 0 and out[2].src == ""
        # a struct pandas UDF cannot emit a top-level null struct; null
        # input maps to the all-null-fields row (documented in the decoder)
        assert (out[3].k, out[3].src, out[3].delta, out[3].crc) == (
            None,
            None,
            None,
            None,
        )

    def test_jvm_tier_dormant_in_this_image(self, spark):
        """The sandbox pyspark has no spark-protobuf jar: the probe must be
        False and the gate must route to the Arrow decoder (if the jar ever
        appears, the probe flips and the JVM plan is used instead)."""
        assert pw.jvm_protobuf_available(spark) is False
        df = spark.createDataFrame(
            [(pw.encode_demo(150, "s", -1, 9),)], "value binary"
        )
        row = df.select(
            pw.decode_protobuf_col(spark, F.col("value")).alias("d")
        ).collect()[0]
        assert (row.d.k, row.d.src, row.d.delta, row.d.crc) == (150, "s", -1, 9)

    def test_jvm_tier_crc_sign_normalization(self, spark):
        """The JVM tier's post-decode projection must map a SIGNED
        fixed32 (what from_protobuf yields) back to the unsigned value
        the Arrow tier and the oracle produce. The jar is absent here,
        so pin the normalization expression itself: a crc that decoded
        as int32 -1 must surface as 2^32 - 1."""
        df = spark.createDataFrame(
            [(-1,), (-2147483648,), (9,), (2147483647,)], "crc int"
        )
        got = [
            r.u
            for r in df.select(
                F.pmod(F.col("crc").cast("long"), F.lit(2**32)).alias("u")
            ).collect()
        ]
        assert got == [2**32 - 1, 2**31, 9, 2**31 - 1]
        # and the Arrow tier round-trips the same high-bit value unsigned
        wire = pw.encode_demo(1, "s", 0, 0xDEADBEEF)
        out = pw.decode_demo(wire)
        assert out["crc"] == 0xDEADBEEF == 3735928559

    def test_registry_integration_matches_from_json_tier(self, spark, mk):
        """Same data through the from_json tier and the protowire tier must
        agree on the typed value (test_blocks-style tier pinning)."""
        from pyspark.sql import types as T

        from fluxdb_spark.registry import Collection, default_registry

        rows = [("evt", h, f"pk{h}", f'{{"k": {h * 7}}}') for h in (1, 2, 200)]
        log = mk(rows)
        reg = default_registry()
        reg.register(
            Collection(
                0x0001,
                "tst",
                decoder=lambda v: F.from_json(
                    v, T.StructType([T.StructField("k", T.LongType())])
                ),
            )
        )
        json_tier = {
            r.height: r.decoded.k
            for r in reg.typed_view(log, "tst").collect()
        }

        wire = log.withColumn(
            "value",
            pw.encode_demo_udf()(
                F.get_json_object("value", "$.k").cast("long"),
                F.col("tablet_id"),
                F.lit(0),
                F.lit(0),
            ),
        )
        reg2 = default_registry()
        reg2.register(
            Collection(0x0002, "tst", decoder=lambda v: pw.decode_demo_udf()(v))
        )
        proto_tier = {
            r.height: r.decoded.k
            for r in reg2.typed_view(wire, "tst").collect()
        }
        assert json_tier == proto_tier == {1: 7, 2: 14, 200: 1400}


class TestNestedRepeated:
    """EventValue: packed repeated sint64 + repeated submessages."""

    def test_round_trip_with_negatives_and_empties(self):
        from fluxdb_spark.functions.protowire import (
            decode_event,
            encode_event,
        )

        cases = [
            (7, [3, -4, 0, 127, -128], [("a", 1), ("", 5), ("z", 0)]),
            (0, [], []),
            (1, [2**40, -(2**40)], [("key", 2**50)]),
        ]
        for k, d, t in cases:
            got = decode_event(encode_event(k, d, t))
            assert got == {
                "k": k,
                "deltas": list(d),
                "tags": [{"key": kk, "n": nn} for kk, nn in t],
            }

    def test_packed_wire_bytes_pinned(self):
        # deltas [3, -4] packed: tag(2,LD)=0x12, len=2, zigzag(3)=6,
        # zigzag(-4)=7
        from fluxdb_spark.functions.protowire import encode_event

        assert encode_event(0, [3, -4], []) == bytes([0x12, 0x02, 0x06, 0x07])

    def test_expanded_unpacked_form_accepted(self):
        # proto3 spec: parsers must accept repeated scalars in BOTH the
        # packed and the one-tag-per-element form
        from fluxdb_spark.functions.protowire import (
            _ld,
            decode_event,
            tag,
            varint,
            zigzag,
        )

        b = (
            tag(1, 0) + varint(7)
            + tag(2, 0) + varint(zigzag(3))
            + tag(2, 0) + varint(zigzag(-4))
        )
        assert decode_event(bytes(b)) == {
            "k": 7, "deltas": [3, -4], "tags": [],
        }

    def test_unknown_field_skipped_inside_submessage(self):
        from fluxdb_spark.functions.protowire import (
            _ld,
            decode_event,
            tag,
            varint,
        )

        sub = tag(1, 2) + _ld(b"x") + tag(9, 0) + varint(999) + tag(2, 0) + varint(5)
        msg = tag(3, 2) + _ld(bytes(sub))
        assert decode_event(bytes(msg)) == {
            "k": 0, "deltas": [], "tags": [{"key": "x", "n": 5}],
        }
