"""Wire-format pins for the vendored protobuf shim.

The shim (vendor/google/protobuf, clean-room from the public encoding
spec) is what lets Spark 4's transformWithStateInPandas run in this
container; a silent encode bug would corrupt the state protocol, so
every byte-level rule the Spark StateMessage schema exercises is
pinned here against hand-computed wire bytes, and the generated
pyspark pb2 module is round-tripped message-by-message. The true e2e
check is TestStreamingGridLocfTws/TestStreamingPollScheduleTws: there
the JVM's real protobuf parser consumes the shim's output.
"""

from __future__ import annotations

import pytest

from homelogging_spark.protoshim import ensure_protobuf

if ensure_protobuf() == "missing":  # pragma: no cover
    pytest.skip("no google.protobuf runtime", allow_module_level=True)

import pyspark.sql.streaming.proto.StateMessage_pb2 as sm  # noqa: E402


class TestWireFormat:
    def test_varint_field_hand_computed(self):
        # field 1 (version, int32), value 300:
        # tag = 1<<3|0 = 0x08; 300 = 0b10_0101100 -> 0xAC 0x02
        msg = sm.StateRequest(version=300)
        assert msg.SerializeToString() == b"\x08\xac\x02"

    def test_default_scalar_omitted(self):
        # proto3: a scalar equal to its default is not serialized
        assert sm.StateRequest(version=0).SerializeToString() == b""
        assert sm.StateResponse(statusCode=0).SerializeToString() == b""

    def test_string_and_bytes_fields(self):
        # StateCallCommand.stateName = field 1 (string): tag 0x0A
        c = sm.StateCallCommand(stateName="ab")
        assert c.SerializeToString() == b"\x0a\x02ab"
        k = sm.SetImplicitKey(key=b"\x00\xff")
        assert k.SerializeToString() == b"\x0a\x02\x00\xff"

    def test_nested_message_length_prefixed(self):
        # SetHandleState.state = field 1 enum INITIALIZED(2) -> 08 02
        # StatefulProcessorCall.setHandleState = field 1 msg -> 0a 02 ..
        # StateRequest.statefulProcessorCall = field 2 msg -> 12 04 ..
        req = sm.StateRequest(
            statefulProcessorCall=sm.StatefulProcessorCall(
                setHandleState=sm.SetHandleState(state=sm.INITIALIZED)
            )
        )
        assert req.SerializeToString() == b"\x12\x04\x0a\x02\x08\x02"

    def test_int64_varint(self):
        r = sm.RegisterTimer(expiryTimestampMs=1)
        assert r.SerializeToString() == b"\x08\x01"
        big = sm.RegisterTimer(expiryTimestampMs=1_712_000_000_123)
        out = sm.RegisterTimer()
        out.ParseFromString(big.SerializeToString())
        assert out.expiryTimestampMs == 1_712_000_000_123

    def test_negative_int_is_ten_byte_varint(self):
        # negative ints sign-extend to 64 bits on the wire
        msg = sm.StateResponse(statusCode=-1)
        data = msg.SerializeToString()
        assert data == b"\x08" + b"\xff" * 9 + b"\x01"
        back = sm.StateResponse()
        back.ParseFromString(data)
        assert back.statusCode == -1

    def test_bool_field(self):
        m = sm.ListStatePut(fetchWithArrow=True)
        assert m.SerializeToString() == b"\x10\x01"
        assert sm.ListStatePut(fetchWithArrow=False).SerializeToString() == b""

    def test_repeated_bytes_roundtrip(self):
        src = sm.StateResponseWithListGet(statusCode=0, requireNextFetch=True)
        src.value.extend([b"abc", b"", b"\x00" * 4])
        back = sm.StateResponseWithListGet()
        back.ParseFromString(src.SerializeToString())
        assert list(back.value) == [b"abc", b"", b"\x00" * 4]
        assert back.requireNextFetch is True

    def test_repeated_message_roundtrip(self):
        t = sm.StateResponseWithTimer(statusCode=0)
        t.timer.add(timestampMs=111)
        second = t.timer.add(timestampMs=222)
        second.key = b"k2"
        back = sm.StateResponseWithTimer()
        back.ParseFromString(t.SerializeToString())
        got = [(x.key, x.timestampMs) for x in back.timer]
        assert got == [(b"", 111), (b"k2", 222)]

    def test_proto3_optional_presence(self):
        # TimerInfo.key is proto3-optional: absent and b"" differ on
        # the wire (presence is what the ListTimers path relies on)
        absent = sm.TimerInfo(timestampMs=5)
        assert absent.SerializeToString() == b"\x10\x05"
        empty = sm.TimerInfo(timestampMs=5)
        empty.key = b""
        assert empty.SerializeToString() == b"\x0a\x00\x10\x05"

    def test_oneof_last_set_wins(self):
        req = sm.ImplicitGroupingKeyRequest(
            setImplicitKey=sm.SetImplicitKey(key=b"k")
        )
        req.removeImplicitKey = sm.RemoveImplicitKey()
        data = req.SerializeToString()
        # only field 2 (removeImplicitKey, empty msg) remains: 12 00
        assert data == b"\x12\x00"

    def test_empty_message_serializes_empty(self):
        assert sm.RemoveImplicitKey().SerializeToString() == b""
        assert sm.GetProcessingTime().SerializeToString() == b""

    def test_autovivified_submessage(self):
        # the exact pattern stateful_processor_api_client uses for TTL
        c = sm.StateCallCommand()
        c.stateName = "s"
        c.ttl.durationMs = 5000
        back = sm.StateCallCommand()
        back.ParseFromString(c.SerializeToString())
        assert back.ttl.durationMs == 5000 and back.stateName == "s"
        # reading a submessage without mutating must NOT mark presence
        c2 = sm.StateCallCommand(stateName="s")
        _ = c2.ttl.durationMs
        assert c2.SerializeToString() == b"\x0a\x01s"

    def test_unknown_fields_skipped(self):
        # parse bytes carrying a field number the schema lacks
        # (field 15 varint + field 1 varint): unknowns are skipped
        data = b"\x78\x2a" + b"\x08\x07"
        m = sm.StateResponse()
        m.ParseFromString(data)
        assert m.statusCode == 7

    def test_every_state_request_shape_roundtrips(self):
        """Each request the pyspark API client builds survives
        serialize -> parse with all set fields intact."""
        shapes = [
            sm.StateRequest(
                statefulProcessorCall=sm.StatefulProcessorCall(
                    getValueState=sm.StateCallCommand(
                        stateName="v", schema="a bigint"
                    )
                )
            ),
            sm.StateRequest(
                stateVariableRequest=sm.StateVariableRequest(
                    valueStateCall=sm.ValueStateCall(
                        stateName="v",
                        valueStateUpdate=sm.ValueStateUpdate(value=b"xyz"),
                    )
                )
            ),
            sm.StateRequest(
                implicitGroupingKeyRequest=sm.ImplicitGroupingKeyRequest(
                    setImplicitKey=sm.SetImplicitKey(key=b"row")
                )
            ),
            sm.StateRequest(
                timerRequest=sm.TimerRequest(
                    expiryTimerRequest=sm.ExpiryTimerRequest(
                        iteratorId="it-1", expiryTimestampMs=777
                    )
                )
            ),
            sm.StateRequest(
                utilsRequest=sm.UtilsRequest(
                    parseStringSchema=sm.ParseStringSchema(schema="a int")
                )
            ),
        ]
        for msg in shapes:
            back = sm.StateRequest()
            back.ParseFromString(msg.SerializeToString())
            assert back.SerializeToString() == msg.SerializeToString()

    def test_shim_identifies_itself(self):
        import google.protobuf as gp

        status = ensure_protobuf()
        assert status in ("installed", "shim")
        if status == "shim":
            assert "shim" in gp.__version__
