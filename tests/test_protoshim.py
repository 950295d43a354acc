"""Unit tests for the vendored pure-Python google.protobuf runtime shim.

The shim (ranger_spark/vendor/pyshims/google/protobuf) exists so Spark's
transformWithStateInPandas Python worker can run without a protobuf
distribution. Its end-to-end reference validation is the JVM StateServer
(real Java protobuf) in tests/test_stateful_streaming.py; these tests
pin the wire format against byte vectors hand-derived from the public
encoding spec (https://protobuf.dev/programming-guides/encoding/) and
exercise the generated-code API surface on the REAL generated module
pyspark ships (StateMessage_pb2), so a pyspark upgrade that widens its
protobuf usage fails here first.
"""

from __future__ import annotations

import pytest

from ranger_spark.protoshim import SHIM_DIR, ensure_protobuf

MODE = ensure_protobuf()

sm = pytest.importorskip("pyspark.sql.streaming.proto.StateMessage_pb2")


def test_mode_reported():
    assert MODE in ("real", "shim")


# ---------------------------------------------------------------------------
# wire-format byte vectors (meaningful only for the shim's own encoder;
# they hold for the real runtime too — proto3 canonical encoding)
# ---------------------------------------------------------------------------
def test_nested_oneof_vector():
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CREATED)
        )
    )
    # field 2 LEN(4) { field 1 LEN(2) { field 1 VARINT 1 } }
    assert req.SerializeToString() == bytes.fromhex("12040a020801")


def test_default_scalars_omitted():
    # proto3: plain scalars at default value serialize to nothing
    assert sm.StateResponse(statusCode=0, errorMessage="", value=b"").SerializeToString() == b""
    # ...and non-defaults use the minimal encoding
    assert sm.StateResponse(statusCode=1).SerializeToString() == bytes.fromhex("0801")


def test_negative_int32_is_ten_byte_varint():
    b = sm.StateResponse(statusCode=-1).SerializeToString()
    assert b == bytes.fromhex("08" + "ff" * 9 + "01")
    r = sm.StateResponse()
    r.ParseFromString(b)
    assert r.statusCode == -1


def test_int64_roundtrip_extremes():
    for v in (0, 1, -1, 2**62, -(2**62), 2**63 - 1, -(2**63)):
        m = sm.RegisterTimer(expiryTimestampMs=v)
        r = sm.RegisterTimer()
        r.ParseFromString(m.SerializeToString())
        assert r.expiryTimestampMs == v


def test_string_utf8_and_bytes():
    cmd = sm.StateCallCommand(stateName="naïve✓", schema="value double")
    r = sm.StateCallCommand()
    r.ParseFromString(cmd.SerializeToString())
    assert r.stateName == "naïve✓"
    assert r.schema == "value double"
    k = sm.SetImplicitKey(key=b"\x00\xff\x01binary")
    r2 = sm.SetImplicitKey()
    r2.ParseFromString(k.SerializeToString())
    assert r2.key == b"\x00\xff\x01binary"


def test_repeated_bytes_and_bool():
    resp = sm.StateResponseWithListGet(
        statusCode=0, value=[b"a", b"", b"bb"], requireNextFetch=True
    )
    r = sm.StateResponseWithListGet()
    r.ParseFromString(resp.SerializeToString())
    assert list(r.value) == [b"a", b"", b"bb"]
    assert r.requireNextFetch is True


def test_repeated_message_add_append_and_optional_presence():
    t = sm.StateResponseWithTimer(statusCode=0)
    t.timer.add(timestampMs=123)
    t.timer.append(sm.TimerInfo(key=b"k1", timestampMs=456))
    r = sm.StateResponseWithTimer()
    r.ParseFromString(t.SerializeToString())
    assert [x.timestampMs for x in r.timer] == [123, 456]
    # TimerInfo.key is proto3 `optional` (synthetic oneof): presence
    # must survive the wire, absence must read as the default
    assert not r.timer[0].HasField("key") and r.timer[0].key == b""
    assert r.timer[1].HasField("key") and r.timer[1].key == b"k1"


def test_oneof_last_set_wins():
    req = sm.StateRequest(
        statefulProcessorCall=sm.StatefulProcessorCall(
            setHandleState=sm.SetHandleState(state=sm.CLOSED)
        )
    )
    assert req.WhichOneof("method") == "statefulProcessorCall"
    req2 = sm.StatefulProcessorCall(getValueState=sm.StateCallCommand(stateName="v"))
    assert req2.WhichOneof("method") == "getValueState"
    # parsing a serialized oneof re-establishes the case
    r = sm.StatefulProcessorCall()
    r.ParseFromString(req2.SerializeToString())
    assert r.WhichOneof("method") == "getValueState"
    assert r.getValueState.stateName == "v"


def test_unknown_fields_skipped():
    # append an unknown field (number 1000, varint 7) — parser must skip it
    known = sm.StateResponse(statusCode=5).SerializeToString()
    unknown = bytes.fromhex("c03e07")  # tag (1000<<3)|0 = 8000 → varint c03e
    r = sm.StateResponse()
    r.ParseFromString(known + unknown)
    assert r.statusCode == 5


def test_enum_constants_module_and_wrapper():
    assert sm.PRE_INIT == 0
    assert sm.CREATED == 1
    assert sm.CLOSED == 5
    assert sm.HandleState.Name(2) == "INITIALIZED"
    assert sm.HandleState.Value("TIMER_PROCESSED") == 4


def test_copyfrom_and_clear():
    a = sm.StateCallCommand(stateName="x", schema="s")
    b = sm.StateCallCommand()
    b.CopyFrom(a)
    assert b.stateName == "x" and b.schema == "s"
    b.Clear()
    assert b.stateName == "" and b.SerializeToString() == b""


def test_unset_submessage_reads_as_default():
    req = sm.StateRequest()
    assert req.statefulProcessorCall.setHandleState.state == sm.PRE_INIT
    assert req.SerializeToString() == b""  # reading must not mark presence


def test_constructor_rejects_unknown_field():
    with pytest.raises((ValueError, TypeError)):
        sm.StateCallCommand(noSuchField=1)


@pytest.mark.skipif(MODE != "shim", reason="shim-only internals")
def test_packed_repeated_varint_parse():
    # The JVM may emit packed repeated primitives (proto3 default).
    # StateMessage has no repeated ints, so pin the decoder directly on a
    # synthetic descriptor: field 1, repeated int32, packed [3, 270, 86942]
    # (the encoding-spec example): 0A 06 03 8E 02 9E A7 05
    from google.protobuf import _runtime as rt

    desc = rt.Descriptor("T", "T", None)
    fd = rt.FieldDescriptor("xs", 1, rt.TYPE_INT32, rt.LABEL_REPEATED)
    fd.containing_type = desc
    desc.fields.append(fd)
    desc.fields_by_name["xs"] = fd
    desc.fields_by_number[1] = fd
    cls = rt.make_message_class(desc, __name__)
    m = cls()
    m.MergeFromString(bytes.fromhex("0a06038e029ea705"))
    assert list(m.xs) == [3, 270, 86942]


@pytest.mark.skipif(MODE != "shim", reason="shim-only internals")
def test_shim_is_path_scoped():
    import google.protobuf as gp

    assert gp.__file__.startswith(SHIM_DIR)
    assert "ranger-shim" in gp.__version__


# ---------------------------------------------------------------------------
# property-based round-trips (hypothesis)
# ---------------------------------------------------------------------------
try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    HAVE_HYP = True
except ImportError:  # pragma: no cover
    HAVE_HYP = False

if HAVE_HYP:
    int32s = st.integers(min_value=-(2**31), max_value=2**31 - 1)
    int64s = st.integers(min_value=-(2**63), max_value=2**63 - 1)
    blobs = st.binary(max_size=64)
    texts = st.text(max_size=32)

    @settings(max_examples=200, deadline=None)
    @given(code=int32s, msg=texts, vals=st.lists(blobs, max_size=8), more=st.booleans())
    def test_prop_list_get_roundtrip(code, msg, vals, more):
        m = sm.StateResponseWithListGet(
            statusCode=code, errorMessage=msg, value=vals, requireNextFetch=more
        )
        r = sm.StateResponseWithListGet()
        r.ParseFromString(m.SerializeToString())
        assert r.statusCode == code
        assert r.errorMessage == msg
        assert list(r.value) == vals
        assert r.requireNextFetch == more
        # serialization is canonical: re-serializing the parse is identical
        assert r.SerializeToString() == m.SerializeToString()

    @settings(max_examples=200, deadline=None)
    @given(
        timers=st.lists(
            st.tuples(st.one_of(st.none(), blobs), int64s), max_size=6
        )
    )
    def test_prop_timer_roundtrip(timers):
        m = sm.StateResponseWithTimer()
        for key, ts in timers:
            if key is None:
                m.timer.add(timestampMs=ts)
            else:
                m.timer.add(key=key, timestampMs=ts)
        r = sm.StateResponseWithTimer()
        r.ParseFromString(m.SerializeToString())
        got = [
            (t.key if t.HasField("key") else None, t.timestampMs)
            for t in r.timer
        ]
        assert got == timers


def test_lazy_submessage_mutation_adopts_into_parent():
    """The generated-code pattern `parent.sub.field = x` must lazily
    place the vivified submessage into the parent (pyspark's
    get_value_state sets TTLConfig exactly this way — r10 session-2
    found the shim dropping it silently, so TTL state never expired)."""
    cmd = sm.StateCallCommand()
    cmd.stateName = "agg"
    cmd.ttl.durationMs = 60000
    r = sm.StateCallCommand()
    r.ParseFromString(cmd.SerializeToString())
    assert r.HasField("ttl") and r.ttl.durationMs == 60000
    # two levels deep through a oneof
    req = sm.StateRequest()
    req.statefulProcessorCall.setHandleState.state = sm.CLOSED
    assert req.WhichOneof("method") == "statefulProcessorCall"
    rt = sm.StateRequest()
    rt.ParseFromString(req.SerializeToString())
    assert rt.statefulProcessorCall.setHandleState.state == sm.CLOSED
    # repeated add on a vivified child adopts too
    t = sm.StateResponseWithTimer()
    t.timer.add(timestampMs=5)
    assert t.SerializeToString() != b""


# ---------------------------------------------------------------------------
# r10 session-2 high-effort review regressions (lazy-child identity,
# link invalidation, adoption coverage, ranges, DecodeError contract,
# packed canonical encoding)
# ---------------------------------------------------------------------------
def test_lazy_child_reads_alias_one_instance():
    m = sm.MapStateCall()
    s1 = m.updateValue
    s2 = m.updateValue
    assert s1 is s2
    s1.userKey = b"KEY"
    s2.value = b"VAL"
    r = sm.MapStateCall()
    r.ParseFromString(m.SerializeToString())
    assert r.updateValue.userKey == b"KEY"
    assert r.updateValue.value == b"VAL"


def test_stale_lazy_child_cannot_clobber_after_clear_or_parse():
    m = sm.StateRequest()
    stale = m.statefulProcessorCall          # vivified, unadopted
    src = sm.StateRequest(
        stateVariableRequest=sm.StateVariableRequest(
            valueStateCall=sm.ValueStateCall(stateName="v")
        )
    )
    m.ParseFromString(src.SerializeToString())
    stale.setHandleState.state = sm.CREATED  # must NOT touch m anymore
    assert m.WhichOneof("method") == "stateVariableRequest"
    assert m.stateVariableRequest.valueStateCall.stateName == "v"


def test_repeated_merge_adopts_lazy_parent():
    call = sm.ListStateCall()
    put = sm.ListStatePut(value=[b"x"])
    call.listStatePut.MergeFromString(put.SerializeToString())
    assert call.WhichOneof("method") == "listStatePut"
    r = sm.ListStateCall()
    r.ParseFromString(call.SerializeToString())
    assert list(r.listStatePut.value) == [b"x"]
    # container add on a vivified child adopts too
    t = sm.StateResponseWithTimer()
    # (timer is a direct repeated field; the adoption path for a
    # repeated field inside a lazy child:)
    req = sm.StateRequest()
    req.statefulProcessorCall.getListState.stateName = "s"
    assert req.WhichOneof("method") == "statefulProcessorCall"


def test_copyfrom_establishes_presence_even_when_empty():
    m = sm.StateRequest()
    m.implicitGroupingKeyRequest.CopyFrom(sm.ImplicitGroupingKeyRequest())
    assert m.WhichOneof("method") == "implicitGroupingKeyRequest"
    assert m.SerializeToString() != b""


def test_int_range_validation():
    with pytest.raises(ValueError):
        sm.StateRequest(version=2**33)       # int32 field
    with pytest.raises(ValueError):
        sm.StateResponse(statusCode=2**31)   # one past int32 max
    q = sm.StateRequest()
    with pytest.raises(ValueError):
        q.version = -(2**31) - 1
    # boundaries are accepted and round-trip
    ok = sm.StateResponse(statusCode=-(2**31))
    r = sm.StateResponse()
    r.ParseFromString(ok.SerializeToString())
    assert r.statusCode == -(2**31)


def test_container_mutators_coerce_and_track():
    m = sm.StateResponseWithListGet(value=[b"a", b"b"])
    m.value[0] = b"A"
    m.value.insert(1, b"mid")
    m.value += [b"tail"]
    with pytest.raises(TypeError):
        m.value[0] = 123
    with pytest.raises(TypeError):
        m.value.insert(0, "not-bytes")
    r = sm.StateResponseWithListGet()
    r.ParseFromString(m.SerializeToString())
    assert list(r.value) == [b"A", b"mid", b"b", b"tail"]


def test_truncated_input_raises_decode_error():
    from google.protobuf.message import DecodeError

    with pytest.raises(DecodeError):
        sm.StateRequest().ParseFromString(b"\x08\xff")  # truncated varint
    with pytest.raises(DecodeError):
        # field 3 (value, bytes) claims 5 bytes but carries 1
        sm.StateResponse().ParseFromString(b"\x1a\x05x")


@pytest.mark.skipif(MODE != "shim", reason="shim-only internals")
def test_packed_primitives_serialize_canonically():
    # proto3 canonical: repeated primitives pack into one LD block —
    # pin against the encoding-spec example [3, 270, 86942] on a
    # synthetic repeated-int32 descriptor
    from google.protobuf import _runtime as rt

    desc = rt.Descriptor("P", "P", None)
    fd = rt.FieldDescriptor("xs", 4, rt.TYPE_INT32, rt.LABEL_REPEATED)
    fd.containing_type = desc
    desc.fields.append(fd)
    desc.fields_by_name["xs"] = fd
    desc.fields_by_number[4] = fd
    cls = rt.make_message_class(desc, __name__)
    m = cls()
    m.xs.extend([3, 270, 86942])
    assert m.SerializeToString() == bytes.fromhex("2206038e029ea705")
    r = cls()
    r.ParseFromString(m.SerializeToString())
    assert list(r.xs) == [3, 270, 86942]
