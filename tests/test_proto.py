"""Protobuf wire-format tests (core/proto.py vs ddsketch.proto schema)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from ddsketch_ruby_ray.core.ddsketch import DDSketch, LogCollapsingLowestDenseSketch
from ddsketch_ruby_ray.core.proto import deserialize_sketch, serialize_sketch


def _filled(alpha=0.01, values=None):
    sk = DDSketch(alpha)
    if values is None:
        values = np.concatenate(
            [np.random.default_rng(1).lognormal(0, 2, 500), -np.arange(1.0, 50.0), [0.0] * 7]
        )
    sk.add_batch(np.asarray(values, dtype=np.float64))
    return sk


class TestProtoRoundTrip:
    def test_bins_and_zero_count_survive(self):
        sk = _filled()
        rt = deserialize_sketch(serialize_sketch(sk))
        assert rt.mapping.gamma == sk.mapping.gamma
        assert rt.zero_count == sk.zero_count
        assert rt.store.to_state()["bin_offset"] + np.flatnonzero(
            rt.store.to_state()["bins"]
        ).min() == sk.store.to_state()["bin_offset"] + np.flatnonzero(
            sk.store.to_state()["bins"]
        ).min()
        # every nonzero bin identical
        def nz(st):
            s = st.to_state()
            bins = np.asarray(s["bins"])
            idx = np.flatnonzero(bins)
            return {int(s["bin_offset"] + i): float(bins[i]) for i in idx}

        assert nz(rt.store) == nz(sk.store)
        assert nz(rt.negative_store) == nz(sk.negative_store)

    def test_quantiles_preserved_within_alpha(self):
        sk = _filled()
        rt = deserialize_sketch(serialize_sketch(sk))
        for q in (0.01, 0.5, 0.99):
            a, b = sk.get_quantile_value(q), rt.get_quantile_value(q)
            assert a == pytest.approx(b, rel=1e-12)

    def test_count_reconstructed_exactly(self):
        sk = _filled()
        rt = deserialize_sketch(serialize_sketch(sk))
        assert rt.count == sk.count  # bin counts are exact; count = their sum

    def test_merge_after_deserialize(self):
        a, b = _filled(values=np.arange(1, 100.0)), _filled(values=np.arange(50, 200.0))
        rt_a = deserialize_sketch(serialize_sketch(a))
        merged = rt_a.merged_with(deserialize_sketch(serialize_sketch(b)))
        direct = a.merged_with(b)
        assert merged.count == direct.count
        assert merged.mapping.gamma == direct.mapping.gamma  # merge gate exact
        for q in (0.1, 0.9):
            # multiplier reconstructed from wire gamma differs by <= 1 ulp
            assert merged.get_quantile_value(q) == pytest.approx(
                direct.get_quantile_value(q), rel=1e-12
            )

    def test_collapsing_store_round_trip(self):
        sk = LogCollapsingLowestDenseSketch(0.01, 32)
        sk.add_batch(np.geomspace(1e-3, 1e6, 5000))
        rt = deserialize_sketch(serialize_sketch(sk), store="collapse_lowest", bin_limit=32)
        assert isinstance(rt, LogCollapsingLowestDenseSketch)
        assert rt.get_quantile_value(0.9) == pytest.approx(
            sk.get_quantile_value(0.9), rel=1e-12
        )

    def test_empty_sketch(self):
        rt = deserialize_sketch(serialize_sketch(DDSketch(0.02)))
        assert rt.count == 0
        assert rt.get_quantile_value(0.5) is None


class TestWireFormat:
    def test_field_layout_matches_proto_schema(self):
        """Hand-decode the outer message: field 1 = mapping (len-delim),
        field 2 = positive store, field 4 = zeroCount double."""
        sk = DDSketch(0.01)
        sk.add_batch(np.array([1.0, 2.0, 0.0]))
        data = serialize_sketch(sk)
        # first byte: tag field=1 wire=2 -> 0x0A
        assert data[0] == 0x0A
        ln = data[1]
        mapping_msg = data[2 : 2 + ln]
        assert mapping_msg[0] == 0x09  # field 1 (gamma), wire 1 (fixed64)
        gamma = struct.unpack_from("<d", mapping_msg, 1)[0]
        assert gamma == sk.mapping.gamma
        # zeroCount appears as field 4 wire 1 -> tag 0x21
        assert b"\x21" in data

    def test_sparse_encoding_accepted_and_summed(self):
        """Decoder accepts map<sint32,double> binCounts and sums it with the
        contiguous encoding, per ddsketch.proto:58-66."""
        from ddsketch_ruby_ray.core.proto import _len_delim, _tag, _varint, _zigzag

        # store msg: one map entry {key: 5 (zigzag), value: 2.0} plus
        # contiguous [3.0] at offset 5  -> key 5 total 5.0
        entry = _tag(1, 0) + _varint(_zigzag(5)) + _tag(2, 1) + struct.pack("<d", 2.0)
        store_msg = (
            _len_delim(1, entry)
            + _len_delim(2, struct.pack("<d", 3.0))
            + _tag(3, 0)
            + _varint(_zigzag(5))
        )
        mapping_msg = _tag(1, 1) + struct.pack("<d", DDSketch(0.01).mapping.gamma)
        data = _len_delim(1, mapping_msg) + _len_delim(2, store_msg)
        sk = deserialize_sketch(data)
        st = sk.store.to_state()
        bins = np.asarray(st["bins"])
        assert float(bins[5 - st["bin_offset"]]) == 5.0


# -- golden bytes vs the REAL google-protobuf encoder ------------------------
# The reference schema (/root/reference/lib/ddsketch/proto/ddsketch.proto) is
# rebuilt as a dynamic descriptor, so the hand-rolled codec is checked against
# an actual protobuf implementation's bytes - both directions, both store
# encodings.

def _golden_pool():
    from google.protobuf import descriptor_pb2, descriptor_pool, message_factory

    fdp = descriptor_pb2.FileDescriptorProto()
    fdp.name = "ddsketch_golden.proto"
    fdp.package = "golden"
    fdp.syntax = "proto3"

    store = fdp.message_type.add()
    store.name = "Store"
    entry = store.nested_type.add()
    entry.name = "BinCountsEntry"
    entry.options.map_entry = True
    kf = entry.field.add()
    kf.name, kf.number, kf.type, kf.label = "key", 1, kf.TYPE_SINT32, kf.LABEL_OPTIONAL
    vf = entry.field.add()
    vf.name, vf.number, vf.type, vf.label = "value", 2, vf.TYPE_DOUBLE, vf.LABEL_OPTIONAL
    f = store.field.add()
    f.name, f.number, f.type, f.label = "binCounts", 1, f.TYPE_MESSAGE, f.LABEL_REPEATED
    f.type_name = ".golden.Store.BinCountsEntry"
    f = store.field.add()
    f.name, f.number, f.type, f.label = "contiguousBinCounts", 2, f.TYPE_DOUBLE, f.LABEL_REPEATED
    f = store.field.add()
    f.name, f.number, f.type, f.label = (
        "contiguousBinIndexOffset", 3, f.TYPE_SINT32, f.LABEL_OPTIONAL,
    )

    im = fdp.message_type.add()
    im.name = "IndexMapping"
    en = im.enum_type.add()
    en.name = "Interpolation"
    for i, nm in enumerate(["NONE", "LINEAR", "QUADRATIC", "CUBIC"]):
        v = en.value.add()
        v.name, v.number = nm, i
    f = im.field.add()
    f.name, f.number, f.type, f.label = "gamma", 1, f.TYPE_DOUBLE, f.LABEL_OPTIONAL
    f = im.field.add()
    f.name, f.number, f.type, f.label = "indexOffset", 2, f.TYPE_DOUBLE, f.LABEL_OPTIONAL
    f = im.field.add()
    f.name, f.number, f.type, f.label = "interpolation", 3, f.TYPE_ENUM, f.LABEL_OPTIONAL
    f.type_name = ".golden.IndexMapping.Interpolation"

    dd = fdp.message_type.add()
    dd.name = "DDSketch"
    for nm, num, tn in [
        ("mapping", 1, ".golden.IndexMapping"),
        ("positiveValues", 2, ".golden.Store"),
        ("negativeValues", 3, ".golden.Store"),
    ]:
        f = dd.field.add()
        f.name, f.number, f.type, f.label, f.type_name = nm, num, f.TYPE_MESSAGE, f.LABEL_OPTIONAL, tn
    f = dd.field.add()
    f.name, f.number, f.type, f.label = "zeroCount", 4, f.TYPE_DOUBLE, f.LABEL_OPTIONAL

    pool = descriptor_pool.DescriptorPool()
    pool.Add(fdp)

    def cls(name):
        return message_factory.GetMessageClass(pool.FindMessageTypeByName(f"golden.{name}"))

    return cls("DDSketch")


class TestGoldenBytes:
    def _pb_of(self, sk):
        """Build the protobuf message carrying exactly what serialize_sketch writes."""
        DDM = _golden_pool()
        msg = DDM()
        msg.mapping.gamma = sk.mapping.gamma
        if sk.mapping.offset:
            msg.mapping.indexOffset = sk.mapping.offset
        interp = {None: 0, "linear": 1, "cubic": 3}[sk.mapping.interpolation]
        if interp:
            msg.mapping.interpolation = interp
        for store, field in ((sk.store, msg.positiveValues), (sk.negative_store, msg.negativeValues)):
            st = store.to_state()
            bins = list(map(float, st["bins"]))
            if bins:
                field.contiguousBinCounts.extend(bins)
                field.contiguousBinIndexOffset = int(st["bin_offset"])
        if sk.zero_count:
            msg.zeroCount = float(sk.zero_count)
        return msg

    @pytest.mark.parametrize("interp", [None, "linear", "cubic"])
    def test_serialize_bytes_match_google_protobuf(self, interp):
        from ddsketch_ruby_ray.core.mapping import mapping_from_tag

        sk = DDSketch(mapping=mapping_from_tag(interp, 0.01))
        sk.add_batch(np.array([1.0, 2.5, 100.0, -3.0, -0.5, 0.0, 7.0]))
        mine = serialize_sketch(sk)
        theirs = self._pb_of(sk).SerializeToString(deterministic=True)
        assert mine == theirs, (mine.hex(), theirs.hex())

    def test_serialize_bytes_match_empty_and_positive_only(self):
        sk = DDSketch(0.02)
        assert serialize_sketch(sk) == self._pb_of(sk).SerializeToString(deterministic=True)
        sk.add(42.0)
        assert serialize_sketch(sk) == self._pb_of(sk).SerializeToString(deterministic=True)

    def test_decode_google_protobuf_bytes(self):
        """Protobuf-produced bytes (incl. the SPARSE map encoding and both
        encodings summed) decode to the right bin multiset."""
        DDM = _golden_pool()
        msg = DDM()
        msg.mapping.gamma = 1.02020202020202
        msg.mapping.interpolation = 3  # CUBIC
        msg.positiveValues.binCounts[7] = 2.0
        msg.positiveValues.binCounts[-3] = 1.5
        msg.positiveValues.contiguousBinCounts.extend([4.0, 0.0, 1.0])
        msg.positiveValues.contiguousBinIndexOffset = 7
        msg.negativeValues.binCounts[2] = 3.0
        msg.zeroCount = 2.5
        sk = deserialize_sketch(msg.SerializeToString(deterministic=True))
        assert sk.mapping.interpolation == "cubic"
        assert sk.mapping.gamma == 1.02020202020202
        st = sk.store.to_state()
        bins = {st["bin_offset"] + i: c for i, c in enumerate(st["bins"]) if c}
        assert bins == {7: 6.0, -3: 1.5, 9: 1.0}  # sparse + contiguous summed at key 7
        nst = sk.negative_store.to_state()
        nbins = {nst["bin_offset"] + i: c for i, c in enumerate(nst["bins"]) if c}
        assert nbins == {2: 3.0}
        assert sk.zero_count == 2.5

    def test_quadratic_interpolation_rejected(self):
        DDM = _golden_pool()
        msg = DDM()
        msg.mapping.gamma = 1.02
        msg.mapping.interpolation = 2  # QUADRATIC: no reference implementation
        with pytest.raises(ValueError, match="QUADRATIC"):
            deserialize_sketch(msg.SerializeToString())

    @pytest.mark.parametrize("interp", [None, "linear", "cubic"])
    def test_protobuf_roundtrip_through_both_codecs(self, interp):
        """our bytes -> protobuf parse -> protobuf bytes -> our decode."""
        from ddsketch_ruby_ray.core.mapping import mapping_from_tag

        sk = DDSketch(mapping=mapping_from_tag(interp, 0.005))
        sk.add_batch(np.geomspace(0.1, 1e6, 200))
        DDM = _golden_pool()
        parsed = DDM.FromString(serialize_sketch(sk))
        back = deserialize_sketch(parsed.SerializeToString(deterministic=True))
        assert back.mapping == sk.mapping
        a, b = sk.store.to_state(), back.store.to_state()
        assert a["bin_offset"] == b["bin_offset"]
        assert np.array_equal(np.asarray(a["bins"]), np.asarray(b["bins"]))


class TestRubyCompatRead:
    """`compat="ddsketch-ruby"`: the reference gem serializes
    ``relative_accuracy`` into the proto ``gamma`` field
    (`/root/reference/lib/ddsketch/proto.rb:36`); reading those bytes as
    true gamma silently mis-scales every quantile."""

    def _ruby_bytes(self, sk):
        """Bytes exactly as the Ruby gem would emit for a sketch holding
        sk's bins: google-protobuf serializer, gamma field := alpha."""
        DDM = _golden_pool()
        msg = DDM()
        msg.mapping.gamma = sk.mapping.relative_accuracy  # the quirk
        if sk.mapping.offset:
            msg.mapping.indexOffset = sk.mapping.offset
        interp = {None: 0, "linear": 1, "cubic": 3}[sk.mapping.interpolation]
        if interp:
            msg.mapping.interpolation = interp
        for store, field in (
            (sk.store, msg.positiveValues),
            (sk.negative_store, msg.negativeValues),
        ):
            st = store.to_state()
            bins = list(map(float, st["bins"]))
            if bins:
                field.contiguousBinCounts.extend(bins)
                field.contiguousBinIndexOffset = int(st["bin_offset"])
        if sk.zero_count:
            msg.zeroCount = float(sk.zero_count)
        return msg.SerializeToString(deterministic=True)

    def test_ruby_quirk_bytes_round_trip_quantiles(self):
        # oracle: a sketch built directly from the README:96-113 topology
        # (our Sketch is conformance-pinned to the gem, so its bins are
        # what the gem would serialize)
        oracle = _filled(0.01, values=[1, 2, 3, 4, 5, 6, 7, 8, 9, 10, -3.1415, 0.0])
        back = deserialize_sketch(self._ruby_bytes(oracle), compat="ddsketch-ruby")
        assert back.mapping.gamma == pytest.approx(oracle.mapping.gamma, rel=0, abs=0)
        for q in (0.0, 0.25, 0.5, 0.75, 0.99, 1.0):
            assert back.get_quantile_value(q) == oracle.get_quantile_value(q)
        assert back.count == oracle.count

    @pytest.mark.parametrize("interp", [None, "linear", "cubic"])
    def test_all_mappings(self, interp):
        from ddsketch_ruby_ray.core.mapping import mapping_from_tag

        sk = DDSketch(mapping=mapping_from_tag(interp, 0.02))
        sk.add_batch(np.geomspace(0.5, 1e4, 64))
        back = deserialize_sketch(self._ruby_bytes(sk), compat="ddsketch-ruby")
        assert back.mapping == sk.mapping
        st_a, st_b = sk.store.to_state(), back.store.to_state()
        assert st_a["bin_offset"] == st_b["bin_offset"]
        assert np.array_equal(np.asarray(st_a["bins"]), np.asarray(st_b["bins"]))

    def test_without_compat_misreads(self):
        # the same bytes read WITHOUT the flag must NOT produce the oracle
        # mapping (this is exactly the silent mis-scale the flag prevents)
        sk = _filled(0.01, values=[1.0, 10.0, 100.0])
        data = self._ruby_bytes(sk)
        try:
            raw = deserialize_sketch(data)
        except ValueError:
            return  # gamma=0.01 < 1 may be rejected outright: also fine
        assert raw.mapping.gamma != sk.mapping.gamma

    def test_unknown_compat_rejected(self):
        with pytest.raises(ValueError, match="unknown compat"):
            deserialize_sketch(b"", compat="sketches-py")


class TestRubyCompatWrite:
    """`serialize_sketch(compat="ddsketch-ruby")`: the write-side mirror of
    the read compat — exported bytes must be what a consumer of
    reference-gem payloads expects (proto ``gamma`` field := alpha,
    `/root/reference/lib/ddsketch/proto.rb:34-44`)."""

    def test_bytes_match_gem_emission(self):
        # golden oracle: google-protobuf emission with the gem's quirk
        sk = _filled(0.01, values=[1, 2, 3, 4, 5, 6, 7, 8, 9, 10, -3.1415, 0.0])
        want = TestRubyCompatRead()._ruby_bytes(sk)
        assert serialize_sketch(sk, compat="ddsketch-ruby") == want

    @pytest.mark.parametrize("interp", [None, "linear", "cubic"])
    def test_quirk_round_trip_both_directions(self, interp):
        from ddsketch_ruby_ray.core.mapping import mapping_from_tag

        sk = DDSketch(mapping=mapping_from_tag(interp, 0.02))
        sk.add_batch(np.concatenate([np.geomspace(0.5, 1e4, 64), [-2.5, 0.0]]))
        # write-quirk -> read-quirk: identity
        back = deserialize_sketch(
            serialize_sketch(sk, compat="ddsketch-ruby"), compat="ddsketch-ruby"
        )
        assert back.mapping == sk.mapping
        for q in (0.0, 0.25, 0.5, 0.75, 0.99, 1.0):
            assert back.get_quantile_value(q) == sk.get_quantile_value(q)
        # write-quirk read WITHOUT the flag must NOT reproduce the mapping
        try:
            raw = deserialize_sketch(serialize_sketch(sk, compat="ddsketch-ruby"))
        except ValueError:
            return  # alpha<1 read as gamma may be rejected outright: also fine
        assert raw.mapping.gamma != sk.mapping.gamma

    def test_unknown_compat_rejected(self):
        with pytest.raises(ValueError, match="unknown compat"):
            serialize_sketch(_filled(), compat="sketches-py")
