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
