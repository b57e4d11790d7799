"""Format parity: CSV / JSONL ingestion matches the parquet ground truth."""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.csv as pacsv
import pyarrow.parquet as pq
import pytest

from ddsketch_ruby_ray.sources import read_table

SF_DIR = "/root/testdata/sf0.001"


def _parquet_table(name, columns):
    return pq.read_table(f"{SF_DIR}/{name}.parquet", columns=columns)


def _sorted_pandas(df, keys):
    return df.sort_values(keys).reset_index(drop=True)


@pytest.fixture(scope="module")
def export_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("exports")
    docs = _parquet_table("documents", ["doc_id", "lang", "n_chars"])
    pacsv.write_csv(docs, os.path.join(d, "documents.csv"))
    events = _parquet_table("events", ["event_id", "ts", "user_id", "value"])
    # JSONL with ISO timestamps — the wire shape of an event hose
    df = events.to_pandas()
    df["ts"] = df["ts"].dt.strftime("%Y-%m-%dT%H:%M:%S.%f")
    df.to_json(os.path.join(d, "events.jsonl"), orient="records", lines=True)
    pacsv.write_csv(events, os.path.join(d, "events.csv"))
    return str(d)


class TestReadTable:
    def test_csv_matches_parquet(self, ray_session, export_dir):
        schema = pa.schema(
            [("doc_id", pa.int64()), ("lang", pa.string()), ("n_chars", pa.int64())]
        )
        got = read_table(f"{export_dir}/documents.csv", schema=schema).to_pandas()
        want = _parquet_table("documents", ["doc_id", "lang", "n_chars"]).to_pandas()
        assert _sorted_pandas(got, ["doc_id"]).equals(_sorted_pandas(want, ["doc_id"]))

    def test_jsonl_timestamps_coerced(self, ray_session, export_dir):
        schema = pa.schema(
            [
                ("event_id", pa.int64()),
                ("ts", pa.timestamp("us")),
                ("user_id", pa.int64()),
                ("value", pa.float64()),
            ]
        )
        got = read_table(f"{export_dir}/events.jsonl", schema=schema)
        assert got.schema().base_schema == schema
        want = _parquet_table(
            "events", ["event_id", "ts", "user_id", "value"]
        ).to_pandas()
        assert _sorted_pandas(got.to_pandas(), ["event_id"]).equals(
            _sorted_pandas(want, ["event_id"])
        )

    def test_column_pruning_and_format_inference(self, ray_session, export_dir):
        schema = pa.schema([("event_id", pa.int64()), ("user_id", pa.int64())])
        got = read_table(
            f"{export_dir}/events.csv", columns=["event_id", "user_id"], schema=schema
        ).to_pandas()
        assert list(got.columns) == ["event_id", "user_id"]
        want = _parquet_table("events", ["event_id", "user_id"]).to_pandas()
        assert _sorted_pandas(got, ["event_id"]).equals(
            _sorted_pandas(want, ["event_id"])
        )

    def test_parquet_passthrough_same_pipeline_result(self, ray_session, export_dir):
        # the SAME aggregate over csv and parquet inputs agrees bit-exactly
        import ray.data as rd  # noqa: F401

        from ddsketch_ruby_ray.functions import DDSketchAgg
        from ddsketch_ruby_ray.stages import unnest

        schema = pa.schema(
            [("doc_id", pa.int64()), ("lang", pa.string()), ("n_chars", pa.int64())]
        )
        a = read_table(f"{export_dir}/documents.csv", schema=schema)
        b = read_table(f"{SF_DIR}/documents.parquet", columns=["doc_id", "lang", "n_chars"])

        def agg(ds):
            out = ds.groupby("lang").aggregate(
                DDSketchAgg(on="n_chars", relative_accuracy=0.01, quantiles=(0.5, 0.99), name="s")
            )
            return (
                unnest(out, columns=["s"])
                .to_pandas()
                .sort_values("lang")
                .reset_index(drop=True)
            )

        assert agg(a).equals(agg(b))

    def test_unknown_extension_raises(self, ray_session):
        with pytest.raises(ValueError, match="cannot infer"):
            read_table("/tmp/nope.xyz")
