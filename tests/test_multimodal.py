"""Multimodal plumbing tests: binary columns + Arrow-batched decode."""

from __future__ import annotations

from durable_functions_cosmosdb_etl_spark.operators import multimodal as mm
from durable_functions_cosmosdb_etl_spark.sources.tables import load_table


def test_attach_binary_roundtrip(spark):
    df = spark.createDataFrame([(1, "héllo")], "doc_id long, text string")
    row = mm.attach_binary(df, "doc_id", "text").first()
    assert bytes(row.content).decode("utf-8") == "héllo"
    assert row.n_bytes == len("héllo".encode())
    assert row.mime == "application/octet-stream"


def test_decode_batch_schema_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = mm.attach_binary(docs, "doc_id", "text")
    out1 = {r.doc_id: r for r in mm.decode_image_batch(media).collect()}
    out2 = {r.doc_id: r for r in mm.decode_image_batch(media).collect()}
    assert len(out1) == 50
    for doc_id, r in out1.items():
        assert r.n_channels == 3
        assert len(r.feature) == 8
        assert all(0.0 <= f <= 1.0 for f in r.feature)
        # deterministic fake: re-run bit-identical
        assert out2[doc_id].feature == r.feature
        assert (out2[doc_id].width, out2[doc_id].height) == (r.width, r.height)
