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


def test_resize_clamps_and_preserves_aspect(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = mm.attach_binary(docs, "doc_id", "text")
    decoded = mm.decode_image_batch(media)
    before = {r.doc_id: r for r in decoded.collect()}
    after = {r.doc_id: r for r in mm.resize_batch(decoded, max_side=32).collect()}
    assert set(after) == set(before)
    for doc_id, r in after.items():
        b = before[doc_id]
        assert max(r.width, r.height) <= 32 and min(r.width, r.height) >= 1
        if max(b.width, b.height) <= 32:  # small images pass through
            assert (r.width, r.height) == (b.width, b.height)
        # aspect ordering preserved
        assert (b.width >= b.height) == (r.width >= r.height)
        assert r.feature == b.feature  # resize doesn't touch features


def test_decode_passthrough_carries_metadata(spark, sf_dir):
    """passthrough columns ride the decode+resize chain verbatim and in
    the declared order — the join-free shape multimodal_meta relies on
    (r13: replaces a full-corpus doc_id re-attach join)."""
    docs = load_table(spark, sf_dir, "documents").limit(50)
    media = mm.attach_binary(docs, "doc_id", "text")
    meta = {r.doc_id: (r.mime, r.n_bytes) for r in media.collect()}
    decoded = mm.decode_image_batch(media, passthrough=("mime", "n_bytes"))
    assert decoded.columns == [
        "doc_id", "width", "height", "n_channels", "feature",
        "mime", "n_bytes",
    ]
    plain = {r.doc_id: r for r in mm.decode_image_batch(media).collect()}
    out = {r.doc_id: r for r in decoded.collect()}
    assert set(out) == set(meta)
    for doc_id, r in out.items():
        assert (r.mime, r.n_bytes) == meta[doc_id]
        p = plain[doc_id]  # decoded fields unchanged by the passthrough
        assert (r.width, r.height, r.n_channels, r.feature) == (
            p.width, p.height, p.n_channels, p.feature,
        )
    resized = {
        r.doc_id: r
        for r in mm.resize_batch(decoded, max_side=32).collect()
    }
    for doc_id, r in resized.items():
        assert (r.mime, r.n_bytes) == meta[doc_id]
        assert max(r.width, r.height) <= 32


def test_frame_sample_expands_rows(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents").limit(20)
    media = mm.attach_binary(docs, "doc_id", "text")
    frames = mm.frame_sample_batch(media, fps_ms=1000, max_frames=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {r.doc_id for r in media.select("doc_id").collect()}
    for doc_id, rows in by_doc.items():
        idxs = sorted(r.frame_idx for r in rows)
        assert idxs == list(range(len(idxs)))  # dense 0..n-1
        assert 1 <= len(rows) <= 4
        for r in rows:
            assert r.frame_ts_ms == r.frame_idx * 1000


def _has_pil():
    try:
        import PIL  # noqa: F401

        return True
    except ImportError:
        return False


def test_decoder_seam_resolution():
    """The codec seam: 'fake' pins the stub, 'pil' fails fast when
    Pillow is absent, 'auto' falls back to the stub, callables pass
    through."""
    import pytest as _pytest

    from durable_functions_cosmosdb_etl_spark.operators.multimodal import (
        _fake_decode,
        get_decoder,
    )

    assert get_decoder("fake") is _fake_decode
    own = lambda b: (1, 1, 1, [0.0])  # noqa: E731
    assert get_decoder(own) is own
    with _pytest.raises(ValueError):
        get_decoder("nope")
    if not _has_pil():
        assert get_decoder("auto") is _fake_decode
        with _pytest.raises(ImportError):
            get_decoder("pil")


def test_decode_real_png_with_pil(spark):
    """With Pillow present, the same mapInPandas plumbing decodes real
    image bytes: true dims/bands + histogram feature."""
    import pytest as _pytest

    if not _has_pil():
        _pytest.skip("pillow not installed in this environment")
    import io

    from PIL import Image

    from durable_functions_cosmosdb_etl_spark.operators.multimodal import (
        decode_image_batch,
    )

    buf = io.BytesIO()
    Image.new("RGB", (20, 10), (255, 0, 0)).save(buf, format="PNG")
    df = spark.createDataFrame(
        [(1, bytearray(buf.getvalue()), "image/png", len(buf.getvalue()))],
        "doc_id long, content binary, mime string, n_bytes long",
    )
    row = decode_image_batch(df, decoder="pil").collect()[0]
    assert (row["width"], row["height"], row["n_channels"]) == (20, 10, 3)
    assert len(row["feature"]) == 8
    assert abs(sum(row["feature"]) - 1.0) < 1e-6


def test_passthrough_collision_raises(spark):
    """r14 (ADVICE r13): a passthrough name colliding with the decoded
    output columns (or the payload column) fails at plan-build time
    instead of producing duplicate/ambiguous columns — or silently
    re-carrying the binary payload through the Arrow batch."""
    import pytest as _pytest

    df = spark.createDataFrame(
        [(1, bytearray(b"x"), "m", 1)],
        "doc_id long, content binary, mime string, n_bytes long",
    )
    for bad in ("content", "width", "doc_id", "feature"):
        with _pytest.raises(ValueError, match="collide"):
            mm.decode_image_batch(df, passthrough=(bad,))


def test_resize_passes_null_dims_through(spark):
    """r14 (ADVICE r13): undecodable rows (null payload → null dims from
    decode_image_batch) ride through resize_batch unchanged instead of
    crashing the astype — the documented decode→resize composition now
    holds on corpora with missing payloads."""
    df = spark.createDataFrame(
        [
            (1, bytearray(b"some payload bytes"), "m", 18),
            (2, None, "m", None),
        ],
        "doc_id long, content binary, mime string, n_bytes long",
    )
    decoded = mm.decode_image_batch(df, passthrough=("mime",))
    out = {r.doc_id: r for r in mm.resize_batch(decoded, max_side=32).collect()}
    assert out[2].width is None and out[2].height is None
    assert out[2].mime == "m"  # passthrough survives the null path
    assert out[1].width is not None and max(out[1].width, out[1].height) <= 32
