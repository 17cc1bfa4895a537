"""Multimodal columns: opaque binary payloads + typed metadata.

North-star addition. Images/audio/video are carried as ``binary``
columns with a typed metadata struct; decode/feature steps are
Arrow-batched ``mapInPandas`` stages so bytes stream executor-side in
columnar batches (the driver never materializes payloads).

The actual codec work (PIL/ffmpeg/torchaudio) is NOT available in this
container, so ``decode_image_batch`` ships a clearly-marked
deterministic fake behind the same signature/schema — the Spark-side
contract (schema, batch shape, partitioning) is real and tested; swap
``_fake_decode`` for a real decoder in production.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)

DECODED_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("n_channels", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_binary(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Wrap a text column as a binary media payload + metadata.

    Stand-in for reading real blobs (production:
    ``spark.read.format("binaryFile")`` or pointers into object
    storage). Metadata travels with the payload so filters on
    mime/n_bytes prune before any decode runs.
    """
    content = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).alias("doc_id"),
        content.alias("content"),
        F.lit("application/octet-stream").alias("mime"),
        F.octet_length(content).cast("long").alias("n_bytes"),
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Deterministic stand-in for an image decoder (see module note)."""
    if payload is None:
        raise NotImplementedError(
            "real decode requires an image codec (PIL/libvips) — not "
            "available in this environment"
        )
    n = len(payload)
    width = 16 + (n % 64)
    height = 16 + ((n // 64) % 64)
    checksum = sum(payload[:64]) if n else 0
    feature = [float((checksum + i * 31) % 256) / 255.0 for i in range(8)]
    return width, height, 3, feature


def _pil_decode(payload: bytes) -> tuple[int, int, int, list[float]]:
    """Real image decode via Pillow (optional dependency): true
    dimensions + band count, and a deterministic 8-bin grayscale
    histogram as the feature vector — same signature/schema as
    ``_fake_decode``, so the two are drop-in interchangeable."""
    import io

    from PIL import Image

    img = Image.open(io.BytesIO(payload))
    img.load()
    w, h = img.size
    bands = len(img.getbands())
    hist = img.convert("L").histogram()  # 256 luminance bins
    tot = float(sum(hist)) or 1.0
    feature = [
        float(sum(hist[i * 32 : (i + 1) * 32]) / tot) for i in range(8)
    ]
    return w, h, bands, feature


def get_decoder(decoder="fake"):
    """Resolve the per-payload decode function.

    ``"fake"`` — the deterministic stub (default; what the oracle-backed
    queries pin, since no codec ships in this environment).
    ``"pil"`` — Pillow-backed real decode; ImportError if absent.
    ``"auto"`` — Pillow when importable, else the stub.
    A callable passes through (bring-your-own codec — libvips, ffmpeg
    keyframe grab, …), keeping the Spark-side plumbing identical.

    Resolution happens ON THE DRIVER so a missing library fails fast at
    plan time, not per-task; on a real cluster the chosen library must
    of course exist on the executors too.
    """
    if callable(decoder):
        return decoder
    if decoder == "fake":
        return _fake_decode
    if decoder == "pil":
        import PIL  # noqa: F401  (fail fast with the real ImportError)

        return _pil_decode
    if decoder == "auto":
        try:
            import PIL  # noqa: F401

            return _pil_decode
        except ImportError:
            return _fake_decode
    raise ValueError(f"unknown decoder: {decoder!r}")


def decode_image_batch(
    df: DataFrame, decoder="fake", passthrough: tuple[str, ...] = ()
) -> DataFrame:
    """binary media → (dims, feature vector) via Arrow-batched mapInPandas.

    Batch shape: each pandas chunk holds whole payloads; decode is
    per-row CPU work that scales with partition count, no shuffle.
    ``decoder`` selects the codec (see :func:`get_decoder`); the
    registered oracle query keeps the deterministic default, production
    passes ``"pil"``/``"auto"`` or its own callable.

    ``passthrough`` (r13 optimization): names of input columns carried
    verbatim through the decode, appended after the decoded fields.
    A caller that needs payload metadata (mime, n_bytes, …) NEXT TO the
    decoded dims previously had to join the decode output back to the
    media table on doc_id — a full-corpus exchange of both sides purely
    to re-attach columns this very scan had in hand (the same
    re-attach anti-pattern assign_to_centroids documents). Carrying
    them through the Arrow batch costs a few bytes per row and removes
    that join entirely (multimodal_meta: 2 scans + SMJ → 1 scan,
    exchange count 2 → 0).
    """
    decode = get_decoder(decoder)
    extra = list(passthrough)
    # Plan-build-time validation (ADVICE r13): a passthrough name that
    # collides with the decoded outputs or with the payload column would
    # produce duplicate/ambiguous columns — or silently re-carry the
    # full binary through the Arrow batch.
    reserved = {f.name for f in DECODED_SCHEMA.fields} | {"content"}
    bad = sorted(set(extra) & reserved)
    if bad:
        raise ValueError(
            f"passthrough columns collide with decode outputs: {bad}"
        )
    out_cols = ["doc_id", "width", "height", "n_channels", "feature"] + extra
    schema = T.StructType(
        DECODED_SCHEMA.fields + [df.schema[c] for c in extra]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, content, *rest in zip(
                pdf["doc_id"], pdf["content"], *[pdf[c] for c in extra]
            ):
                if content is None:
                    # Undecodable (missing payload): null dims/feature,
                    # row kept so media audits see the gap.
                    rows.append((doc_id, None, None, None, None, *rest))
                    continue
                w, h, c, feat = decode(bytes(content))
                rows.append((doc_id, w, h, c, feat, *rest))
            yield pd.DataFrame(rows, columns=out_cols)

    return df.select("doc_id", "content", *extra).mapInPandas(
        run, schema=schema
    )


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("frame_idx", T.IntegerType()),
        T.StructField("frame_ts_ms", T.LongType()),
    ]
)


def resize_batch(df: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize stage: clamps decoded dims to ``max_side`` preserving
    aspect ratio (integer arithmetic stand-in for the pixel resample —
    see module note). Chains after ``decode_image_batch`` as a second
    mapInPandas stage: same partitioning, no shuffle between stages.

    Schema-preserving (r13): any extra columns the decode stage carried
    (``passthrough``) ride through unchanged — the output schema is the
    input schema, so the stage composes with a passthrough-decoding
    chain without re-joining metadata afterwards.
    """
    cols = [f.name for f in df.schema.fields]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            # Undecodable rows (decode_image_batch keeps them with null
            # dims) ride through unchanged — ADVICE r13: .astype on a
            # NaN dim previously crashed the documented decode→resize
            # composition on any null payload.
            ok = pdf["width"].notna() & pdf["height"].notna()
            if ok.any():
                w = pdf.loc[ok, "width"].astype("int64")
                h = pdf.loc[ok, "height"].astype("int64")
                side = w.combine(h, max)
                scale_num = side.clip(upper=max_side)
                out.loc[ok, "width"] = (
                    (w * scale_num // side).clip(lower=1).astype("int32")
                )
                out.loc[ok, "height"] = (
                    (h * scale_num // side).clip(lower=1).astype("int32")
                )
            yield out[cols]

    return df.mapInPandas(run, schema=df.schema)


def frame_sample_batch(
    df: DataFrame, fps_ms: int = 1000, max_frames: int = 4
) -> DataFrame:
    """Frame-sampling stage for video-like payloads: emits up to
    ``max_frames`` (frame_idx, timestamp) rows per media row, sampled
    every ``fps_ms`` ms of a synthetic duration derived from payload
    size (a real build reads the container's duration metadata — the
    1→N row expansion, schema, and batching are the tested contract).
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, n_bytes in zip(pdf["doc_id"], pdf["n_bytes"]):
                duration_ms = int(n_bytes) * 10
                n = min(max_frames, max(1, duration_ms // fps_ms))
                rows.extend((doc_id, i, i * fps_ms) for i in range(n))
            yield pd.DataFrame(
                rows, columns=["doc_id", "frame_idx", "frame_ts_ms"]
            )

    return df.select("doc_id", "n_bytes").mapInPandas(run, schema=FRAME_SCHEMA)
