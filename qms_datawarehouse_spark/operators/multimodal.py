"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata.

The Spark-side machinery — schema, partition-preserving batch
iteration, Arrow-batched UDF signatures — is real and tested. The
actual codec step (image decode, audio resample, frame sampling) is
stubbed behind ``DECODERS`` with a deterministic fake, because codec
libraries are not in this image; swapping in PIL/librosa/PyAV changes
ONE function, not the pipeline.

Pattern: ``mapInPandas`` over a DataFrame with a ``content: binary``
column. Each Arrow batch stays columnar into pandas; per-batch
processing amortizes Python overhead; the output schema is declared
up front so downstream plans stay fully typed.

At 100 TB: binary payloads dominate row size — keep
``spark.sql.files.maxPartitionBytes`` small enough that a partition of
blobs fits executor memory, and push metadata-only predicates (format,
size bounds) BEFORE the decode stage so pruning happens on the cheap
columns.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from qms_datawarehouse_spark.plans.registry import query, tables

FEATURE_SCHEMA = (
    "doc_id long, format string, n_bytes long, checksum string, "
    "width long, height long"
)


def fake_decode(content: bytes) -> tuple[int, int]:
    """STUB decode: deterministic fake dimensions derived from the
    payload. Replace with a real codec (PIL.Image.open etc.) when the
    library is available — the surrounding pipeline is unchanged."""
    if not content:
        return (0, 0)
    return (64 + content[0] % 64, 64 + content[-1] % 64)


def pil_decode(content: bytes) -> tuple[int, int]:
    """REAL image decode via Pillow — same signature as the stub, so
    it slots straight into ``extract_features_with``. Importable only
    when the codec library exists in the image; exercised by
    tests/test_multimodal.py::test_real_decode_when_pillow_present,
    which auto-skips otherwise."""
    import io

    from PIL import Image

    with Image.open(io.BytesIO(content)) as im:
        return (im.width, im.height)


def extract_features_with(decode):
    """Feature-extraction kernel with a pluggable decode step — the
    seam a real codec (``pil_decode``) drops into. Everything
    Spark-side (Arrow batching, output schema, pre-decode metadata
    pruning, partitioning) is identical for stub and real decode."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib

        for pdf in batches:
            dims = pdf["content"].map(decode)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "format": pdf["format"],
                    "n_bytes": pdf["content"].map(len),
                    "checksum": pdf["content"].map(
                        lambda b: hashlib.md5(b).hexdigest()
                    ),
                    "width": dims.map(lambda d: d[0]),
                    "height": dims.map(lambda d: d[1]),
                }
            )

    return gen


# the oracle-checked default: deterministic stub arithmetic
extract_features = extract_features_with(fake_decode)


def with_binary_content(documents: DataFrame) -> DataFrame:
    """Model the corpus as multimodal rows: text bytes stand in for an
    opaque media payload + typed metadata columns."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("fake/blob").alias("format"),
    )


# The stub decode is deterministic arithmetic over the payload bytes,
# so the whole feature row — not just counts — is SQL-expressible:
# n_bytes = octet_length of the UTF-8 encoding, checksum = md5 of the
# same bytes, width/height = 64 + (first/last byte % 64) recovered by
# parsing the hex dump. A real codec would drop width/height back to a
# rows-only check; everything else stays verifiable.
_FEATURES_SQL = """
    WITH b AS (
        SELECT doc_id,
               'fake/blob' AS format,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS checksum,
               hex(encode(text)) AS h
        FROM documents
        WHERE octet_length(encode(text)) > 0
    )
    SELECT doc_id, format, n_bytes, checksum,
           64 + CAST('0x' || substr(h, 1, 2) AS BIGINT) % 64 AS width,
           64 + CAST('0x' || right(h, 2) AS BIGINT) % 64 AS height
    FROM b
"""


@query("multimodal_features", _FEATURES_SQL)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via mapInPandas: metadata
    filter (pushed before decode) → Arrow-batched stub decode →
    typed feature rows."""
    (documents,) = tables(spark, sf_dir, "documents")
    blobs = with_binary_content(documents)
    # metadata-only predicate BEFORE the decode stage
    blobs = blobs.filter(F.length("content") > 0)
    return blobs.mapInPandas(extract_features, schema=FEATURE_SCHEMA)


# --------------------------------------------------------------------
# Modality-typed pipeline: image resize / audio features / video
# frame sampling, dispatched per modality over one binary column
# --------------------------------------------------------------------

MEDIA_SCHEMA = (
    "doc_id long, modality string, content binary, "
    "meta struct<mime: string, n_bytes: long, duration_ms: long>"
)

IMAGE_OUT = "doc_id long, width long, height long, resized_bytes long"
AUDIO_OUT = "doc_id long, duration_ms long, rms long, n_frames long"
VIDEO_OUT = "doc_id long, frame_idx long, frame_checksum string"

TARGET_SIZE = 32  # stub resize target (px)
FRAME_EVERY_MS = 1000  # sample one frame per second


def as_media(documents: DataFrame) -> DataFrame:
    """Model the corpus as a multimodal table: opaque binary payload +
    a typed metadata struct, modality assigned deterministically. At
    scale this is the storage layout — metadata in queryable columns,
    payload as one opaque binary, table partitioned by modality so a
    per-modality pipeline prunes partitions."""
    mod = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return documents.select(
        "doc_id",
        mod.alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.concat(F.lit("fake/"), mod).alias("mime"),
            F.length(F.encode(F.col("text"), "UTF-8")).cast("long").alias("n_bytes"),
            (F.col("n_chars") * 10).cast("long").alias("duration_ms"),
        ).alias("meta"),
    )


def resize_images(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB image decode+resize (PIL would slot in here): deterministic
    fake dims from the payload, 'resized' byte count scaled to the
    TARGET_SIZE box. Arrow-batched; one output row per image."""
    for pdf in batches:
        dims = pdf["content"].map(fake_decode)
        w = dims.map(lambda d: d[0])
        h = dims.map(lambda d: d[1])
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "width": w,
                "height": h,
                "resized_bytes": (
                    pdf["content"].map(len) * (TARGET_SIZE * TARGET_SIZE) // (w * h)
                ),
            }
        )


def audio_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB audio feature extraction (librosa would slot in here):
    RMS-ish energy from payload bytes + frame count from metadata
    duration. One output row per clip."""
    for pdf in batches:
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "duration_ms": pdf["meta"].map(lambda m: m["duration_ms"]),
                "rms": pdf["content"].map(
                    lambda b: int(sum(b[:256]) / max(len(b[:256]), 1))
                ),
                "n_frames": pdf["meta"].map(
                    lambda m: m["duration_ms"] // FRAME_EVERY_MS
                ),
            }
        )


def sample_frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """STUB video frame sampling (PyAV would slot in here): emits one
    row per sampled frame (1 fps against metadata duration) — a
    row-EXPANDING mapInPandas stage, the shape real frame extraction
    needs. Frame checksum stands in for decoded frame bytes."""
    import hashlib

    for pdf in batches:
        out_ids, out_idx, out_sum = [], [], []
        for doc_id, content, meta in zip(
            pdf["doc_id"], pdf["content"], pdf["meta"]
        ):
            n = int(min(meta["duration_ms"] // FRAME_EVERY_MS, 10))
            for i in range(n):
                out_ids.append(doc_id)
                out_idx.append(i)
                out_sum.append(
                    hashlib.md5(content + i.to_bytes(4, "little")).hexdigest()
                )
        yield pd.DataFrame(
            {"doc_id": out_ids, "frame_idx": out_idx, "frame_checksum": out_sum}
        )


# Every stub stage is deterministic arithmetic over the payload bytes
# and metadata, so the per-modality summaries are fully SQL-checkable:
# image payload = Σ n_bytes·32² // (w·h) (dims from first/last byte),
# audio payload = Σ duration_ms // 1000, video = expanded frame rows
# capped at 10/doc. A real codec keeps the same plan shape but drops
# the decode-derived columns back to rows-only.
_PIPELINE_SQL = """
    WITH m AS (
        SELECT doc_id,
               ['image', 'audio', 'video'][CAST(doc_id % 3 + 1 AS INT)]
                   AS modality,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               hex(encode(text)) AS h,
               CAST(n_chars * 10 AS BIGINT) AS duration_ms
        FROM documents
    ),
    d AS (
        SELECT doc_id, modality, n_bytes, duration_ms,
               64 + CAST('0x' || substr(h, 1, 2) AS BIGINT) % 64 AS w,
               64 + CAST('0x' || right(h, 2) AS BIGINT) % 64 AS hgt
        FROM m
    )
    SELECT 'image' AS modality, count(*) AS n_items,
           CAST(sum(n_bytes * 1024 // (w * hgt)) AS BIGINT) AS payload
    FROM d WHERE modality = 'image'
    UNION ALL
    SELECT 'audio', count(*),
           CAST(sum(duration_ms // 1000) AS BIGINT)
    FROM d WHERE modality = 'audio'
    UNION ALL
    SELECT 'video',
           count(DISTINCT CASE WHEN least(duration_ms // 1000, 10) > 0
                               THEN doc_id END),
           CAST(sum(least(duration_ms // 1000, 10)) AS BIGINT)
    FROM d WHERE modality = 'video'
"""


@query("multimodal_pipeline", _PIPELINE_SQL)
def multimodal_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-modality processing over one multimodal table: partition
    prune by modality, run the modality's Arrow-batched stage, union
    the typed summaries. Decode steps are deterministic stubs; the
    Spark plumbing (modality dispatch, metadata pushdown, expanding
    frame sampler) is real."""
    (documents,) = tables(spark, sf_dir, "documents")
    media = as_media(documents)

    images = (
        media.filter(F.col("modality") == "image")
        .mapInPandas(resize_images, schema=IMAGE_OUT)
        .agg(
            F.count("*").alias("n_items"),
            F.sum("resized_bytes").alias("payload"),
        )
        .select(F.lit("image").alias("modality"), "n_items", "payload")
    )
    audio = (
        media.filter(F.col("modality") == "audio")
        .mapInPandas(audio_features, schema=AUDIO_OUT)
        .agg(F.count("*").alias("n_items"), F.sum("n_frames").alias("payload"))
        .select(F.lit("audio").alias("modality"), "n_items", "payload")
    )
    video = (
        media.filter(F.col("modality") == "video")
        .mapInPandas(sample_frames, schema=VIDEO_OUT)
        .agg(
            F.countDistinct("doc_id").alias("n_items"),
            F.count("*").alias("payload"),
        )
        .select(F.lit("video").alias("modality"), "n_items", "payload")
    )
    return images.unionByName(audio).unionByName(video)


def extract_features_arrow(batches):
    """The same feature extraction at the RecordBatch level
    (``mapInArrow``): no pandas materialization, no Series boxing —
    the lowest-overhead Python hook Spark offers. Bytes come straight
    out of Arrow buffers; arrays go straight back."""
    import hashlib

    import pyarrow as pa

    for batch in batches:
        content = batch.column(
            batch.schema.get_field_index("content")
        ).to_pylist()
        dims = [fake_decode(b) for b in content]
        yield pa.RecordBatch.from_arrays(
            [
                batch.column(batch.schema.get_field_index("doc_id")),
                batch.column(batch.schema.get_field_index("format")),
                pa.array([len(b) for b in content], type=pa.int64()),
                pa.array([hashlib.md5(b).hexdigest() for b in content]),
                pa.array([d[0] for d in dims], type=pa.int64()),
                pa.array([d[1] for d in dims], type=pa.int64()),
            ],
            names=["doc_id", "format", "n_bytes", "checksum", "width",
                   "height"],
        )


@query("multimodal_features_arrow", _FEATURES_SQL)
def multimodal_features_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``multimodal_features`` on the ``mapInArrow`` surface — same
    oracle, so both Python batch APIs are value-checked to agree.
    Prefer this form when the decode library consumes raw buffers
    (image codecs, audio resamplers): it skips the pandas round-trip
    entirely."""
    (documents,) = tables(spark, sf_dir, "documents")
    blobs = with_binary_content(documents).filter(F.length("content") > 0)
    return blobs.mapInArrow(extract_features_arrow, schema=FEATURE_SCHEMA)
