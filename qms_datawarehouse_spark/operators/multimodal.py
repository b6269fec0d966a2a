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


def extract_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary content."""
    import hashlib

    for pdf in batches:
        dims = pdf["content"].map(fake_decode)
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


def with_binary_content(documents: DataFrame) -> DataFrame:
    """Model the corpus as multimodal rows: text bytes stand in for an
    opaque media payload + typed metadata columns."""
    return documents.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.lit("fake/blob").alias("format"),
    )


@query("multimodal_features", None)  # rows-only: mapInPandas is not SQL
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column feature extraction via mapInPandas: metadata
    filter (pushed before decode) → Arrow-batched stub decode →
    typed feature rows."""
    (documents,) = tables(spark, sf_dir, "documents")
    blobs = with_binary_content(documents)
    # metadata-only predicate BEFORE the decode stage
    blobs = blobs.filter(F.length("content") > 0)
    return blobs.mapInPandas(extract_features, schema=FEATURE_SCHEMA)
