"""Incremental ingestion dedup: gate a NEW batch against the stored
corpus without rescanning it.

Full-corpus dedup (``dedup_minhash_lsh``) is a batch job; a live
pipeline needs the streaming form — "is this incoming document a
near-dup of anything we already accepted?" — at cost proportional to
the batch, not the corpus. The standard design, composed here from
kernels this package already verifies:

- a persistent **LSH band index** table ``(_id=doc:band, doc_id,
  band_id, bv)``, maintained with the same O(touched-bucket)
  ``merge_upsert`` as any data table (bucketed on the synthetic key);
- candidates = batch band rows ⋈ index on ``(band_id, bv)`` — an
  equi-join whose cost tracks collisions, never corpus size;
- exact verify recomputes shingles ONLY for the candidate stored
  docs (semi-join fetch from the corpus table), then Jaccard on
  shingle sets;
- in-batch near-dups resolve canonically (lowest doc_id wins) before
  the batch touches the corpus.

At 100 TB the index is the only thing probed per batch, it is
key-bucketed for the merge, and the band join benefits from
partitioning the index by ``bv`` range if collisions concentrate.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qms_datawarehouse_spark.operators.dedup import (
    JACCARD_THRESHOLD,
    _shingled,
    minhash_bands,
)
from qms_datawarehouse_spark.operators.merge import merge_upsert
from qms_datawarehouse_spark.warehouse import ParquetWarehouse

CORPUS_TABLE = "corpus_docs"
INDEX_TABLE = "corpus_lsh"


@dataclass
class IngestResult:
    n_batch: int
    n_accepted: int
    n_rejected: int
    rejected: list  # [(new_doc_id, matched_doc_id, jaccard)]


def _verify_pairs(
    cand: DataFrame, new_sh: DataFrame, old_sh: DataFrame
) -> DataFrame:
    """Exact Jaccard on shingle sets for candidate (new, old) pairs."""
    a = new_sh.select(F.col("doc_id").alias("new_id"), F.col("shingles").alias("sa"))
    b = old_sh.select(F.col("doc_id").alias("old_id"), F.col("shingles").alias("sb"))
    withsets = cand.join(a, "new_id").join(b, "old_id")
    c = F.size(F.array_intersect(F.col("sa"), F.col("sb")))
    jacc = c * 1.0 / (F.size("sa") + F.size("sb") - c)
    return withsets.filter(jacc >= JACCARD_THRESHOLD).select(
        "new_id", "old_id", F.round(jacc, 4).alias("jaccard")
    )


def ingest_dedup(
    warehouse: ParquetWarehouse,
    batch: DataFrame,
    corpus_table: str = CORPUS_TABLE,
    index_table: str = INDEX_TABLE,
    n_buckets: int = 64,
) -> IngestResult:
    """Admit ``batch`` documents (``doc_id``, ``text``, …) that are
    not near-dups of the stored corpus or of an earlier batch doc;
    update the corpus and the band index with the admitted set."""
    n_batch = batch.count()
    if n_batch == 0:
        return IngestResult(0, 0, 0, [])

    sh = _shingled(batch).persist()
    bands = minhash_bands(sh).persist()

    rejected = []

    # -- in-batch canonicalization: lowest doc_id survives ------------
    a, b = bands.alias("a"), bands.alias("b")
    in_batch = (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.bv") == F.col("b.bv"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("b.doc_id").alias("new_id"), F.col("a.doc_id").alias("old_id"))
        .distinct()
    )
    in_batch_dups = _verify_pairs(in_batch, sh, sh).persist()
    # collected for the RESULT REPORT only (bounded by batch size);
    # the admission filter below is an anti-join, never an isin list
    rejected += [tuple(r) for r in in_batch_dups.collect()]
    batch_dup_ids = {r[0] for r in rejected}
    dup_ids = in_batch_dups.select(F.col("new_id").alias("doc_id"))

    # -- cross-corpus probe -------------------------------------------
    if warehouse.table_exists(index_table):
        index = warehouse.read(index_table)
        cand = (
            bands.join(
                index,
                (bands["band_id"] == index["band_id"])
                & (bands["bv"] == index["bv"])
                & (bands["doc_id"] != index["doc_id"]),
            )
            .select(
                bands["doc_id"].alias("new_id"),
                index["doc_id"].alias("old_id"),
            )
            .distinct()
        )
        # shingles recomputed ONLY for candidate stored docs
        cand_old_ids = cand.select(F.col("old_id").alias("doc_id")).distinct()
        old_docs = warehouse.read(corpus_table).join(
            cand_old_ids, "doc_id", "left_semi"
        )
        cross_dups = _verify_pairs(cand, sh, _shingled(old_docs)).persist()
        cross = [tuple(r) for r in cross_dups.collect()]
        rejected += [r for r in cross if r[0] not in batch_dup_ids]
        dup_ids = dup_ids.unionByName(
            cross_dups.select(F.col("new_id").alias("doc_id"))
        )

    reject_ids = {r[0] for r in rejected}
    accepted = batch.join(dup_ids.distinct(), "doc_id", "left_anti")

    # -- commit: corpus rows + index entries, both keyed merges -------
    n_accepted = n_batch - len(reject_ids)
    if n_accepted:
        merge_upsert(
            warehouse,
            corpus_table,
            accepted.withColumn("_id", F.col("doc_id").cast("string")),
            key="_id",
            order_col=None,
            n_buckets=n_buckets,
        )
        new_entries = bands.join(
            accepted.select("doc_id"), "doc_id", "left_semi"
        ).withColumn(
            "_id",
            F.concat_ws(":", F.col("doc_id").cast("string"), F.col("band_id")),
        )
        merge_upsert(
            warehouse,
            index_table,
            new_entries,
            key="_id",
            order_col=None,
            n_buckets=n_buckets,
        )
    sh.unpersist()
    bands.unpersist()
    return IngestResult(n_batch, n_accepted, len(reject_ids), sorted(rejected))
