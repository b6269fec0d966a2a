"""Incremental ingestion dedup: gate a NEW batch against the stored
corpus without rescanning it.

Full-corpus dedup (``dedup_minhash_lsh``) is a batch job; a live
pipeline needs the streaming form — "is this incoming document a
near-dup of anything we already accepted?" — at cost proportional to
the batch, not the corpus. The standard design, composed here from
kernels this package already verifies:

- a persistent **LSH band index** table ``(doc_id, band_id, bv)``
  physically partitioned by ``pmod(xxhash64(bv), B)`` — the column
  the PROBE joins on. Index rows are immutable, so maintenance is a
  dedup-append into the touched bv-partitions only (the same
  O(touched-partition) partial write the data tables use);
- candidates = the batch's band rows (broadcast) ⋈ the index
  restricted to the batch's bv-partitions — partition-dir pruning
  means the probe READS O(batch) index buckets, never the corpus,
  and the index never shuffles;
- exact verify recomputes shingles ONLY for the candidate stored
  docs (semi-join fetch from the corpus table), then Jaccard on
  shingle sets;
- in-batch near-dups resolve canonically (lowest doc_id wins) before
  the batch touches the corpus.

At 100 TB the index is the only thing probed per batch, and the probe
reads exactly the bv-partitions the batch's bands hash into — raise
``INDEX_BV_BUCKETS`` with corpus size to keep per-partition fan-in
bounded.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from qms_datawarehouse_spark.operators.merge import merge_upsert
from qms_datawarehouse_spark.warehouse import ParquetWarehouse

# NOTE: dedup kernels (_shingled, minhash_bands, JACCARD_THRESHOLD)
# import lazily inside functions — a module-level import here forms a
# cycle when a user imports operators.dedup directly (dedup → registry
# → plans/__init__ → this module → dedup, partially initialized).

CORPUS_TABLE = "corpus_docs"
INDEX_TABLE = "corpus_lsh"
BVB_COL = "_bvb"
INDEX_BV_BUCKETS = 64  # ≈ thousands at 100 TB (bounded probe fan-in)


@dataclass
class IngestResult:
    n_batch: int
    n_accepted: int
    n_rejected: int
    rejected: list  # [(new_doc_id, matched_doc_id, jaccard)] — report
    # only, capped at ``max_rejects`` pairs; counts above stay exact
    rejects_truncated: bool = False


def _bounded_pair_report(df: DataFrame, room: int | None):
    """Bounded driver-side pair report shared by every ingest gate
    (MinHash, SemDeDup-adjacent phash): a deterministic (ordered)
    prefix of ``room`` (new_id, old_id, ...) rows plus a saw-more
    flag. Admission filters never read this — they stay anti-joins on
    the full DataFrame; only the human-facing report is capped."""
    if room is None:
        return [tuple(r) for r in df.collect()], False
    if room <= 0:
        return [], bool(df.take(1))
    rows = df.orderBy("new_id", "old_id").limit(room + 1).collect()
    return [tuple(r) for r in rows[:room]], len(rows) > room


def _verify_pairs(
    cand: DataFrame, new_sh: DataFrame, old_sh: DataFrame
) -> DataFrame:
    """Exact Jaccard on shingle sets for candidate (new, old) pairs."""
    from qms_datawarehouse_spark.operators.dedup import JACCARD_THRESHOLD

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
    max_rejects: int | None = 10_000,
) -> IngestResult:
    """Admit ``batch`` documents (``doc_id``, ``text``, …) that are
    not near-dups of the stored corpus or of an earlier batch doc;
    update the corpus and the band index with the admitted set.

    ``max_rejects`` bounds the ``rejected`` pair REPORT riding back to
    the driver (a pathological all-dup batch otherwise collects one
    tuple per pair): the first ``max_rejects`` pairs in (new_id,
    old_id) order are returned and ``rejects_truncated`` is set.
    ``n_accepted``/``n_rejected`` stay EXACT — they are computed as
    DataFrame counts, never from the capped list. ``None`` uncaps.

    Intra-batch id duplicates: byte-identical repeats of one row
    collapse to one BEFORE anything hashes (at-least-once upstreams
    replay inside a micro-batch), so the counts speak in documents,
    not deliveries; the same doc_id with DIFFERENT row content in one
    batch fails loudly — merge_upsert(order_col=None) would otherwise
    pick an arbitrary winner.

    Crash window: the corpus upsert commits before the index rebuild;
    a crash between them leaves admitted docs invisible to the band
    probe until re-ingested. Recovery story: the corpus row carries
    the text, so missing band rows are recomputable (the banding
    kernels are deterministic) — ``phash_gate.reconcile_phash_index``
    is the pattern, with ``minhash_bands(_shingled(missing))`` as the
    re-derivation step here."""
    from qms_datawarehouse_spark.operators.dedup import (
        _shingled,
        minhash_bands,
    )

    batch = batch.dropDuplicates()
    # ONE aggregate serves the conflict gate AND the batch count (the
    # take(1)-then-count pair cost two jobs — the ingest_semantic
    # fold); the groupBy that names the offending id only runs on the
    # rare violation path
    stats = batch.agg(
        F.count(F.lit(1)).alias("n"),
        # count_distinct skips NULL ids; NULL-id rows form ONE group
        # under the old groupBy gate, so add that group back before
        # comparing — a single NULL-id row must not trip the gate
        (
            F.count_distinct(F.col("doc_id"))
            + F.when(
                F.count(F.when(F.col("doc_id").isNull(), 1)) > 0, 1
            ).otherwise(0)
        ).alias("nd"),
    ).first()
    if stats["nd"] != stats["n"]:
        conflict = (
            batch.groupBy("doc_id").count().filter(F.col("count") > 1).take(1)
        )
        raise ValueError(
            "ingest_dedup: doc_id "
            f"{conflict[0][0]!r} appears in this batch with more than one "
            "distinct row — no deterministic winner; dedupe upstream"
        )

    n_batch = stats["n"]
    if n_batch == 0:
        return IngestResult(0, 0, 0, [])

    sh = _shingled(batch).persist()
    bands = minhash_bands(sh).persist()

    rejected: list[tuple] = []
    truncated = False

    _report = _bounded_pair_report

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
    # collected for the RESULT REPORT only, capped at max_rejects;
    # the admission filter below is an anti-join, never an isin list
    got, trunc = _report(in_batch_dups, max_rejects)
    rejected += got
    truncated |= trunc
    # the cross-corpus report's already-rejected filter needs the FULL
    # in-batch dup id set, not the capped report prefix — O(batch)
    # distinct ids, never O(pairs)
    batch_dup_ids = {
        r[0] for r in in_batch_dups.select("new_id").distinct().collect()
    }
    dup_ids = in_batch_dups.select(F.col("new_id").alias("doc_id"))

    # -- cross-corpus probe -------------------------------------------
    if warehouse.table_exists(index_table):
        # The index is physically partitioned by a bv-derived bucket
        # (see the maintenance step below): filtering on the partition
        # column prunes whole directories, so the probe READS only the
        # index buckets the batch's band values hash into — the step
        # that keeps per-batch cost O(batch), not O(corpus). The batch
        # side is tiny → broadcast; the index side never shuffles.
        touched_bvb = [
            r[0]
            for r in bands.select(_bv_bucket().alias("b")).distinct().collect()
        ]
        index = warehouse.read(index_table).filter(
            F.col(BVB_COL).isin(touched_bvb)
        )
        cand = (
            index.join(
                F.broadcast(bands),
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
        room = None if max_rejects is None else max_rejects - len(rejected)
        cross, trunc = _report(cross_dups, room)
        rejected += [r for r in cross if r[0] not in batch_dup_ids]
        truncated |= trunc
        dup_ids = dup_ids.unionByName(
            cross_dups.select(F.col("new_id").alias("doc_id"))
        )

    # counts stay EXACT regardless of the report cap: one distinct
    # count over the (persisted) verified-dup frames, never the list
    n_rejected = dup_ids.distinct().count()
    accepted = batch.join(dup_ids.distinct(), "doc_id", "left_anti")

    # -- commit: corpus rows + index entries, both keyed merges -------
    n_accepted = n_batch - n_rejected
    stale_bands = None
    if n_accepted:
        # Re-ingestion: an accepted doc_id already in the corpus
        # UPSERTS its row (merge_upsert on _id), so its index entries
        # — derived from the OLD text — must be rebuilt, or future
        # near-dups of the new text probe stale bands (and near-dups
        # of the old, replaced text keep matching it). The old band
        # values are recomputed from the pre-upsert corpus rows
        # (banding kernels are deterministic), which pins exactly
        # which bv-partitions hold the stale rows. The corpus read is
        # bucket-pruned to the accepted ids' buckets — O(batch), not
        # O(corpus); when nothing is re-ingested this yields zero rows
        # and the rebuild is a no-op.
        if warehouse.table_exists(corpus_table):
            from qms_datawarehouse_spark.warehouse import BUCKET_COL

            meta_buckets = int(
                warehouse.read_meta(corpus_table).get("n_buckets", n_buckets)
            )
            acc_buckets = [
                r[0]
                for r in accepted.select(
                    F.pmod(
                        F.xxhash64(F.col("doc_id").cast("string")),
                        F.lit(meta_buckets),
                    ).alias("b")
                )
                .distinct()
                .collect()
            ]
            prior = (
                warehouse.read(corpus_table)
                .filter(F.col(BUCKET_COL).isin(acc_buckets))
                .join(accepted.select("doc_id"), "doc_id", "left_semi")
            )
            # the count both pins the frame before the corpus version
            # swaps AND serves as the existence probe — a separate
            # prior.take(1) was a second job over the same pruned
            # buckets (zero-row priors shingle zero rows, so the
            # empty case costs what the probe did)
            stale_bands = (
                minhash_bands(_shingled(prior))
                .withColumn(BVB_COL, _bv_bucket())
                .persist()
            )
            if not stale_bands.count():
                stale_bands.unpersist()
                stale_bands = None
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
        ).withColumn(BVB_COL, _bv_bucket())
        _index_append(warehouse, index_table, new_entries, stale_bands)
        if stale_bands is not None:
            stale_bands.unpersist()
    sh.unpersist()
    bands.unpersist()
    return IngestResult(
        n_batch, n_accepted, n_rejected, sorted(rejected), truncated
    )


def _bv_bucket(n: int = INDEX_BV_BUCKETS):
    """Physical partition for an index row: hash bucket of its band
    VALUE — the column the probe joins on, so probe reads prune to
    the batch's buckets."""
    return F.pmod(F.xxhash64(F.col("bv")), F.lit(n)).cast("int")


def _index_append(
    warehouse: ParquetWarehouse,
    index_table: str,
    new_entries: DataFrame,
    stale_entries: DataFrame | None = None,
) -> None:
    """Append band rows to the bv-partitioned index. A doc's band
    hashes never change WHILE ITS TEXT doesn't — re-ingestion of an
    existing doc_id with new text is the exception, and its old rows
    arrive as ``stale_entries`` (the old text's recomputed band rows):
    their bv-partitions join the touched set and every row of those
    doc_ids is dropped before the fresh rows land, keeping the index
    exactly in sync with the upserted corpus row. Maintenance stays a
    dedup-union into the touched bv-buckets only, committed with the
    same O(touched-partition) partial write the data tables use."""
    if not warehouse.table_exists(index_table):
        warehouse.write_version(index_table, new_entries, partition_by=[BVB_COL])
        return
    touched_df = new_entries.select(BVB_COL)
    if stale_entries is not None:
        touched_df = touched_df.unionByName(stale_entries.select(BVB_COL))
    touched = [r[0] for r in touched_df.distinct().collect()]
    # read-modify-write: pin the version read, CAS the commit on it —
    # a racing ingest surfaces ConcurrentWriteError and the replayed
    # batch re-runs the idempotent dedup-union against the new state
    base = warehouse.current_version_name(index_table)
    existing = warehouse.read(index_table, version=base).filter(
        F.col(BVB_COL).isin(touched)
    )
    if stale_entries is not None:
        # remove ALL rows of re-ingested doc_ids: stale_entries' bv
        # values pin every partition their old rows can live in, so
        # the doc_id anti-join within the touched set removes them all
        existing = existing.join(
            stale_entries.select("doc_id").distinct(), "doc_id", "left_anti"
        )
    fresh = new_entries.join(
        existing.select("doc_id", "band_id", "bv"),
        ["doc_id", "band_id", "bv"],
        "left_anti",
    )
    warehouse.write_version_partial(
        index_table,
        existing.unionByName(fresh),
        touched,
        partition_col=BVB_COL,
        base_version=base,
    )
