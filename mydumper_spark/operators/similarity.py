"""Similarity search over embedding columns (north-star extension).

Two tiers, as a 100 TB design requires:
- **Brute-force cosine top-k** — the exact baseline. One narrow projection
  (dot product via zip_with/aggregate, pure codegen) + a top-k sort that
  Spark executes as per-partition TakeOrdered + driver merge, i.e. no full
  shuffle. Right answer for one query vector over any corpus size.
- **LSH-bucketed ANN (random hyperplanes)** — the scale path for
  query-*batch* workloads: signature = sign bits against H deterministic
  hyperplanes; candidates share a signature bucket (or a banded sub-key),
  then exact re-scoring only inside buckets. Hyperplane coefficients are
  derived from xxhash64(plane, dim) so every executor materializes the same
  planes with zero driver shipping.
- **embedding near-dup**: pairs within cosine ≥ τ via the same bucketing —
  the embedding-space analogue of MinHash dedup.
- **Product quantization (PQ / IVF-PQ)** — the memory tier: vectors encode
  to ``m`` one-byte codes (32× smaller than raw float32); ADC queries score
  codes from driver-side lookup tables, and IVF-PQ composes cell pruning
  (partition pruning when persisted) with code scoring.
- **Batch top-k** (``cosine_topk_batch``) — the query-batch workload as one
  numpy GEMM per Arrow batch inside ``mapInPandas`` (the case where a
  vectorized pandas UDF legitimately beats per-element codegen), with
  per-batch local top-k so the reduce stage sees ~partitions×k rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mydumper_spark.sqlexpr import (
    cell_scores_sql,
    cosine_const_sql,
    darr,
    dlit,
    dot_sql,
    qcol,
)

#: row-chunk size for within-cell pairwise GEMMs (semantic_dedup_batch):
#: peak similarity-buffer memory is chunk × |cell| float64 (~16 MB per
#: 1k-column cell at 2048) instead of |cell|² — chunking is exact
_GEMM_CHUNK = 2048


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as an ordered left-to-right double fold — deterministic, and
    reproducible bit-for-bit by the DuckDB oracle."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    """Zero-norm-safe: a zero vector has no direction — similarity 0.0,
    never a DIVIDE_BY_ZERO under ANSI mode (the guard the batch-GEMM
    variants got in round 5; this expression twin needs it for the same
    degenerate inputs, e.g. feature-hashed empty documents)."""
    denom = norm(a) * norm(b)
    return F.when(denom == 0.0, F.lit(0.0)).otherwise(dot(a, b) / denom)


def cosine_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k by cosine against one query vector.

    The query vector is inlined as an array literal (same role as a broadcast
    variable for a single row). Ordering ties broken by id for determinism.
    The whole scoring expression renders as ONE SQL parse (sqlexpr; the
    Column-builder twin costs ~3×dim py4j round trips — r15), tree-identical
    to ``round(cosine(vec, lit-array), 6)`` and pinned so in test_sqlexpr.
    """
    scored = embeddings.select(
        F.col(id_col),
        F.round(F.expr(cosine_const_sql(qcol(vec_col), query_vec)), 6)
        .alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def _plane_signs(plane: int, dim: int) -> list[float]:
    """Rademacher ±1 coefficients for one deterministic hyperplane, derived
    from sha256(plane, dim). The single source of truth for BOTH the
    executor-side signature column (:func:`_hyperplane`) and the driver-side
    query signature in :func:`ann_topk_indexed` — a persisted index's ``__sig``
    values and the query signature must come from the same planes or the
    pruned candidate set is silently wrong."""
    import hashlib

    return [
        1.0
        if hashlib.sha256(f"plane:{plane}:{d}".encode()).digest()[0] % 2 == 0
        else -1.0
        for d in range(dim)
    ]


def _hyperplane(plane: int, dim: int) -> Column:
    """Deterministic pseudo-random hyperplane: :func:`_plane_signs`
    coefficients inlined as an array literal — constant-folded by Catalyst,
    so signature evaluation is one zip_with/aggregate per plane with zero
    per-row branching."""
    return F.array(*[F.lit(s) for s in _plane_signs(plane, dim)])


def simhash_embedding_signature(
    vec_col: Column, dim: int, num_planes: int = 16
) -> Column:
    """Bit signature: bit p = [dot(x, plane_p) > 0], packed into a bigint."""
    bits = [
        F.when(dot(vec_col, _hyperplane(p, dim)) > 0, F.shiftleft(F.lit(1).cast("bigint"), p)).otherwise(
            F.lit(0).cast("bigint")
        )
        for p in range(num_planes)
    ]
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out


def _sig_sql(vec_sql: str, dim: int, num_planes: int = 16) -> str:
    """SQL text of :func:`simhash_embedding_signature` — the identical
    CASE/shiftleft/sum tree in ONE parse (num_planes × dim ``F.lit`` calls
    otherwise; equality pinned in test_sqlexpr)."""
    bits = [
        f"CASE WHEN ({dot_sql(vec_sql, _plane_signs(p, dim))}) > 0 "
        f"THEN shiftleft(CAST(1 AS BIGINT), {p}) "
        "ELSE CAST(0 AS BIGINT) END"
        for p in range(num_planes)
    ]
    return "(" + " + ".join(bits) + ")"


def ann_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    dim: int | None = None,
    num_planes: int = 16,
    probe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only vectors whose hyperplane signature is
    within ``probe_hamming`` bits of the query's signature.

    At 100 TB the signature column is computed once and persisted
    (write-time), making every query a bucket-pruned scan instead of a full
    corpus scan; here it is computed inline.
    """
    if dim is None:
        dim = len(query_vec)
    sig = F.expr(_sig_sql(qcol(vec_col), dim, num_planes))
    qsig = F.expr(_sig_sql(darr(query_vec), dim, num_planes))
    candidates = embeddings.withColumn("__sig", sig).where(
        F.bit_count(F.col("__sig").bitwiseXOR(qsig)) <= probe_hamming
    )
    scored = candidates.select(
        F.col(id_col),
        F.round(F.expr(cosine_const_sql(qcol(vec_col), query_vec)), 6)
        .alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def train_ivf_centroids(
    embeddings: DataFrame,
    n_cells: int = 8,
    sample_n: int = 100_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 7,
) -> list[list[float]]:
    """KMeans-trained IVF centroids (pyspark.ml) fit on a bounded,
    deterministic sample.

    The sample is the ``sample_n`` rows with the smallest
    ``xxhash64(id)`` — Spark plans ``orderBy(...).limit(n)`` as
    TakeOrderedAndProject (per-partition top-n + driver merge), NOT a full
    sort, so this stays cheap at corpus scale and is reproducible with no
    RNG state. KMeans itself runs distributed on the sample; only the
    ``n_cells`` centers come back to the driver, to be inlined as literals
    by the assignment pass."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    sample = (
        embeddings.select(F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"))
        .orderBy(F.xxhash64(F.col("__id").cast("string")))
        .limit(sample_n)
        .select(array_to_vector(F.col("__v").cast("array<double>")).alias("features"))
    )
    model = KMeans(k=n_cells, seed=seed, maxIter=20).fit(sample)
    return [[float(x) for x in c] for c in model.clusterCenters()]


def _cell_score(vec: Column, c: list[float]) -> Column:
    """dot(v, c) − |c|²/2: argmax over cells == argmin Euclidean distance
    (|v|² is constant per row), so assignment agrees exactly with the KMeans
    objective while staying a pure-codegen dot product."""
    bias = sum(x * x for x in c) / 2.0
    return dot(vec, F.array(*[F.lit(x) for x in c])) - F.lit(bias)


def ivf_assign_cells(
    embeddings: DataFrame,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> tuple[DataFrame, list[list[float]]]:
    """IVF index build: take ``centroids`` (train with
    :func:`train_ivf_centroids` for KMeans quality) or fall back to
    ``n_cells`` deterministic sample centroids (xxhash64-ordered sample —
    reproducible across runs, no RNG state), then assign every vector to its
    Euclidean-nearest centroid.

    At 100 TB the assignment is a write-time column and the table is
    partitioned/clustered by ``__cell``; a query then scans only the probed
    cells — partition pruning does the candidate selection. Centroids are
    inlined as literals (Catalyst constant-folds them), so assignment is one
    narrow codegen pass, no shuffle, no driver round-trips per row."""
    cents = centroids if centroids is not None else [
        [float(x) for x in r[vec_col]]
        for r in embeddings.select(vec_col, id_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(n_cells)
        .collect()
    ]
    # one SQL parse for the whole scored-cells array — the per-cell
    # _cell_score Column twin costs n_cells × dim py4j round trips (r15);
    # tree-identical, pinned in test_sqlexpr
    scored = F.expr(cell_scores_sql(qcol(vec_col), cents))
    assigned = embeddings.withColumn("__cell", F.array_max(scored)["cell"])
    return assigned, cents


def ivf_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 8,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: score only vectors in the ``n_probe`` cells
    whose centroids are closest to the query. ``n_probe == n_cells`` recovers
    exact brute force (the recall dial). Pass KMeans ``centroids`` from
    :func:`train_ivf_centroids` for trained-cell recall."""
    assigned, cents = ivf_assign_cells(embeddings, n_cells, id_col, vec_col, centroids)
    qdots = [
        (i, sum(q * x for q, x in zip(query_vec, c)) - sum(x * x for x in c) / 2.0)
        for i, c in enumerate(cents)
    ]
    probe = [i for i, _ in sorted(qdots, key=lambda t: -t[1])[:n_probe]]
    scored = assigned.where(F.col("__cell").isin(probe)).select(
        F.col(id_col),
        F.round(F.expr(cosine_const_sql(qcol(vec_col), query_vec)), 6)
        .alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def write_ann_index(
    embeddings: DataFrame,
    path: str,
    dim: int,
    num_planes: int = 16,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the write-time ANN layout SCALE.md promises: full
    hyperplane signature as a column, first ``band_bits`` signature bits as
    the parquet PARTITION column. A query then reads only partitions whose
    band is within the probe Hamming budget — partition pruning does the
    candidate selection, so query cost scales with selectivity, not corpus
    size."""
    sig = F.expr(_sig_sql(qcol(vec_col), dim, num_planes))
    indexed = embeddings.withColumn("__sig", sig).withColumn(
        "sig_band", F.col("__sig").bitwiseAND(F.lit((1 << band_bits) - 1))
    )
    indexed.write.mode("overwrite").partitionBy("sig_band").parquet(path)


def ann_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    num_planes: int = 16,
    band_bits: int = 4,
    probe_hamming: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query the persisted index: identical results to the inline
    :func:`ann_topk` (pytest-pinned) but reading ONLY partitions whose
    ``sig_band`` lies within ``probe_hamming`` bits of the query band — a
    candidate's full-signature Hamming distance is ≥ its band distance, so
    the pruned set is lossless. Probed partitions = Σ C(band_bits, i) for
    i ≤ probe_hamming (e.g. 11 of 16 at 4 bits / h=2), and the scan plan
    shows the pruning as PartitionFilters."""
    # driver-side query signature + band neighborhood (tiny, pure python);
    # plane coefficients shared with the persisted __sig via _plane_signs
    qsig = 0
    for p in range(num_planes):
        signs = _plane_signs(p, len(query_vec))
        if sum(v * s for v, s in zip(query_vec, signs)) > 0:
            qsig |= 1 << p
    qband = qsig & ((1 << band_bits) - 1)
    bands = [
        b for b in range(1 << band_bits)
        if bin(b ^ qband).count("1") <= probe_hamming
    ]
    df = spark.read.parquet(path).where(F.col("sig_band").isin(bands))
    candidates = df.where(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(qsig))) <= probe_hamming
    )
    scored = candidates.select(
        F.col(id_col),
        F.round(F.expr(cosine_const_sql(qcol(vec_col), query_vec)), 6)
        .alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def write_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
) -> list[list[float]]:
    """Materialize the IVF layout: cell assignment as a parquet partition
    column (``__cell``). Returns the centroids — the caller persists them
    alongside (they ARE the index metadata a query needs)."""
    assigned, cents = ivf_assign_cells(embeddings, n_cells, id_col, vec_col, centroids)
    assigned.write.mode("overwrite").partitionBy("__cell").parquet(path)
    return cents


def ivf_topk_indexed(
    spark,
    path: str,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Query the persisted IVF index: identical to :func:`ivf_topk` over the
    same centroids (pytest-pinned), but candidate selection is partition
    pruning — only the ``n_probe`` nearest cells' directories are read."""
    qdots = [
        (i, sum(q * x for q, x in zip(query_vec, c)) - sum(x * x for x in c) / 2.0)
        for i, c in enumerate(centroids)
    ]
    probe = [i for i, _ in sorted(qdots, key=lambda t: -t[1])[:n_probe]]
    df = spark.read.parquet(path).where(F.col("__cell").isin(probe))
    scored = df.select(
        F.col(id_col),
        F.round(F.expr(cosine_const_sql(qcol(vec_col), query_vec)), 6)
        .alias("cosine_sim"),
    )
    return scored.orderBy(F.col("cosine_sim").desc(), F.col(id_col).asc()).limit(k)


def smallest_id_vectors(
    embeddings: DataFrame,
    n: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[float]]:
    """The ``n`` vectors with the smallest ids, id-ascending, as python
    floats — ONE bounded driver collect shared by every deterministic
    id-derived parameter source (query vector = row 0, IVF centroids =
    rows [:n_cells], PQ codebook donors = rows [:ksub]). Callers that need
    several of those parameters should collect once here and slice, instead
    of issuing one scan job per parameter (r14: the IVF-PQ entry paid three
    driver jobs — ~60% of its steady-state wall — for rows the first job
    had already read)."""
    rows = (
        embeddings.where(F.col(id_col) < n)
        .orderBy(id_col)
        .select(vec_col)
        .collect()
    )
    return [[float(x) for x in r[vec_col]] for r in rows]


def pq_codebooks_from_ids(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectors: list[list[float]] | None = None,
) -> list[list[list[float]]]:
    """Product-quantization codebooks from a deterministic, SQL-replayable
    source: the ``ksub`` vectors with the smallest ids, each split into
    ``m`` subvectors. codebooks[j][c] is subspace j's centroid with code
    c == the donor vector's id (ids are contiguous from 0 in the fixture).
    A bounded driver collect (ksub rows), same class as the chunk planner's
    boundary queries. For trained-quality codebooks, swap in KMeans per
    subspace (then the entry is rows-only, like IVF's trained path).
    Pass ``vectors`` (≥ ksub rows from :func:`smallest_id_vectors`) to
    reuse an already-collected donor set instead of re-scanning."""
    if vectors is None:
        vectors = smallest_id_vectors(embeddings, ksub, id_col, vec_col)
    donors = vectors[:ksub]
    dim = len(donors[0])
    dsub = dim // m
    return [
        [v[j * dsub : (j + 1) * dsub] for v in donors] for j in range(m)
    ]


def train_pq_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    ksub: int = 16,
    sample_n: int = 10_000,
    iters: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """KMeans-trained PQ codebooks: per subspace, Lloyd's algorithm on a
    bounded deterministic sample — the trained-quality sibling of
    :func:`pq_codebooks_from_ids` (which stays the oracle-replayable twin),
    mirroring :func:`train_ivf_centroids` for cell centroids.

    Determinism without RNG state: the sample is the ``sample_n`` rows with
    the smallest ``xxhash64(id)`` (TakeOrdered — per-partition top-n, no
    full sort), and initial centers are evenly spaced rows of that
    hash-ordered sample. The fit itself is driver-side numpy over the
    bounded sample (same class as the chunk planner's boundary collects —
    the corpus is never collected); output is m×ksub×dsub floats that ship
    to executors inside the encode closure. Empty clusters re-seed to the
    point farthest from its assigned center (standard Lloyd repair)."""
    import numpy as np

    rows = (
        embeddings.select(F.col(vec_col).alias("__v"),
                          F.xxhash64(F.col(id_col).cast("string")).alias("__h"))
        .orderBy("__h")
        .limit(sample_n)
        .collect()
    )
    x = np.array([[float(v) for v in r["__v"]] for r in rows], dtype=np.float64)
    n, dim = x.shape
    dsub = dim // m
    if n < ksub:
        raise ValueError(f"sample of {n} rows cannot seed {ksub} centroids")
    out = []
    for j in range(m):
        sub = x[:, j * dsub : (j + 1) * dsub]
        centers = sub[np.linspace(0, n - 1, ksub).astype(np.int64)].copy()
        for _ in range(iters):
            d = ((sub[:, None, :] - centers[None, :, :]) ** 2).sum(axis=2)
            assign = np.argmin(d, axis=1)
            new = centers.copy()
            for c in range(ksub):
                members = sub[assign == c]
                if len(members):
                    new[c] = members.mean(axis=0)
                else:  # empty cluster: re-seed to the worst-served point
                    new[c] = sub[np.argmax(d[np.arange(n), assign])]
            if np.allclose(new, centers):
                break
            centers = new
        out.append([[float(v) for v in c] for c in centers])
    return out


def pq_distortion(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
) -> float:
    """Mean squared reconstruction error of the codebooks over the corpus —
    the quantity KMeans minimizes; the quality pin for trained vs id-derived
    codebooks (lower = candidate ADC distances track true distances
    better). One encode pass + one aggregate, distributed."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    enc = pq_encode(embeddings.select(vec_col), codebooks, vec_col=vec_col)
    err = None
    for j in range(m):
        cb = F.array(*[
            F.array(*[F.lit(float(v)) for v in center]) for center in codebooks[j]
        ])
        center = F.element_at(cb, (F.element_at("pq_code", j + 1) + 1).cast("int"))
        sub = F.slice(F.col(vec_col), j * dsub + 1, dsub)
        e = F.aggregate(
            F.zip_with(sub, center, lambda a, b: (a.cast("double") - b) ** 2),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        err = e if err is None else err + e
    return enc.select(F.avg(err).alias("mse")).first()["mse"]


def _pq_sq_dist(vec_col: Column, offset: int, center: list[float]) -> Column:
    """||v[offset:offset+len(center)] - center||² as a fixed-order
    left-to-right sum of products — bit-reproducible by the DuckDB oracle's
    list_sum over the same term order."""
    acc = None
    for i, c in enumerate(center):
        d = F.element_at(vec_col, offset + i + 1).cast("double") - F.lit(c)
        term = d * d
        acc = term if acc is None else acc + term
    return acc


def _pq_sq_dist_sql(vec_sql: str, offset: int, center: list[float]) -> str:
    """SQL text of :func:`_pq_sq_dist` — identical term tree, one parse."""
    terms = []
    for i, c in enumerate(center):
        d = (f"(CAST(element_at({vec_sql}, {offset + i + 1}) AS DOUBLE) "
             f"- {dlit(c)})")
        terms.append(f"({d} * {d})")
    return "(" + " + ".join(terms) + ")"


def pq_encode_expr(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Expression-tree PQ encoder — the SQL-replayable SPEC twin of
    :func:`pq_encode` (pytest pins them identical). Per subspace, the code of
    the squared-Euclidean-nearest centroid (ties to the smallest code), all
    codebook literals constant-folded.

    NOT the production path: the m×ksub×dsub term tree exceeds Janino's
    64 KB generated-method limit already at m=8/ksub=16 when composed with
    IVF cell scoring, and Spark silently falls back to interpreted row-at-a-
    time evaluation (measured ~10× slower). Kept because DuckDB can replay
    this exact term order, which is what makes the PQ pipeline oracle-able."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    code_exprs = []
    for j in range(m):
        cand = "array(" + ", ".join(
            f"named_struct('d', {_pq_sq_dist_sql(qcol(vec_col), j * dsub, center)}, "
            f"'code', CAST({code} AS BIGINT))"
            for code, center in enumerate(codebooks[j])
        ) + ")"
        code_exprs.append(f"array_min({cand}).code")
    # the whole m-subspace code array in ONE SQL parse — the Column twin
    # costs m × ksub × dsub py4j round trips (r15); tree-identical
    return embeddings.withColumn(
        out_col, F.expr("array(" + ", ".join(code_exprs) + ")")
    )


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    vec_col: str = "embedding",
    out_col: str = "pq_code",
) -> DataFrame:
    """Assign each vector its PQ code array: per subspace, the code of the
    squared-Euclidean-nearest centroid (ties to the smallest code).

    This is the 100 TB memory story: an encoded corpus stores ``m`` small
    ints (8 bytes here) per vector instead of the raw floats (256 bytes) —
    candidate scoring reads codes only.

    Production path = Arrow-batched numpy inside ``mapInPandas`` (the
    ``cosine_topk_batch`` pattern): the codebooks are a tiny closure
    broadcast, each batch computes all m×ksub squared distances as
    vectorized float64 ops, and — critically — the per-(row,center)
    accumulation runs dimension-by-dimension left-to-right, the SAME
    operation order as the expression twin :func:`pq_encode_expr` and the
    DuckDB oracle, so all three produce bit-identical codes (pytest-pinned).
    The expression twin is what it replaces: its m×ksub inlined distance
    tree blows Janino's 64 KB method limit (ksub=256 production codebooks
    are 16× worse) and degrades to interpreted execution; numpy encode cost
    is flat in ksub and never leaves the Arrow batch."""
    import numpy as np
    from pyspark.sql import types as T

    m = len(codebooks)
    dsub = len(codebooks[0][0])
    # ksub×dsub float64 per subspace — exact doubles of the spec literals
    cb = [np.array(codebooks[j], dtype=np.float64) for j in range(m)]
    out_schema = T.StructType(
        list(embeddings.schema.fields)
        + [T.StructField(out_col, T.ArrayType(T.LongType(), False), False)]
    )

    def encode(batches):
        for pdf in batches:
            pdf = pdf.copy()
            if pdf.empty:
                pdf[out_col] = []
                yield pdf
                continue
            # float32 parquet values widen exactly to float64 — same as the
            # expression twin's cast("double")
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            codes = np.empty((len(pdf), m), dtype=np.int64)
            for j in range(m):
                sub = v[:, j * dsub : (j + 1) * dsub]  # n × dsub
                dist = np.zeros((len(pdf), len(cb[j])), dtype=np.float64)
                for i in range(dsub):  # ordered accumulation, not np.sum
                    d = sub[:, i : i + 1] - cb[j][None, :, i]
                    dist = dist + d * d
                # argmin first-occurrence == ties to the smallest code,
                # matching array_min over struct(d, code)
                codes[:, j] = np.argmin(dist, axis=1)
            pdf[out_col] = list(codes)
            yield pdf

    return embeddings.mapInPandas(encode, out_schema)


def _adc_luts(
    query_vec: list[float], codebooks: list[list[list[float]]]
) -> list[list[float]]:
    """Per-subspace lookup tables of squared distances from the query
    subvector to each centroid, with fixed-order float sums. The single
    source of truth for ADC scoring — used by :func:`pq_topk` and
    :func:`ivf_pq_topk_indexed`; a drift between them would silently score
    persisted codes against different tables than inline queries."""
    m = len(codebooks)
    dsub = len(codebooks[0][0])
    luts = []
    for j in range(m):
        qsub = query_vec[j * dsub : (j + 1) * dsub]
        lut = []
        for center in codebooks[j]:
            acc = 0.0
            for qv, cv in zip(qsub, center):
                d = float(qv) - cv
                acc = acc + d * d
            lut.append(acc)
        luts.append(lut)
    return luts


def _adc_total(luts: list[list[float]], code_col: str = "pq_code") -> Column:
    """j-ordered sum of each code's lookup-table entry — the ADC score.
    One SQL parse (the Column twin costs m × ksub py4j round trips — r15);
    tree-identical, pinned in test_sqlexpr."""
    terms = [
        f"element_at({darr(lut)}, "
        f"CAST((element_at({qcol(code_col)}, {j + 1}) + 1) AS INT))"
        for j, lut in enumerate(luts)
    ]
    return F.expr("(" + " + ".join(terms) + ")")


def pq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k: per subspace, a lookup table of
    squared distances from the query subvector to each centroid is computed
    on the driver; a candidate's approximate distance is the j-ordered sum
    of its codes' table entries — no float vector is touched at scoring
    time. Returns (id, approx_dist) nearest-first, ties by id on the
    ROUNDED distance so cross-engine ordering is stable."""
    # explicit projection: mapInPandas is a pruning barrier, so narrow the
    # Arrow transfer to (id, vec) ourselves instead of relying on Catalyst
    encoded = pq_encode(
        embeddings.select(id_col, vec_col), codebooks, vec_col=vec_col
    )
    total = _adc_total(_adc_luts(query_vec, codebooks))
    scored = encoded.select(
        F.col(id_col), F.round(total, 6).alias("approx_dist")
    )
    return scored.orderBy(F.col("approx_dist").asc(), F.col(id_col).asc()).limit(k)


def cosine_topk_batch(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str = "query_id",
    q_vec_col: str = "query_vec",
) -> DataFrame:
    """Exact top-k cosine neighbors for a BATCH of query vectors in ONE
    corpus pass — the query-batch workload (ann_topk serves one vector).

    This is the deliberate Pandas-UDF case: scoring a corpus batch against
    Q queries is a dense matrix product, where one numpy/BLAS GEMM per
    Arrow batch beats Q×D per-element codegen expressions. The queries are
    driver-collected (bounded: a query batch, not a corpus) and shipped in
    the closure; each mapInPandas batch emits only its LOCAL top-k per
    query, so the global per-query reduction sees ~partitions×k candidate
    rows, never corpus×Q. Scores round to 6 decimals before ranking, and
    ties rank by id, so the result is engine-portable.

    Returns (query_id, vec_id, cosine_sim) with k rows per query.

    Ids keep their INPUT Spark types end-to-end (round 12, with
    hard_negative_topk): string doc ids flow through the Arrow closure
    and tie-break in string order on both engines; corpus rows with a
    NULL id are excluded (their identity is the output), NULL query ids
    raise."""
    import numpy as np

    qrows = queries.select(q_id_col, q_vec_col).collect()
    if any(r[q_id_col] is None for r in qrows):
        raise ValueError(
            f"cosine_topk_batch: NULL {q_id_col} in queries — query ids "
            "name the output rows and must be non-null")
    qids = np.array([r[q_id_col] for r in qrows], dtype=object)
    qm = np.array([[float(x) for x in r[q_vec_col]] for r in qrows],
                  dtype=np.float64)
    qnorm = np.sqrt((qm * qm).sum(axis=1))
    # zero-norm vectors have no defined cosine: a zero-norm QUERY raises
    # (silently ranking NaNs would displace real neighbors), zero-norm
    # CORPUS rows are filtered before the GEMM below
    if np.any(qnorm == 0.0):
        bad = qids[qnorm == 0.0].tolist()
        raise ValueError(f"zero-norm query vector(s): {bad} — cosine undefined")
    schema = (f"{q_id_col} {dict(queries.dtypes)[q_id_col]}, "
              f"{id_col} {dict(embeddings.dtypes)[id_col]}, "
              "cosine_sim double")

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=object)
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vnorm = np.sqrt((v * v).sum(axis=1))
            nz = vnorm != 0.0
            if not nz.all():
                ids, v, vnorm = ids[nz], v[nz], vnorm[nz]
            if len(ids) == 0:
                continue
            # dot / (|v|·|q|) in the same operation order as the SQL twin
            sims = np.round((v @ qm.T) / (vnorm[:, None] * qnorm[None, :]), 6)
            out_q, out_id, out_s = [], [], []
            for qi in range(len(qids)):
                col = sims[:, qi]
                order = np.lexsort((ids, -col))[:k]
                out_q.extend([qids[qi]] * len(order))
                out_id.extend(ids[order])
                out_s.extend(col[order])
            yield pd.DataFrame(
                {q_id_col: out_q, id_col: out_id, "cosine_sim": out_s}
            )

    # NULL-id exclusion happens DECLARATIVELY, before Arrow: a nullable
    # int column reaches pandas as float64 with NaN (where an `is None`
    # check silently passes and large ids lose precision); filtering in
    # the plan keeps the column's dtype intact through the closure
    candidates = (embeddings.select(id_col, vec_col)
                  .where(F.col(id_col).isNotNull())
                  .mapInPandas(score, schema))
    from pyspark.sql.window import Window

    w = Window.partitionBy(q_id_col).orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc()
    )
    return (
        candidates.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= k)
        .drop("__rn")
    )


def ivf_centroids_from_ids(
    embeddings: DataFrame,
    n_cells: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    vectors: list[list[float]] | None = None,
) -> list[list[float]]:
    """Deterministic, SQL-replayable IVF centroids: the ``n_cells`` vectors
    with the smallest ids (cell index == donor id). The oracle-able sibling
    of the xxhash64-sampled fallback in :func:`ivf_assign_cells`; use
    :func:`train_ivf_centroids` when recall matters more than replayability.
    Pass ``vectors`` (≥ n_cells rows from :func:`smallest_id_vectors`) to
    reuse an already-collected donor set instead of re-scanning."""
    if vectors is None:
        vectors = smallest_id_vectors(embeddings, n_cells, id_col, vec_col)
    return [list(v) for v in vectors[:n_cells]]


def ivf_pq_topk(
    embeddings: DataFrame,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-PQ: the composition that actually ships at 100 TB. Candidate
    selection = IVF cell pruning (with a persisted ``__cell``-partitioned
    layout this is partition pruning — query cost ∝ probed cells);
    candidate scoring = PQ asymmetric distance over 8-byte code arrays
    (memory ∝ codes, not raw vectors). Both stages are narrow: centroids
    and codebooks are constant-folded literals, so the whole query is one
    filter + one projection + TakeOrdered."""
    n_cells = len(centroids)
    assigned, cents = ivf_assign_cells(
        embeddings, n_cells, id_col, vec_col, centroids
    )
    qdots = [
        (i, sum(q * x for q, x in zip(query_vec, c)) - sum(x * x for x in c) / 2.0)
        for i, c in enumerate(cents)
    ]
    probe = [i for i, _ in sorted(qdots, key=lambda t: -t[1])[:n_probe]]
    cand = assigned.where(F.col("__cell").isin(probe)).drop("__cell")
    return pq_topk(cand, query_vec, codebooks, k, id_col, vec_col)


def write_ivf_pq_index(
    embeddings: DataFrame,
    path: str,
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Materialize the full IVF-PQ layout: PQ code array as the payload
    (ids + m small ints — the raw vectors are NOT stored), IVF cell as the
    parquet partition column. At 100 TB this is the whole point: the index
    is ~32× smaller than the corpus vectors, queries read only the probed
    cells' directories, and scoring touches codes only."""
    n_cells = len(centroids)
    assigned, _ = ivf_assign_cells(embeddings, n_cells, id_col, vec_col, centroids)
    encoded = pq_encode(
        assigned.select(id_col, vec_col, "__cell"), codebooks, vec_col=vec_col
    )
    encoded.select(id_col, "pq_code", "__cell").write.mode("overwrite").partitionBy(
        "__cell"
    ).parquet(path)


def ivf_pq_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    codebooks: list[list[list[float]]],
    centroids: list[list[float]],
    k: int = 10,
    n_probe: int = 2,
    id_col: str = "vec_id",
) -> DataFrame:
    """Query the persisted IVF-PQ index: identical results to the inline
    :func:`ivf_pq_topk` over the same codebooks/centroids (pytest-pinned),
    but candidate selection is partition pruning over ``__cell`` and the
    ADC score reads ONLY the stored code arrays — no embedding column
    exists in the index at all."""
    qdots = [
        (i, sum(q * x for q, x in zip(query_vec, c)) - sum(x * x for x in c) / 2.0)
        for i, c in enumerate(centroids)
    ]
    probe = [i for i, _ in sorted(qdots, key=lambda t: -t[1])[:n_probe]]
    df = spark.read.parquet(path).where(F.col("__cell").isin(probe))
    total = _adc_total(_adc_luts(query_vec, codebooks))
    scored = df.select(F.col(id_col), F.round(total, 6).alias("approx_dist"))
    return scored.orderBy(F.col("approx_dist").asc(), F.col(id_col).asc()).limit(k)


def _det_plane(dim: int, tag: str) -> list[float]:
    """Deterministic pseudo-random hyperplane direction in [-1, 1)^dim —
    md5-derived, no RNG state, identical across runs/engines (the same
    determinism contract as shuffle_corpus / sampling keys)."""
    import hashlib

    return [
        int.from_bytes(
            hashlib.md5(f"semdedup:{tag}:{k}".encode()).digest()[:8], "big"
        ) / float(1 << 63) - 1.0
        for k in range(dim)
    ]


def _dot_lit(vec_col: str, plane: list[float]):
    # one SQL parse; NOTE no explicit casts in the product lambda — the
    # analyzer inserts the same float→double coercion the Column twin got
    return F.expr(
        f"aggregate(zip_with({qcol(vec_col)}, {darr(plane)}, "
        "(x, y) -> x * y), 0.0D, (acc, x) -> acc + x)"
    )


def subsplit_oversized_cells(
    assigned: DataFrame,
    centroids: list[list[float]],
    max_cell: int,
    vec_col: str = "embedding",
    rounds: int = 3,
    bits_per_round: int = 4,
) -> DataFrame:
    """Cell-size guard for the SemDeDup family: any ``__cell`` holding more
    than ``max_cell`` rows is sub-split by deterministic hyperplane bits
    CENTERED ON ITS CENTROID (bit_j = sign(v·h_j − c·h_j)), iterated until
    every cell fits or ``rounds`` is exhausted — the skew cap the LSH path
    gets from ``max_bucket`` (dedup.py), but splitting instead of dropping.

    Why this shape survives 100 TB: the per-round work is one count
    aggregate (bytes per cell — the driver collect is bounded by the cell
    count, not the data) plus one narrow codegen projection; no shuffle of
    the vectors themselves. Centering on the parent centroid is what makes
    a dense cluster actually split — a tight ball far from the origin sits
    entirely on one side of every origin hyperplane, but its deviations
    from its own centroid do not. Exactly identical vectors can never be
    separated (same dot products ⇒ same bits), so exact-duplicate recall
    is unaffected; a cell of truly identical vectors stays oversized and
    falls to the chunked GEMM's linear-memory path. Near-dup pairs that
    land in different sub-cells are missed — the same documented
    clustering-recall trade SemDeDup already makes (Abbas et al., 2023,
    §3: recall is bounded by clustering granularity)."""
    cur = assigned.withColumn("__cell", F.col("__cell").cast("bigint"))
    cent_of: dict[int, list[float]] = {
        i: [float(x) for x in c] for i, c in enumerate(centroids)
    }
    dim = len(centroids[0]) if centroids else 0
    for r in range(rounds):
        counts = {
            row["__cell"]: row["count"]
            for row in cur.groupBy("__cell").count().collect()
        }
        over = sorted(c for c, n in counts.items() if n > max_cell)
        if not over or dim == 0:
            break
        planes = [_det_plane(dim, f"{r}:{j}") for j in range(bits_per_round)]
        shift = 1 << bits_per_round
        new_cent: dict[int, list[float]] = {}
        sub = F.lit(0).cast("bigint")
        for j, h in enumerate(planes):
            dot = _dot_lit(vec_col, h)
            thr = F.lit(0.0)
            for c in over:  # per-cell centroid offset, constant-folded
                t = sum(a * b for a, b in zip(cent_of.get(c, [0.0] * dim), h))
                thr = F.when(F.col("__cell") == c, F.lit(float(t))).otherwise(thr)
            sub = sub + (dot > thr).cast("bigint") * (1 << j)
        cur = cur.withColumn(
            "__cell",
            F.when(F.col("__cell").isin(over),
                   F.col("__cell") * shift + sub)
            .otherwise(F.col("__cell") * shift),
        )
        for c, cent in cent_of.items():
            if c in set(over):
                for b in range(shift):
                    new_cent[c * shift + b] = cent  # children inherit
            else:
                new_cent[c * shift] = cent
        cent_of = new_cent
    return cur


def _semantic_cells(
    embeddings: DataFrame,
    n_cells: int,
    id_col: str,
    vec_col: str,
    centroids: list[list[float]] | None,
    max_cell: int | None,
) -> DataFrame:
    # NULL ids are load-bearing failures here, not excludable rows: the
    # dedup twins drop duplicates via an id anti-join, which never
    # matches NULL — a NULL-id duplicate would silently survive. The
    # assert folds into the id column itself (repeat_by_weight's
    # pattern: assert_true is NULL on pass, coalesce restores the id),
    # so it rides the existing scan and Catalyst cannot prune it.
    ic = F.col(id_col)
    id_type = dict(embeddings.dtypes)[id_col]
    embeddings = embeddings.withColumn(
        id_col,
        F.coalesce(
            F.assert_true(
                ic.isNotNull(),
                F.lit(f"semantic_dedup: NULL {id_col} — row identity "
                      "drives the duplicate anti-join (a NULL-id "
                      "duplicate would silently survive); fill or drop "
                      "NULL ids upstream")).cast(id_type),
            ic))
    assigned, cents = ivf_assign_cells(embeddings, n_cells, id_col, vec_col,
                                       centroids)
    if max_cell is not None:
        assigned = subsplit_oversized_cells(assigned, cents, max_cell,
                                            vec_col=vec_col)
    return assigned


def semantic_dedup(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    max_cell: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023): cluster
    the embedding space, then inside each cluster drop every item that has
    an EARLIER near-identical neighbor (cosine ≥ threshold, smaller id
    survives). Returns the surviving rows of ``embeddings``.

    This is the clustering-bounded alternative to the banded-LSH
    :func:`embedding_near_dup_pairs`: candidate pairs are confined to a
    cell, so pairwise cost is Σ|cell|² ≈ n²/k — the SemDeDup design point
    (k grows with the corpus; at 100 TB cells are the persisted ``__cell``
    partitions and each executor dedups its own cells with zero cross-cell
    traffic). An exact duplicate always lands in its twin's cell (same
    vector → same argmax), so exact-copy recall is structural; near-dup
    recall is bounded by clustering, the method's documented trade.
    Drop rule is per-pair (any earlier neighbor), matching the paper —
    NOT transitive closure. ``max_cell`` caps cell size by hyperplane
    sub-splitting (:func:`subsplit_oversized_cells`) — same knob in both
    twins, so they stay pinned identical when the guard triggers."""
    assigned = _semantic_cells(embeddings, n_cells, id_col, vec_col,
                               centroids, max_cell)
    a = assigned.select(
        F.col("__cell"), F.col(id_col).alias("__a"), F.col(vec_col).alias("__av")
    )
    b = assigned.select(
        F.col("__cell"), F.col(id_col).alias("__b"), F.col(vec_col).alias("__bv")
    )
    dropped = (
        a.join(b, "__cell")
        .where(F.col("__a") > F.col("__b"))
        .where(F.round(cosine(F.col("__av"), F.col("__bv")), 6) >= threshold)
        .select(F.col("__a").alias(id_col))
        .distinct()
    )
    return embeddings.join(dropped, id_col, "left_anti")


def semantic_dedup_batch(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_cells: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: list[list[float]] | None = None,
    max_cell: int | None = None,
) -> DataFrame:
    """Production twin of :func:`semantic_dedup` (pytest-pinned identical):
    the within-cell pairwise cosine runs as numpy GEMMs per cell inside
    ``applyInPandas`` instead of a |cell|² expression-fold join — the same
    codegen-vs-BLAS trade as ``cosine_topk_batch``, ~an order of magnitude
    on wide embeddings. Each cell's members arrive in one group (cells are
    the partitioning unit by design), the GEMM marks every row with an
    EARLIER ≥-threshold neighbor, and survivors anti-join back.

    Memory shape (the r6 verdict's latent scale-killer, fixed): the GEMM
    runs in row chunks of ``_GEMM_CHUNK``, so the similarity buffer is
    O(chunk × |cell|), never |cell|² — chunking is exact, it changes
    nothing but peak memory. The group's own arrival (|cell| × dim) is the
    remaining linear floor, and ``max_cell`` bounds THAT by hyperplane
    sub-splitting oversized cells before the shuffle
    (:func:`subsplit_oversized_cells` — same knob on both twins)."""
    import numpy as np

    assigned = _semantic_cells(embeddings, n_cells, id_col, vec_col,
                               centroids, max_cell)

    id_type = dict(embeddings.dtypes)[id_col]

    def drop_in_cell(pdf):
        import pandas as pd

        # object dtype: ids keep their input type (string doc ids are
        # the corpus norm, round 12); "earlier" = smaller in the id's
        # own order, same rule both engines use
        ids = pdf[id_col].to_numpy(dtype=object)
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        v = np.array(pdf[vec_col].tolist(), dtype=np.float64)[order]
        norm = np.sqrt((v * v).sum(axis=1))
        safe = np.where(norm == 0.0, 1.0, norm)
        n = len(ids)
        zero = norm == 0.0
        hit = np.zeros(n, dtype=bool)
        for lo in range(0, n, _GEMM_CHUNK):
            hi = min(lo + _GEMM_CHUNK, n)
            # rows lo:hi vs ALL earlier columns (< hi): chunked exact
            # equivalent of tril(sims >= t, k=-1).any(axis=1). Same
            # dot-then-divide fp order as the unchunked form (and the
            # oracle), so rounding at the 6th decimal cannot diverge.
            sims = np.round(
                (v[lo:hi] @ v[:hi].T)
                / (safe[lo:hi, None] * safe[None, :hi]), 6)
            sims[zero[lo:hi], :] = -np.inf  # zero-norm: cosine undefined
            sims[:, zero[:hi]] = -np.inf
            mask = np.tril(np.ones((hi - lo, hi), dtype=bool), k=lo - 1)
            hit[lo:hi] = ((sims >= threshold) & mask).any(axis=1)
        return pd.DataFrame({id_col: ids[hit]})

    dropped = (
        assigned.select("__cell", id_col, vec_col)
        .groupBy("__cell")
        .applyInPandas(drop_in_cell, f"{id_col} {id_type}")
    )
    return embeddings.join(dropped, id_col, "left_anti")


def embedding_decontaminate(
    embeddings: DataFrame,
    eval_embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    eval_id_col: str = "vec_id",
    eval_vec_col: str = "embedding",
) -> DataFrame:
    """Semantic decontamination: drop every corpus row whose embedding is
    within cosine ``threshold`` of ANY eval-set embedding — the
    embedding-space sibling of the n-gram ``decontaminate`` operator
    (paraphrased benchmark leakage that shares no shingles still collides
    in embedding space). Returns the surviving corpus rows.

    Scale shape = the contamination asymmetry: the eval set is KBs-to-MBs
    while the corpus is the 100 TB side, so the eval matrix ships in the
    mapInPandas closure (same bounded-driver-collect class as the chunk
    planner) and each Arrow batch does ONE numpy GEMM against it — the
    corpus is never shuffled, never self-joined. Scores round to 6
    decimals before the threshold compare so the oracle agrees exactly;
    zero-norm vectors on either side never match (cosine undefined)."""
    import numpy as np

    qrows = eval_embeddings.select(eval_id_col, eval_vec_col).collect()
    if qrows:
        qm = np.array([[float(x) for x in r[eval_vec_col]] for r in qrows],
                      dtype=np.float64)
        qnorm = np.sqrt((qm * qm).sum(axis=1))
        nzq = qnorm != 0.0  # zero-norm eval vectors can never match
        qm, qnorm = qm[nzq], qnorm[nzq]
    else:
        qm, qnorm = np.zeros((0, 0)), np.zeros(0)
    keep_all = qm.shape[0] == 0

    def contaminated(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty or keep_all:
                continue
            if pdf[id_col].isna().any():
                # identity drives the anti-join, which never matches
                # NULL: a contaminated NULL-id row would silently
                # SURVIVE decontamination — the one failure mode a
                # contamination gate must not have. pd.isna catches
                # both None (string ids) and the NaN a nullable int
                # column becomes through Arrow.
                raise ValueError(
                    f"embedding_decontaminate: NULL {id_col} in corpus "
                    "— row identity drives the drop anti-join; fill or "
                    "drop NULL ids upstream")
            # object dtype: ids pass through in their input type
            # (string doc ids are the corpus norm, round 12)
            ids = pdf[id_col].to_numpy(dtype=object)
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vnorm = np.sqrt((v * v).sum(axis=1))
            nz = vnorm != 0.0
            if not nz.any():
                continue
            ids, v, vnorm = ids[nz], v[nz], vnorm[nz]
            sims = np.round(
                (v @ qm.T) / (vnorm[:, None] * qnorm[None, :]), 6
            )
            hit = ids[(sims >= threshold).any(axis=1)]
            if len(hit):
                yield pd.DataFrame({id_col: hit})

    dropped = embeddings.select(id_col, vec_col).mapInPandas(
        contaminated, f"{id_col} {dict(embeddings.dtypes)[id_col]}"
    )
    return embeddings.join(dropped, id_col, "left_anti")


def embedding_pairs_exact(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact (id_a, id_b, cosine_sim) for every pair with cosine ≥ threshold
    — the O(n²) ground-truth baseline the LSH path is measured against
    (recall asserted in pytest, values oracle-checked in DuckDB). Use the
    banded LSH variant below for corpora where n² is off the table."""
    n = embeddings.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v")
    )
    a = n.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = n.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    pairs = a.crossJoin(b).where(F.col("id_a") < F.col("id_b"))
    scored = pairs.select(
        "id_a", "id_b", F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cosine_sim")
    )
    return scored.where(F.col("cosine_sim") >= threshold)


def embedding_near_dup_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    dim: int = 64,
    num_planes: int = 16,
    bands: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """(id_a, id_b, cosine_sim) for pairs with cosine ≥ threshold, found via
    **banded** hyperplane-signature buckets then exact re-score.

    Banding (same pigeonhole as SimHash/MinHash): the ``num_planes``-bit
    signature splits into ``bands`` sub-keys of ``num_planes // bands`` bits;
    a pair collides if ANY band matches. At the 0.95 design point with
    16 planes / 4 bands, per-band match ≈ 0.9⁴ ≈ 0.66 and pair recall
    ≈ 1-(1-0.66)⁴ ≈ 0.99 — versus ≈ 0.43 for the old exact-full-signature
    join, which silently dropped near-dups. Precision is always exact:
    every candidate is re-scored with the real cosine.

    Shuffle shape: explode to (band, key, id) — ``bands`` rows per vector,
    16-byte keys; the self-join is on (band, key); vectors join back only
    for surviving deduped candidate pairs."""
    rows_per_band = num_planes // bands
    mask = (1 << rows_per_band) - 1
    sig = embeddings.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.expr(_sig_sql(qcol(vec_col), dim, num_planes)).alias("sig"),
    )
    banded = sig.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bnd).alias("band"),
                        F.shiftright("sig", bnd * rows_per_band)
                        .bitwiseAND(F.lit(mask))
                        .alias("key"),
                    )
                    for bnd in range(bands)
                ]
            )
        ).alias("bk"),
    ).select("id", F.col("bk.band").alias("band"), F.col("bk.key").alias("key"))
    a = banded.select("band", "key", F.col("id").alias("id_a"))
    b = banded.select("band", "key", F.col("id").alias("id_b"))
    pairs = (
        a.join(b, ["band", "key"])
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .dropDuplicates(["id_a", "id_b"])
    )
    side_a = sig.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    side_b = sig.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    scored = (
        pairs.join(side_a, "id_a")
        .join(side_b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.round(cosine(F.col("v_a"), F.col("v_b")), 6).alias("cosine_sim"),
        )
    )
    return scored.where(F.col("cosine_sim") >= threshold)


def feature_hash_embedding(
    df,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 64,
    hash_fn: str = "xxhash64",
):
    """Signed feature hashing (Weinberger et al. 2009): each token lands in
    bucket ``hash(w) mod dim`` with sign ``±1`` from an independent hash
    bit; the per-doc bucket sums form a ``dim``-wide integer embedding —
    the model-free bridge from raw text into this module's similarity
    stack (cosine top-k, SemDeDup cells, decontamination all accept it
    after a float cast). Inner products are unbiased kernel estimates, so
    near-duplicate text gets near-parallel vectors.

    Returns (id, embedding array<bigint>). All-integer and deterministic —
    ``hash_fn="sha256"`` uses the engine-portable 60-bit hash the DuckDB
    oracle replays bit-exactly.

    Scale: one explode → (id, bucket) groupBy with map-side partials (the
    wire carries 16-byte pairs, never text) → one id groupBy to assemble
    the array. Two exchanges, both on compact keys; at 100 TB this is the
    cheapest embedding there is.
    """
    from pyspark.sql import functions as F

    from mydumper_spark.operators.dedup import tokens
    from mydumper_spark.operators.text import portable_hash64

    base = df.select(
        F.col(id_col),
        tokens(F.coalesce(F.col(text_col), F.lit(""))).alias("__toks"),
    )
    w = F.col("w")
    if hash_fn == "xxhash64":
        h = F.xxhash64(w)
        sign_bit = F.pmod(F.xxhash64(w, F.lit(1)), F.lit(2))
    elif hash_fn == "sha256":
        h = portable_hash64(w)
        # an independent nibble of the same digest (position 16, past the
        # 15 the bucket hash consumes)
        sign_bit = F.pmod(
            F.conv(F.substring(F.sha2(w, 256), 16, 1), 16, 10).cast("bigint"),
            F.lit(2))
    else:
        raise ValueError(f"unknown hash_fn: {hash_fn!r}")
    entries = base.select(
        F.col(id_col), F.explode("__toks").alias("w")
    ).where(w != "")
    sums = entries.select(
        F.col(id_col),
        F.pmod(h, F.lit(dim)).alias("bucket"),
        F.when(sign_bit == 0, F.lit(1)).otherwise(F.lit(-1)).alias("s"),
    ).groupBy(id_col, "bucket").agg(F.sum("s").alias("v"))
    assembled = sums.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct("bucket", "v"))).alias("__m")
    ).select(
        F.col(id_col),
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda i: F.coalesce(F.element_at("__m", i.cast("bigint")), F.lit(0)),
        ).alias("embedding"),
    )
    # empty/NULL-text docs have no entries — they still get a row (zeros)
    return base.select(id_col).join(assembled, id_col, "left").select(
        F.col(id_col),
        F.coalesce(
            "embedding",
            F.array_repeat(F.lit(0).cast("bigint"), dim)).alias("embedding"),
    )


# --- SQ8 scalar quantization (symmetric int8, the ScaNN/FAISS-SQ practice) --


def train_sq8_scale(df: DataFrame, vec_col: str = "embedding") -> float:
    """The SQ8 codebook is ONE number: the corpus-wide max |component|.
    Symmetric quantization (code = round(127·x/scale), no per-dimension
    offset) is what keeps the INTEGER dot product a faithful ranking:
    Σ c_j·qc_j = (127/scale)²·Σ x_j·q_j + bounded noise — a positive
    rescale of the true dot. An offset (min/max affine) form would add
    per-dimension constants to every product and destroy the ranking;
    FAISS only uses affine codes by DEQUANTIZING before distances.
    One aggregate job, one double to the driver."""
    row = df.agg(F.max(F.aggregate(
        F.col(vec_col),
        F.lit(0.0),
        lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))),
    )).alias("s")).first()
    return float(row["s"] or 0.0)


def _sq8_code_expr(e: Column, scale: float) -> Column:
    """One dimension\'s signed 8-bit code: floor(x·127/scale + 0.5) clamped
    to [−127, 127]. Every step is deterministic IEEE double arithmetic in
    a fixed association order — the DuckDB oracle and the Python
    query-side twin (:func:`sq8_quantize`) reproduce it bit-exactly, so
    the integer dot-product ranking is cross-engine exact (the repo-wide
    float rule: floats may only appear where both engines run the
    identical op sequence; ranking then happens on integers)."""
    if not scale > 0.0:  # degenerate corpus (all-zero / empty) → 0
        return F.lit(0).cast("bigint")
    scaled = e * F.lit(127.0) / F.lit(scale)
    return F.greatest(
        F.lit(-127).cast("bigint"),
        F.least(F.lit(127).cast("bigint"), F.floor(scaled + F.lit(0.5))),
    )


def sq8_quantize(vec, scale: float) -> list[int]:
    """Python twin of :func:`_sq8_code_expr` for the driver-side query
    vector — same IEEE ops in the same order, so the query\'s codes equal
    what the corpus-side expression produces for the same vector."""
    import math

    if not scale > 0.0:
        return [0] * len(vec)
    return [max(-127, min(127, int(math.floor(float(v) * 127.0 / scale
                                              + 0.5))))
            for v in vec]


def sq8_encode(
    df: DataFrame,
    scale: float,
    vec_col: str = "embedding",
    code_col: str = "sq8_code",
) -> DataFrame:
    """Materialize the SQ8 codes as ``array<smallint>`` — 4× smaller than
    float32 on disk/in memory (the reason SQ8 exists): encode once, then
    every query scans codes instead of floats. Pure scan-side codegen."""
    e = F.col(vec_col)
    codes = F.transform(
        e, lambda x: _sq8_code_expr(x.cast("double"), scale).cast("smallint")
    )
    return df.withColumn(code_col, codes)


def sq8_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    scale: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k by INTEGER dot product of symmetric int8
    quantized vectors (the SQ8 index family: FAISS ScalarQuantizer /
    ScaNN int8): rank by Σ_j qcode_j·code_j. The ranking is exact integer
    arithmetic — bit-identical across engines with no round() tie hazard
    (what the cosine baseline needs round(…,6) to dodge) — and the
    approximation error is the quantization itself: ±½ bucket of
    scale/127 per component.

    Scale shape: zero joins, zero shuffles — quantization + dot product
    are one codegen projection over the scan (query codes constant-folded
    like IVF centroids/PQ LUTs), topped by TakeOrdered. On an encoded
    corpus (:func:`sq8_encode`) the scan reads 1 byte/dim instead of 4.

    Overflow: |code| ≤ 127 → per-term ≤ 16129 → BIGINT-safe past 5e14
    dimensions."""
    scale = scale if scale is not None else train_sq8_scale(df, vec_col)
    qc = sq8_quantize(query_vec, scale)
    # one array fold, NOT a per-dimension unrolled sum: 64 unrolled
    # element_at+floor terms blow the generated method past the JIT's
    # 64 KB limit and the whole projection falls back to interpreted
    # evaluation (observed 13s vs 1s at sf0.1 — the round-5 PQ lesson)
    qlit = F.array(*[F.lit(int(c)).cast("bigint") for c in qc])
    total = F.aggregate(
        F.zip_with(
            F.transform(F.col(vec_col),
                        lambda x: _sq8_code_expr(x.cast("double"), scale)),
            qlit,
            lambda c, q: c * q,
        ),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = df.select(
        F.col(id_col), total.cast("bigint").alias("sq8_score"))
    return scored.orderBy(
        F.col("sq8_score").desc(), F.col(id_col).asc()).limit(k)


def write_sq8_index(
    embeddings: DataFrame,
    path: str,
    scale: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Persist the SQ8 index: codes-only parquet (1 byte/dim vs 4 — the
    scan a query pays shrinks 4×) plus the training scale in a sidecar.
    Returns the scale (pass it to :func:`sq8_topk_indexed`, or let that
    read the sidecar)."""
    import json
    import os

    scale = scale if scale is not None else train_sq8_scale(
        embeddings, vec_col)
    sq8_encode(embeddings, scale, vec_col).select(
        id_col, "sq8_code"
    ).write.mode("overwrite").parquet(path)
    with open(os.path.join(path, "_sq8_meta.json"), "w") as f:
        json.dump({"scale": scale}, f)
    return scale


def sq8_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    scale: float | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """Query the persisted SQ8 index: identical ranking to the inline
    :func:`sq8_topk` (pytest-pinned) but the scan reads ONLY (id, codes)
    — no float vectors move at all. The dot product folds the query codes
    into a codegen fold over the smallint array."""
    import json
    import os

    if scale is None:
        with open(os.path.join(path, "_sq8_meta.json")) as f:
            scale = float(json.load(f)["scale"])
    qc = sq8_quantize(query_vec, scale)
    qlit = F.array(*[F.lit(int(c)).cast("bigint") for c in qc])
    df = spark.read.parquet(path)
    total = F.aggregate(
        F.zip_with(F.col("sq8_code"), qlit,
                   lambda c, q: c.cast("bigint") * q),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
    scored = df.select(F.col(id_col), total.alias("sq8_score"))
    return scored.orderBy(
        F.col("sq8_score").desc(), F.col(id_col).asc()).limit(k)


# --- index maintenance under incremental growth ----------------------------
#
# The steady-state LLM pipeline (daemon + incremental dumps) grows the
# embeddings table every snapshot; rebuilding a persisted index from
# scratch per delta would cost a full corpus re-encode. The append path
# encodes ONLY the delta with the index's FROZEN training artifacts (SQ8
# scale / IVF centroids / ANN hyperplanes) — the same persisted-artifact
# contract save_bpe/load_bpe established — so indexed queries over
# base+delta are bit-identical to inline queries over the union at the
# frozen parameters. The price of freezing is drift: the staleness probe
# below measures it and says when to retrain.


def append_sq8_index(
    delta: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> float:
    """Append a delta's codes to a persisted SQ8 index using the FROZEN
    training scale from the index sidecar — never retrained here, because
    two scales in one codes file would break the integer-dot ranking
    (codes are only comparable under one scale). One encode pass over the
    delta, appended parquet, sidecar append-count bumped. Returns the
    frozen scale."""
    import json
    import os

    meta_path = os.path.join(path, "_sq8_meta.json")
    with open(meta_path) as f:
        meta = json.load(f)
    scale = float(meta["scale"])
    sq8_encode(delta, scale, vec_col).select(
        id_col, "sq8_code"
    ).write.mode("append").parquet(path)
    meta["appends"] = int(meta.get("appends", 0)) + 1
    with open(meta_path, "w") as f:
        json.dump(meta, f)
    return scale


def append_ivf_index(
    delta: DataFrame,
    path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a delta to a persisted IVF index: assign cells with the
    FROZEN centroids (the ones persisted next to the index — retraining
    here would orphan every existing row's assignment) and append into
    the same ``__cell`` partition layout; partition-pruned queries see
    base and delta rows alike."""
    assigned, _ = ivf_assign_cells(delta, id_col=id_col, vec_col=vec_col,
                                   centroids=centroids)
    assigned.write.mode("append").partitionBy("__cell").parquet(path)


def append_ann_index(
    delta: DataFrame,
    path: str,
    dim: int,
    num_planes: int = 16,
    band_bits: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Append a delta to a persisted hyperplane-ANN index. The planes are
    deterministic functions of (plane index, dim) — nothing is trained —
    so the only contract is calling with the SAME num_planes/band_bits
    the index was built with; signatures then land in the identical band
    partitioning."""
    sig = F.expr(_sig_sql(qcol(vec_col), dim, num_planes))
    indexed = delta.withColumn("__sig", sig).withColumn(
        "sig_band", F.col("__sig").bitwiseAND(F.lit((1 << band_bits) - 1))
    )
    indexed.write.mode("append").partitionBy("sig_band").parquet(path)


def sq8_index_staleness(
    current: DataFrame,
    scale: float | None = None,
    path: str | None = None,
    vec_col: str = "embedding",
    clip_ppm_max: int = 1000,
    min_range_utilization: float = 0.5,
) -> dict:
    """How stale is a frozen SQ8 scale against the CURRENT corpus? Two
    distortion signals, both from ONE aggregate over the corpus:

    - ``clip_ppm`` — ppm of vector components whose |x| exceeds the
      frozen scale: those saturate at ±127 and their dot-product
      contribution flattens (ranking fidelity loss for exactly the
      outlier mass a drifted corpus grows).
    - ``range_utilization`` — current max-|component| / frozen scale:
      well below 1 means the corpus shrank into a sliver of the int8
      range and quantization steps are needlessly coarse.

    ``retrain_recommended`` fires when either crosses its threshold —
    the signal the daemon's incremental loop checks before deciding
    between :func:`append_sq8_index` and a fresh :func:`write_sq8_index`."""
    import json
    import os

    if scale is None:
        if path is None:
            raise ValueError("pass the frozen scale or the index path")
        with open(os.path.join(path, "_sq8_meta.json")) as f:
            scale = float(json.load(f)["scale"])
    e = F.col(vec_col)
    clipped = F.size(F.filter(
        e, lambda x: F.abs(x.cast("double")) > F.lit(float(scale))))
    maxabs = F.aggregate(
        e, F.lit(0.0), lambda acc, x: F.greatest(acc, F.abs(x.cast("double"))))
    row = current.agg(
        F.sum(clipped).alias("clipped"),
        F.sum(F.size(e)).alias("components"),
        F.max(maxabs).alias("current_scale"),
    ).first()
    components = int(row["components"] or 0)
    clip_ppm = (1_000_000 * int(row["clipped"] or 0) // components
                if components else 0)
    current_scale = float(row["current_scale"] or 0.0)
    utilization = current_scale / scale if scale > 0 else 0.0
    return {
        "frozen_scale": float(scale),
        "current_scale": current_scale,
        "clip_ppm": clip_ppm,
        "range_utilization": utilization,
        "retrain_recommended": bool(
            clip_ppm > clip_ppm_max or utilization < min_range_utilization),
    }


def centroid_distance(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
) -> DataFrame:
    """Per-vector cosine to its own group's MEAN embedding, computed
    engine-portably exact — the similarity signal behind prototype
    pruning (SemDeDup's within-cluster redundancy, Abbas et al. 2023, and
    D4's dense-region pruning, Tirumala et al. 2023).

    Cross-row float averaging is NOT cross-engine reproducible (sum order
    differs), so the centroid never materializes as floats: each value
    quantizes to integer ppm, the centroid numerator is an exact
    DECIMAL(38,0) per-dimension SUM, and the count cancels out of the
    cosine algebraically —

        cos(v, s/n) = Σ vᵢsᵢ / (√(Σ vᵢ²) · √(Σ sᵢ²))

    — leaving only correctly-rounded sqrt/div on identical exact
    integers in both engines (DuckDB mirrors with HUGEINT).

    Scale shape: one exchange of (label, pos, ppm) for the centroid sums
    (dim × n tiny rows, map-side combined), one broadcast join back
    (#labels rows), per-row fold for the dot — no window, no pairwise
    work. Returns (id, label, centroid_cos)."""
    from pyspark.sql import types as T

    dec = T.DecimalType(38, 0)
    vppm = F.transform(
        F.col(vec_col),
        lambda x: F.round(x.cast("double") * 1_000_000, 0).cast(dec))
    base = embeddings.select(
        F.col(id_col), F.col(label_col), vppm.alias("__v"))
    cent = (base.select(label_col, F.posexplode("__v").alias("pos", "val"))
            .groupBy(label_col, "pos")
            .agg(F.sum("val").cast(dec).alias("s")))
    carr = cent.groupBy(label_col).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "s"))),
            lambda st: st["s"]).alias("__s"))
    carr = carr.select(
        label_col, "__s",
        F.aggregate("__s", F.lit(0).cast(dec),
                    lambda acc, x: acc + x * x).alias("__sumsq_s"))
    joined = base.join(F.broadcast(carr), on=label_col)
    dot = F.aggregate(
        F.zip_with("__v", "__s", lambda a, b: a * b),
        F.lit(0).cast(dec), lambda acc, x: acc + x)
    sumsq_v = F.aggregate(
        F.transform("__v", lambda x: x * x),
        F.lit(0).cast(dec), lambda acc, x: acc + x)
    # zero-norm guard, mirrored verbatim in the oracle SQL: a zero
    # vector (or an all-zero centroid) has no defined cosine — emit NULL
    # on both engines instead of letting IEEE NaN/Inf diverge between
    # Spark and DuckDB ordering semantics
    denom_ok = (sumsq_v > 0) & (F.col("__sumsq_s") > 0)
    return joined.select(
        F.col(id_col), F.col(label_col),
        F.when(
            denom_ok,
            F.round(
                dot.cast("double")
                / (F.sqrt(sumsq_v.cast("double"))
                   * F.sqrt(F.col("__sumsq_s").cast("double"))),
                6)).alias("centroid_cos"))


def centroid_prune(
    embeddings: DataFrame,
    prune_ppm: int = 250_000,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    exact: bool = True,
) -> DataFrame:
    """Prototype pruning over :func:`centroid_distance`: within each
    group, mark the ``prune_ppm``/1e6 fraction of vectors MOST similar to
    the group mean as redundant (``keep = false``) — the D4 recipe
    (dense cluster interiors teach the least); the exact-integer
    ``(n · prune_ppm) DIV 1e6`` cutoff and (cos desc, id) tie order make
    the kept set engine-portable.

    Scale shape, ``exact=True``: centroid_distance's plan plus ONE window
    partitioned by label. A label spanning a large corpus shard makes
    that window the cost center — every web corpus has a dominant label.

    ``exact=False`` (round 12; fully distributed round 13) is the
    promised approximate score-quantile cutoff for that skew (the
    budget_select trade, sampling.py): the cosine is already quantized
    to 6 decimals, so a (label, cos_ppm) COUNT histogram — map-side
    combined, cardinality bounded by labels × 2e6 ppm buckets, never
    corpus size — locates each label's threshold bucket via a
    cumulative-sum window over the HISTOGRAM rows (nothing ever
    materializes on the driver), and pruning becomes a broadcast join
    + scan-side comparison: NO window and NO per-label sort ever
    touches corpus rows. The boundary bucket is KEPT whole, so the approx arm
    under-prunes by at most that one bucket's population (zero when the
    label's cosines are tie-free at 1e-6 granularity — then both arms
    agree row-for-row, which the parity test pins); within-bucket id
    tie-breaks are the only semantics it gives up. NULL-cosine
    (zero-norm) rows: the approx arm NEVER prunes them; the exact arm
    ranks them last (NULLS LAST) and so reaches them only when the
    cutoff exceeds the label's non-NULL count (prune_ppm near 1e6 on a
    zero-norm-heavy label) — the one documented divergence beyond the
    boundary bucket, pinned in the parity test.

    Pick the arm by label shape: the approx histogram is
    O(labels × distinct cos_ppm) ≤ labels × 2e6 rows — corpus-size-
    independent — and its threshold walk shuffles ONLY those rows, so
    it is the arm for FEW dominant labels (the skew case the corpus
    window chokes on); with very many small labels the per-label window
    is already balanced and exact stays the right default."""
    from pyspark.sql.window import Window

    scored = centroid_distance(embeddings, id_col, vec_col, label_col)
    if exact:
        # NULLS LAST explicitly: zero-norm vectors (NULL cosine) rank
        # least prototypical on both engines (Spark desc defaults
        # nulls-last, DuckDB defaults the same — pinned, not assumed)
        w = Window.partitionBy(label_col).orderBy(
            F.col("centroid_cos").desc_nulls_last(), F.col(id_col).asc())
        wn = Window.partitionBy(label_col)
        return (scored
                .withColumn("__rn", F.row_number().over(w))
                .withColumn("__n", F.count(F.lit(1)).over(wn))
                .select(
                    id_col, label_col, "centroid_cos",
                    (F.col("__rn") > F.expr(
                        f"(__n * {int(prune_ppm)}) DIV 1000000"))
                    .alias("keep")))

    cppm = F.round(F.col("centroid_cos") * 1_000_000, 0).cast("bigint")
    scored = scored.withColumn("__cppm", cppm)
    # two consumers read `scored` (the histogram below and the final
    # join): without a checkpoint the whole centroid-scoring pass —
    # explode + exact-decimal sums over every vector — runs TWICE.
    # A lazy local checkpoint materializes the tiny (id, label, cos,
    # ppm) projection once on first action and both consumers share it
    # (the x_text_curate multi-consumer pattern); lazy, so constructing
    # the plan still runs no job.
    scored = scored.localCheckpoint(eager=False)
    # the threshold walk is a per-label cumulative sum over the (label,
    # cos_ppm) COUNT histogram — an already-tiny aggregate (≤ labels ×
    # 2e6 rows, corpus-size-independent), so it runs DISTRIBUTED: a
    # window over the histogram DataFrame, never a driver collect (a
    # "few dominant labels" corpus with dense cosines would otherwise
    # materialize millions of Rows on the driver — round-12 verdict #1).
    # Shuffled: histogram rows only. The walk, declaratively: descending
    # by bucket, the threshold is the FIRST bucket whose inclusive
    # running count exceeds target = (n · prune_ppm) DIV 1e6 — i.e. the
    # MAX such bucket — and that boundary bucket is KEPT whole
    # (under-prune, never over-prune). n counts NULL-cosine rows too
    # (they are part of the label's population; the exact arm ranks
    # them last the same way).
    from pyspark.sql.window import Window as _W

    hist = (scored.groupBy(label_col, "__cppm")
            .agg(F.count(F.lit(1)).alias("__c")))
    # per-label population via a window over the SAME histogram rows —
    # a window partition groups NULL labels together (a string-`on`
    # join would silently drop them), and no extra exchange: the
    # cumulative-sum window below shares the label partitioning
    hist = hist.withColumn(
        "__n", F.sum("__c").over(_W.partitionBy(label_col)))
    wcum = (_W.partitionBy(label_col).orderBy(F.col("__cppm").desc())
            .rowsBetween(_W.unboundedPreceding, _W.currentRow))
    nn = (hist.where(F.col("__cppm").isNotNull())
          .withColumn("__cum", F.sum("__c").over(wcum))
          .withColumn(
              "__over",
              F.col("__cum") > F.expr(
                  f"(__n * {int(prune_ppm)}) DIV 1000000")))
    thr_df = (nn.groupBy(label_col)
              .agg(
                  F.max(F.when(F.col("__over"), F.col("__cppm")))
                  .alias("__hit"),
                  F.min("__cppm").alias("__min"))
              # no bucket exceeds target (prune_ppm→1e6 swallows every
              # non-NULL bucket): prune them all; NULL cosines still
              # survive via the isNull arm below
              .select(
                  F.col(label_col).alias("__lab"),
                  F.coalesce("__hit", F.col("__min") - 1)
                  .alias("__thr")))
    joined = scored.join(
        F.broadcast(thr_df),
        F.col(label_col).eqNullSafe(F.col("__lab")), "left")
    return joined.select(
        id_col, label_col, "centroid_cos",
        F.when(F.col("__cppm").isNull(), F.lit(True))
        .otherwise(~(F.col("__cppm") > F.col("__thr")))
        .alias("keep"))


def hard_negative_topk(
    embeddings: DataFrame,
    anchors: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    max_anchors: int = 65_536,
) -> DataFrame:
    """Contrastive hard-negative mining: for each anchor vector, the k
    corpus vectors MOST cosine-similar among those carrying a DIFFERENT
    label — the negatives that sit closest to the decision boundary
    (in-batch negatives are easy; hard ones come from a corpus sweep).

    Same GEMM shape as :func:`cosine_topk_batch` (one corpus pass, numpy
    matrix product per Arrow batch, local top-k per anchor, global
    window over ~partitions×k candidates) with the label mask applied
    BEFORE the local top-k — masking after would let same-label rows
    consume candidate slots. Scores round to 6 decimals and tie-break by
    id, so the ranking is engine-portable. Returns (anchor_id, vec_id,
    cosine_sim), k rows per anchor (fewer if the corpus lacks k
    off-label rows).

    Ids and labels keep their INPUT Spark types end-to-end (string doc
    ids and string labels are the labeled-corpus norm — round 12; the
    int64 coercion this replaces crashed on them): the output schema is
    derived from the inputs, the mask compares native values, and
    tie-breaks follow codepoint order for strings on both engines.
    Corpus rows with a NULL id or NULL label are EXCLUDED — an unknown
    label cannot be certified a different label; anchors with NULL
    id/label raise (the caller owns its training batch).

    Anchors are driver-collected (a training batch, bounded by contract);
    ``max_anchors`` enforces that contract loudly instead of letting a
    whole-corpus anchors frame OOM the driver — and the anchor matrix is
    also the per-task broadcast cost, so the cap protects executors too."""
    import numpy as np

    arows = (anchors.select(id_col, vec_col, label_col)
             .limit(int(max_anchors) + 1).collect())
    if len(arows) > max_anchors:
        raise ValueError(
            f"hard_negative_topk: anchors exceed max_anchors="
            f"{int(max_anchors)} — anchors are a driver-collected "
            "training batch, not a corpus; mine in batches or raise "
            "max_anchors explicitly if the driver can hold them")
    bad_null = [r[id_col] for r in arows
                if r[id_col] is None or r[label_col] is None]
    if bad_null:
        raise ValueError(
            f"hard_negative_topk: anchor rows with NULL id/label "
            f"(ids {bad_null[:5]}) — anchors must be fully labeled")
    aids = np.array([r[id_col] for r in arows], dtype=object)
    alab = np.array([r[label_col] for r in arows], dtype=object)
    am = np.array([[float(x) for x in r[vec_col]] for r in arows],
                  dtype=np.float64)
    anorm = np.sqrt((am * am).sum(axis=1))
    if np.any(anorm == 0.0):
        bad = aids[anorm == 0.0].tolist()
        raise ValueError(
            f"zero-norm anchor vector(s): {bad} — cosine undefined")
    atypes = dict(anchors.dtypes)
    ctypes = dict(embeddings.dtypes)
    schema = (f"anchor_id {atypes[id_col]}, {id_col} {ctypes[id_col]}, "
              "cosine_sim double")

    def score(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            ids = pdf[id_col].to_numpy(dtype=object)
            labs = pdf[label_col].to_numpy(dtype=object)
            v = np.array(pdf[vec_col].tolist(), dtype=np.float64)
            vnorm = np.sqrt((v * v).sum(axis=1))
            keep = vnorm != 0.0  # zero-norm: cosine undefined
            if not keep.all():
                ids, labs, v, vnorm = (ids[keep], labs[keep], v[keep],
                                       vnorm[keep])
            if len(ids) == 0:
                continue
            sims = np.round(
                (v @ am.T) / (vnorm[:, None] * anorm[None, :]), 6)
            out_a, out_id, out_s = [], [], []
            for ai in range(len(aids)):
                col = sims[:, ai]
                ok = labs != alab[ai]          # the mask IS the operator
                if not ok.any():
                    continue
                cids, csims = ids[ok], col[ok]
                order = np.lexsort((cids, -csims))[:k]
                out_a.extend([aids[ai]] * len(order))
                out_id.extend(cids[order])
                out_s.extend(csims[order])
            yield pd.DataFrame(
                {"anchor_id": out_a, id_col: out_id, "cosine_sim": out_s})

    # NULL id/label exclusion happens DECLARATIVELY, before Arrow: a
    # nullable int column reaches pandas as float64 with NaN — an
    # `is None` check in the closure silently passes NaN, certifying an
    # unknown label as off-label, and round-trips large ids lossily.
    # Filtering in the plan keeps both columns' dtypes intact.
    cand = (embeddings.select(id_col, vec_col, label_col)
            .where(F.col(id_col).isNotNull()
                   & F.col(label_col).isNotNull())
            .mapInPandas(score, schema))
    from pyspark.sql.window import Window

    w = Window.partitionBy("anchor_id").orderBy(
        F.col("cosine_sim").desc(), F.col(id_col).asc())
    return (cand.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k).drop("__rn"))
