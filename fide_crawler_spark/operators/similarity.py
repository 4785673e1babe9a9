"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — brute-force exact top-k against a query vector.
  The dot product and norms are JVM higher-order expressions
  (``zip_with`` + ``aggregate``): fully codegen'd, no Python, scales as
  one scan + TakeOrderedAndProject (no full sort).
* ``ann_topk_ivf`` — IVF-style approximate variant: vectors are
  pre-assigned to ``n_cells`` centroid cells (seeded spherical k-means
  refined on a deterministic hash-sample; the full corpus passes
  through the Python assignment exactly once); queries probe only the
  ``n_probe`` nearest cells.  The scale path: cell assignment
  partitions/clusters the table so a query scans
  |table| × n_probe / n_cells.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine_scores(
    emb: DataFrame,
    query_vec: list[float],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(query_vec)) or 1.0
    cos = _dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))
    # floor-round: ROUND(double) differs between engines on ...5 halves
    return emb.select(
        F.col(id_col),
        (F.floor(cos * 10000 + F.lit(0.5)) / 10000).alias("cosine"),
    )


def cosine_topk(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact brute-force top-k by cosine; ties broken by id so the
    result is total-ordered (deterministic under any parallelism)."""
    scored = cosine_scores(emb, query_vec, id_col, vec_col)
    return scored.orderBy(F.desc("cosine"), F.asc(id_col)).limit(k)


def kmeans_cells(
    emb: DataFrame,
    n_cells: int = 16,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 2,
    refine_fraction: float = 0.25,
) -> tuple[DataFrame, np.ndarray]:
    """IVF cell assignment: seeded-sample centroids refined by
    ``lloyd_iters`` distributed *spherical* k-means rounds, then ONE
    final vectorized argmax assignment over the full corpus.

    Scale shape: the Lloyd rounds run on a deterministic hash-sample
    (``refine_fraction`` of the corpus, md5-threshold filter — no
    shuffle, stable under any partitioning), so the full corpus flows
    through the Python assignment exactly once, at the end.  At 10⁹+
    vectors centroid refinement only needs a representative sample;
    paying a full-corpus pass per Lloyd round is pure waste.

    Spherical update: each row is unit-normalized JVM-side (divide by
    its own norm inside the ``transform`` before ``posexplode``) so the
    dimension-wise mean is a mean of directions — a high-norm vector no
    longer dominates the centroid.  Refinement is pure JVM aggregation:
    one shuffle of (n_cells × dim) partial sums per round, and only the
    (n_cells × dim) mean table ever reaches the driver.  No per-cell
    applyInPandas (a hot cell would be one task)."""
    from fide_crawler_spark.operators.sampling import hash_sample

    # Seed centroids: first n_cells rows in md5(id‖'ivf-seed') order.
    # md5 (not xxhash64) so the whole pipeline — seeding, Lloyd sample,
    # refinement, final assignment — replays bit-for-bit in any engine
    # with md5 + list arithmetic (q32's DuckDB oracle unrolls it).
    seed_h = F.md5(F.concat(F.col(id_col).cast("string"), F.lit("ivf-seed")))
    sample = (
        emb.select(vec_col, seed_h.alias("__h"), F.col(id_col))
        .orderBy("__h", id_col)
        .limit(n_cells)
        .collect()
    )
    centroids = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])

    def unit(m: np.ndarray) -> np.ndarray:
        n = np.linalg.norm(m, axis=1, keepdims=True)
        n[n == 0] = 1.0
        return m / n

    cunit = unit(centroids)

    def assigner(cu: np.ndarray):
        def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                if not len(pdf):
                    continue
                m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
                cell = (unit(m) @ cu.T).argmax(axis=1)
                out = pdf[[id_col, vec_col]].copy()
                out["cell"] = cell.astype(np.int32)
                yield out
        return assign

    schema = f"{id_col} bigint, {vec_col} array<float>, cell int"
    refine_src = hash_sample(
        emb.select(id_col, vec_col), refine_fraction, key_col=id_col,
        salt="lloyd",
    )
    if lloyd_iters > 0:
        refine_src = refine_src.localCheckpoint(eager=False)
    for _ in range(max(0, lloyd_iters)):
        assigned = refine_src.mapInPandas(assigner(cunit), schema=schema)
        # nrm computed ONCE per row as a sibling output of the explode,
        # then the per-dimension division happens on exploded rows: a
        # `transform(vec, x -> x / nrm)` with nrm captured in the
        # lambda re-evaluates the whole-vector norm PER ELEMENT
        # (lambdas are interpreted — O(d²) per vector), and hoisting
        # nrm into its own projection doesn't survive the optimizer
        # here (referenced once → CollapseProject inlines it back).
        nrm = F.greatest(_norm(F.col(vec_col)), F.lit(1e-12))
        means = (
            assigned.select(
                "cell",
                nrm.alias("__nrm"),
                F.posexplode(
                    F.transform(F.col(vec_col), lambda x: x.cast("double"))
                ).alias("dim", "x"),
            )
            .select("cell", "dim", (F.col("x") / F.col("__nrm")).alias("x"))
            .groupBy("cell", "dim")
            .agg(F.avg("x").alias("mu"))
            .collect()
        )
        new = cunit.copy()  # cells that lost every vector keep their centroid
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(int(r["cell"]), {})[int(r["dim"])] = float(r["mu"])
        for c, dims in by_cell.items():
            new[c] = [dims[d] for d in range(len(dims))]
        cunit = unit(new)

    assigned = emb.select(id_col, vec_col).mapInPandas(
        assigner(cunit), schema=schema
    )
    return assigned, cunit


def ann_topk_ivf(
    emb: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_cells: int = 16,
    n_probe: int = 4,
    seed: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    lloyd_iters: int = 2,
    refine_fraction: float = 0.25,
) -> DataFrame:
    """IVF ANN: score only vectors in the n_probe cells nearest the
    query.  At cluster scale ``assigned`` is a materialized table
    partitioned by cell → partition pruning makes the probe a
    fractional scan."""
    assigned, cunit = kmeans_cells(
        emb, n_cells, seed, id_col, vec_col, lloyd_iters=lloyd_iters,
        refine_fraction=refine_fraction,
    )
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0
    # stable sort: exact dot-product ties (duplicate embeddings seeding
    # identical centroids) break by lowest cell index, matching the q32
    # oracle's ORDER BY dot DESC, cell ASC (ADVICE r5 — plain argsort
    # is an unstable quicksort)
    probe_cells = np.argsort(
        -(cunit @ (q / qn)), kind="stable"
    )[:n_probe].tolist()
    candidates = assigned.filter(F.col("cell").isin(probe_cells)).drop("cell")
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


def quantize_embeddings(
    emb: DataFrame, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Per-vector affine int8 quantization — the storage form for
    billion-vector corpora (4x smaller than float32, reconstruction
    error ≤ scale/2 per dimension).

    q_i = floor((x_i - min) / scale + 0.5) ∈ [0, 255] with
    scale = (max - min) / 255; constant vectors quantize to all-zeros
    with scale 0.  Entirely JVM higher-order expressions — no shuffle,
    composes with any partitioning.
    Output: (id, n_dims, zero_point, scale, qvals array<int>).

    min/scale are hoisted into their own projection: HOF lambdas are
    CodegenFallback (interpreted, no common-subexpression
    elimination), so an array_min/array_max captured inside the
    quantize lambda re-scans the whole vector PER ELEMENT — O(d²) per
    vector.  As attributes they are O(1) lambda references (each is
    used ≥2× downstream, so CollapseProject keeps the projection).
    """
    base = emb.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("__xs"),
    )
    xs = F.col("__xs")
    st = base.select(
        F.col(id_col),
        xs,
        F.array_min(xs).alias("__mn"),
        ((F.array_max(xs) - F.array_min(xs)) / F.lit(255.0)).alias("__scale"),
    )
    mn, scale = F.col("__mn"), F.col("__scale")
    q = F.when(
        scale > 0,
        F.transform(
            xs, lambda x: F.floor((x - mn) / scale + 0.5).cast("int")
        ),
    ).otherwise(F.transform(xs, lambda x: F.lit(0)))
    return st.select(
        F.col(id_col),
        F.size(xs).cast("int").alias("n_dims"),
        mn.alias("zero_point"),
        scale.alias("scale"),
        q.alias("qvals"),
    )
