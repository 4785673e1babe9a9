"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — brute-force exact top-k against a query vector.
  The dot product and norms are JVM higher-order expressions
  (``zip_with`` + ``aggregate``): fully codegen'd, no Python, scales as
  one scan + TakeOrderedAndProject (no full sort).
* ``ann_topk_ivf`` — IVF-style approximate variant: vectors are
  pre-assigned to ``n_cells`` centroid cells (seeded k-means-- one
  pass); queries probe only the ``n_probe`` nearest cells.  The scale
  path: cell assignment partitions/clusters the table so a query scans
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
) -> tuple[DataFrame, np.ndarray]:
    """One-shot IVF cell assignment: centroids = seeded sample of the
    table (k-means|| degenerate single round — adequate for routing),
    assignment via a vectorized argmax in pandas (numpy matmul)."""
    sample = emb.select(vec_col).orderBy(F.xxhash64(id_col)).limit(n_cells).collect()
    centroids = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in sample])
    cnorm = np.linalg.norm(centroids, axis=1, keepdims=True)
    cnorm[cnorm == 0] = 1.0
    cunit = centroids / cnorm

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            mn = np.linalg.norm(m, axis=1, keepdims=True)
            mn[mn == 0] = 1.0
            cell = ((m / mn) @ cunit.T).argmax(axis=1)
            out = pdf[[id_col, vec_col]].copy()
            out["cell"] = cell.astype(np.int32)
            yield out

    assigned = emb.select(id_col, vec_col).mapInPandas(
        assign, schema=f"{id_col} bigint, {vec_col} array<float>, cell int"
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
) -> DataFrame:
    """IVF ANN: score only vectors in the n_probe cells nearest the
    query.  At cluster scale ``assigned`` is a materialized table
    partitioned by cell → partition pruning makes the probe a
    fractional scan."""
    assigned, cunit = kmeans_cells(emb, n_cells, seed, id_col, vec_col)
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0
    probe_cells = np.argsort(-(cunit @ (q / qn)))[:n_probe].tolist()
    candidates = assigned.filter(F.col("cell").isin(probe_cells)).drop("cell")
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)
