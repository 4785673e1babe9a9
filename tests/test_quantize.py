"""quantize_embeddings vs numpy reference + reconstruction bound."""

from __future__ import annotations

import math

import numpy as np

from fide_crawler_spark.operators.similarity import quantize_embeddings

VECS = [
    (0, [0.5, -1.25, 3.0, 0.0]),
    (1, [2.0, 2.0, 2.0, 2.0]),       # constant -> scale 0, all-zero codes
    (2, [-5.0, 5.0, 1.5, -0.001]),
]


def _docs(spark):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in VECS],
        "vec_id long, embedding array<float>",
    )


def _py_quant(v):
    xs = np.asarray(v, dtype=np.float32).astype(np.float64)
    mn, mx = xs.min(), xs.max()
    scale = (mx - mn) / 255.0
    if scale > 0:
        q = np.floor((xs - mn) / scale + 0.5).astype(int)
    else:
        q = np.zeros(len(xs), dtype=int)
    return mn, scale, q.tolist()


def test_matches_numpy_reference(spark):
    got = {
        r["vec_id"]: (r["zero_point"], r["scale"], r["qvals"])
        for r in quantize_embeddings(_docs(spark)).collect()
    }
    for i, v in VECS:
        mn, scale, q = _py_quant(v)
        zp, sc, qv = got[i]
        assert math.isclose(zp, mn, rel_tol=0, abs_tol=1e-12)
        assert math.isclose(sc, scale, rel_tol=0, abs_tol=1e-12)
        assert qv == q


def test_codes_in_range_and_reconstruction_bound(spark):
    rows = quantize_embeddings(_docs(spark)).collect()
    for r in rows:
        assert all(0 <= c <= 255 for c in r["qvals"])
        orig = dict(VECS)[r["vec_id"]]
        orig64 = np.asarray(orig, dtype=np.float32).astype(np.float64)
        recon = r["zero_point"] + np.asarray(r["qvals"]) * r["scale"]
        assert np.max(np.abs(recon - orig64)) <= r["scale"] / 2 + 1e-12
