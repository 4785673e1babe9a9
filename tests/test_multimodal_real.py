"""Real netpbm decode path: pure-numpy P6/P5 decoder
(multimodal.decode_ppm) + decode_media(real=True) through the full
Spark mapInPandas plumbing, checked against independent numpy
references and a hand-rolled byte fixture."""

from __future__ import annotations

import numpy as np
import pytest

from fide_crawler_spark.operators.multimodal import (
    decode_media,
    decode_ppm,
    encode_ppm,
    ppm_media_table,
)


# ------------------------------------------------------------- decoder


def test_decode_handrolled_fixture():
    """Byte-level fixture written by hand (NOT via encode_ppm), with a
    comment line and multi-space separators — decoder and writer can't
    share a bug here."""
    payload = b"P6\n# a comment\n2  1\n255\n" + bytes([1, 2, 3, 4, 5, 6])
    img = decode_ppm(payload)
    assert img.shape == (1, 2, 3)
    assert img.tolist() == [[[1, 2, 3], [4, 5, 6]]]


def test_roundtrip_p6_and_p5():
    rng = np.random.default_rng(7)
    rgb = rng.integers(0, 256, size=(5, 9, 3), dtype=np.uint8)
    gray = rng.integers(0, 256, size=(4, 6), dtype=np.uint8)
    assert np.array_equal(decode_ppm(encode_ppm(rgb)), rgb)
    assert np.array_equal(decode_ppm(encode_ppm(gray)), gray)


def test_header_grammar_variants():
    raster = bytes(range(12))
    # tabs/newlines as separators, comment between tokens
    for hdr in (b"P6 2 2 255 ", b"P6\t2\n2 #c\n 255\n", b"P6\n2\n#x\n2\n255\n"):
        img = decode_ppm(hdr + raster)
        assert img.shape == (2, 2, 3)
        assert img.ravel().tolist() == list(range(12))
    # trailing extra bytes after the raster are ignored (netpbm allows
    # concatenated streams; we decode the first image)
    assert decode_ppm(b"P6\n2 2\n255\n" + raster + b"junk").shape == (2, 2, 3)


@pytest.mark.parametrize(
    "payload,msg",
    [
        (b"P3\n1 1\n255\n..", "magic"),  # ASCII ppm unsupported
        (b"\x89PNG\r\n", "magic"),
        (b"P6\n2 2\n65535\n" + bytes(24), "maxval"),
        (b"P6\n2 2\n255\n" + bytes(11), "truncated raster"),
        (b"P6\n2 x\n255\n" + bytes(12), "header"),
        (b"P6\n2 2", "header"),  # header itself truncated
    ],
)
def test_malformed_payloads_raise(payload, msg):
    with pytest.raises(ValueError, match=msg):
        decode_ppm(payload)


# ----------------------------------------------------- spark real path


def test_decode_media_real_matches_numpy_reference(spark):
    """Planted arrays → encode_ppm payloads → Spark decode_media
    (real=True); dims/checksum/features must equal values computed
    straight from the ORIGINAL arrays (never passed through the
    decoder)."""
    rng = np.random.default_rng(11)
    arrs = {
        i: rng.integers(0, 256, size=(3 + i, 5 + i, 3), dtype=np.uint8)
        for i in range(4)
    }
    rows = [
        (i, bytearray(encode_ppm(a)), ("ppm", a.shape[1], a.shape[0],
                                       len(encode_ppm(a))))
        for i, a in arrs.items()
    ]
    media = spark.createDataFrame(
        rows,
        "doc_id bigint, payload binary, "
        "meta struct<format:string,width:int,height:int,n_bytes:bigint>",
    )
    got = {r["doc_id"]: r for r in decode_media(media, real=True).collect()}
    for i, a in arrs.items():
        r = got[i]
        px = a.astype(np.float64).ravel()
        assert (r["width"], r["height"]) == (a.shape[1], a.shape[0])
        assert r["checksum"] == int(a.sum(dtype=np.int64))
        assert r["n_bytes"] == len(encode_ppm(a))
        want = [px.mean(), px.std(), px.min(), px.max(),
                float(a.shape[1]), float(a.shape[0]), float(px.size),
                float(px.sum() % 255)]
        assert r["features"] == pytest.approx(want, rel=1e-6)


def test_decode_media_real_rejects_invalid_payload(spark):
    media = spark.createDataFrame(
        [(1, bytearray(b"not an image"), ("raw", 1, 1, 12))],
        "doc_id bigint, payload binary, "
        "meta struct<format:string,width:int,height:int,n_bytes:bigint>",
    )
    from pyspark.errors import PySparkException

    with pytest.raises(PySparkException, match="magic"):
        decode_media(media, real=True).collect()


def test_ppm_media_table_payloads_decode_to_text_raster(spark, sf_dir):
    """The JVM-synthesized PPM payloads are genuinely valid: decoding
    one recovers exactly the doc's first 96 chars right-padded with
    'x' as pixel bytes (independent python replay, no Spark kernel)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(5)
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}
    for r in ppm_media_table(docs).collect():
        img = decode_ppm(bytes(r["payload"]))
        assert img.shape == (4, 8, 3)
        want = texts[r["doc_id"]][:96].ljust(96, "x").encode()
        assert bytes(img.ravel().tolist()) == want
        assert r["meta"]["n_bytes"] == 11 + 96
