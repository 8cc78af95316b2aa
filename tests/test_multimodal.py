"""Multimodal plumbing: binary payload columns + mapInPandas feature
extraction (the decoder is a deterministic stub; the Spark-side schema,
Arrow batching, and partition parallelism are real)."""

import hashlib

import numpy as np

from opensearch_spark.pipelines import multimodal as mm


def test_fake_decode_deterministic():
    p = b"hello world, this is a payload"
    f1, f2 = mm._fake_decode(p), mm._fake_decode(p)
    assert np.array_equal(f1, f2)
    assert f1.shape == (mm.FEATURE_DIM,)
    assert f1.dtype == np.float32
    assert mm._fake_decode(b"").tolist() == [0.0] * mm.FEATURE_DIM


def test_extract_features_e2e(spark, sf_dir):
    payloads = mm.binary_payloads(spark, sf_dir)
    assert dict(payloads.dtypes)["payload"] == "binary"
    feats = mm.extract_features(payloads)
    rows = feats.limit(20).collect()
    assert rows
    for r in rows:
        assert len(r["feature"]) == mm.FEATURE_DIM
        assert r["n_bytes"] >= 0

    # cross-check one row end-to-end against local recomputation
    src = {r["doc_id"]: bytes(r["payload"]) for r in payloads.limit(5).collect()}
    got = {
        r["doc_id"]: (r["n_bytes"], r["payload_sha"], r["feature"])
        for r in feats.where(feats.doc_id.isin(*src.keys())).collect()
    }
    for doc_id, payload in src.items():
        n, sha, feat = got[doc_id]
        assert n == len(payload)
        assert sha == hashlib.sha256(payload).hexdigest()
        assert np.allclose(feat, mm._fake_decode(payload), rtol=1e-6)


def test_feature_rows_match_fake_decode_chunking(spark, sf_dir):
    """feature_rows (exact int-sum/float64 stream) uses the SAME
    np.array_split chunking as _fake_decode's float32 presentation.
    Reference rounding uses HALF_UP via Decimal — Python round() is
    banker's and disagrees with Spark/DuckDB on exact dyadic ties
    (e.g. a 77.03125 chunk mean, review r5)."""
    from decimal import ROUND_HALF_UP, Decimal

    def r4(x: float) -> float:
        return float(Decimal(repr(x)).quantize(
            Decimal("0.0001"), ROUND_HALF_UP))

    pay = mm.binary_payloads(spark, sf_dir)
    src = {r["doc_id"]: bytes(r["payload"]) for r in pay.limit(3).collect()}
    rows = mm.feature_rows(spark, sf_dir)
    got = {
        (r["doc_id"], r["dim"]): r["feature"]
        for r in rows.where(rows.doc_id.isin(*src.keys())).collect()
    }
    for doc_id, payload in src.items():
        arr = np.frombuffer(payload, dtype=np.uint8)
        f32 = mm._fake_decode(payload)
        for j, c in enumerate(np.array_split(arr, mm.FEATURE_DIM)):
            want = r4(int(c.sum(dtype=np.int64)) / c.size)
            assert got[(doc_id, j)] == want
            # same chunking as the float32 stub
            assert abs(float(f32[j]) - got[(doc_id, j)]) < 1e-2
    # exact dyadic tie (a 32-byte chunk mean like 77 + 1/32): HALF_UP
    # rounds .03125 up to .0313 where Python round() (banker's) gives
    # .0312 — the divergence the Decimal reference exists to avoid
    assert r4(77.03125) == 77.0313 and round(77.03125, 4) == 77.0312
