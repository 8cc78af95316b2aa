"""Merging t-digest: mergeable per-partition percentile sketches.

Reference semantics (``server/src/main/java/org/opensearch/search/
aggregations/metrics/TDigestPercentilesAggregator.java:48`` backed by
t-digest ``TDigestState``): every shard folds its values into a
t-digest; the coordinator merges the per-shard digests and reads
quantiles / percentile ranks off the merged sketch. This module is the
merging variant of Dunning & Ertl, "Computing Extremely Accurate
Quantiles Using t-Digests" (arXiv:1902.04023): centroids sorted by
mean, compressed under the k1 scale function
``k(q) = (compression / (2*pi)) * asin(2q - 1)``, which concentrates
resolution at the tails.

Exactness guarantees this implementation adds on top of the paper's
rank-error bound (both property-tested in tests/test_sketches.py):

- centroids with EQUAL means always merge with zero error, so a digest
  over a column with d distinct values needs only d centroids and its
  cdf is EXACT (the mid-distribution cdf: (count_less + count_equal/2)
  / n) whenever d stays under the compression's singleton budget
  (~compression/pi centroids). That regime is SQL-expressible, which
  is what the driver-checked oracle row certifies.
- min/max are tracked exactly and pin the quantile interpolation ends,
  so quantile(0) == min and quantile(1) == max always.

Like the reference's sketch (and unlike exact percentile()), merging
is NOT bitwise associative — merge order can shift interior centroid
boundaries — but the rank-error bound survives any merge tree, which
is the contract a 100 TB re-aggregation needs.
"""

from __future__ import annotations

import math
import struct
from typing import Iterator, Sequence

import numpy as np

_DEFAULT_COMPRESSION = 100.0


class TDigest:
    __slots__ = ("compression", "means", "weights", "vmin", "vmax")

    def __init__(self, compression: float = _DEFAULT_COMPRESSION):
        self.compression = float(compression)
        self.means = np.empty(0, dtype=np.float64)
        self.weights = np.empty(0, dtype=np.float64)
        self.vmin = math.inf
        self.vmax = -math.inf

    # ---- construction -----------------------------------------------------

    def add_values(self, values: np.ndarray,
                   weights: np.ndarray | None = None) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        ok = ~np.isnan(v)
        v = v[ok]
        if v.size == 0:
            return self
        w = (np.ones(v.size) if weights is None
             else np.asarray(weights, dtype=np.float64)[ok])
        self.vmin = min(self.vmin, float(v.min()))
        self.vmax = max(self.vmax, float(v.max()))
        self.means = np.concatenate([self.means, v])
        self.weights = np.concatenate([self.weights, w])
        self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        if other.means.size == 0:
            return self
        self.vmin = min(self.vmin, other.vmin)
        self.vmax = max(self.vmax, other.vmax)
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _k(self, q: np.ndarray) -> np.ndarray:
        return (self.compression / (2.0 * math.pi)) * np.arcsin(
            np.clip(2.0 * q - 1.0, -1.0, 1.0))

    def _compress(self) -> None:
        if self.means.size == 0:
            return
        order = np.argsort(self.means, kind="stable")
        means = self.means[order]
        weights = self.weights[order]
        # zero-error pass: collapse runs of EQUAL means first (keeps the
        # distinct-value regime exact and makes re-merging idempotent)
        if means.size > 1:
            new_run = np.ones(means.size, dtype=bool)
            new_run[1:] = means[1:] != means[:-1]
            idx = np.cumsum(new_run) - 1
            m = means[new_run]
            w = np.zeros(m.size)
            np.add.at(w, idx, weights)
            means, weights = m, w
        n = float(weights.sum())
        out_m: list[float] = []
        out_w: list[float] = []
        acc_m, acc_w, c_before = float(means[0]), float(weights[0]), 0.0
        k_lo = self._k(np.array([0.0]))[0]
        for i in range(1, means.size):
            q_new = (c_before + acc_w + weights[i]) / n
            if self._k(np.array([q_new]))[0] - k_lo <= 1.0:
                # weighted-mean absorb
                tot = acc_w + weights[i]
                acc_m += (means[i] - acc_m) * weights[i] / tot
                acc_w = tot
            else:
                out_m.append(acc_m)
                out_w.append(acc_w)
                c_before += acc_w
                acc_m, acc_w = float(means[i]), float(weights[i])
                k_lo = self._k(np.array([c_before / n]))[0]
        out_m.append(acc_m)
        out_w.append(acc_w)
        self.means = np.asarray(out_m)
        self.weights = np.asarray(out_w)

    # ---- queries ------------------------------------------------------------

    def quantile(self, q: float) -> float:
        if self.means.size == 0:
            return math.nan
        if q <= 0:
            return self.vmin
        if q >= 1:
            return self.vmax
        n = float(self.weights.sum())
        target = q * n
        # cumulative weight at each centroid CENTER
        cum = np.cumsum(self.weights) - self.weights / 2.0
        if target <= cum[0]:
            # interpolate min -> first center
            t = target / max(cum[0], 1e-300)
            return self.vmin + t * (float(self.means[0]) - self.vmin)
        if target >= cum[-1]:
            span = n - cum[-1]
            t = (target - cum[-1]) / max(span, 1e-300)
            return float(self.means[-1]) + t * (self.vmax - float(self.means[-1]))
        j = int(np.searchsorted(cum, target, side="right"))
        lo, hi = cum[j - 1], cum[j]
        t = (target - lo) / max(hi - lo, 1e-300)
        return float(self.means[j - 1]) + t * float(self.means[j] - self.means[j - 1])

    def cdf(self, x: float) -> float:
        """Mid-distribution cdf; EXACT when every centroid is a distinct
        input value: (weight_below + weight_at/2) / n."""
        if self.means.size == 0:
            return math.nan
        if x < self.vmin:
            return 0.0
        if x > self.vmax:
            return 1.0
        n = float(self.weights.sum())
        below = float(self.weights[self.means < x].sum())
        at = float(self.weights[self.means == x].sum())
        if at > 0:
            return (below + at / 2.0) / n
        # between centroids: linear interpolation of the mid-cdf
        cum = np.cumsum(self.weights) - self.weights / 2.0
        j = int(np.searchsorted(self.means, x))
        if j == 0:
            lo_x, lo_c = self.vmin, 0.0
        else:
            lo_x, lo_c = float(self.means[j - 1]), float(cum[j - 1])
        if j == self.means.size:
            hi_x, hi_c = self.vmax, n
        else:
            hi_x, hi_c = float(self.means[j]), float(cum[j])
        if hi_x <= lo_x:
            return lo_c / n
        return (lo_c + (x - lo_x) / (hi_x - lo_x) * (hi_c - lo_c)) / n

    # ---- serialization ------------------------------------------------------

    def to_bytes(self) -> bytes:
        head = struct.pack("<dddI", self.compression, self.vmin, self.vmax,
                           self.means.size)
        return head + self.means.astype("<f8").tobytes() + \
            self.weights.astype("<f8").tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes) -> "TDigest":
        comp, vmin, vmax, n = struct.unpack_from("<dddI", blob, 0)
        td = cls(compression=comp)
        td.vmin, td.vmax = vmin, vmax
        off = struct.calcsize("<dddI")
        td.means = np.frombuffer(blob, dtype="<f8", count=n, offset=off).copy()
        td.weights = np.frombuffer(
            blob, dtype="<f8", count=n, offset=off + 8 * n).copy()
        return td


def tdigest_percentile_ranks(df, col: str, values: Sequence[float],
                             compression: float = 200.0,
                             by: Sequence[str] | None = None):
    """Percentile ranks via mergeable t-digests (reference:
    TDigestPercentileRanksAggregator): per-partition digests, merged on
    the driver (global) or through one keyed ``applyInPandas``
    (grouped); only digest blobs shuffle. Returns one ``rank_<i>``
    column per probe value, each the mid-distribution cdf * 100."""
    import pandas as pd
    import pyarrow as pa
    from pyspark.sql import functions as F

    probes = [float(v) for v in values]

    def part_digest(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        td = TDigest(compression=compression)
        any_rows = False
        for b in it:
            v = b.column(0).to_numpy(zero_copy_only=False)
            if v.size:
                any_rows = True
                td.add_values(v.astype(np.float64))
        if any_rows:
            yield pa.RecordBatch.from_pydict(
                {"sketch": pa.array([td.to_bytes()], pa.binary())})

    if not by:
        src = df.select(F.col(col).cast("double").alias("v")).where(
            F.col(col).isNotNull())
        blobs = src.mapInArrow(part_digest, "sketch binary").collect()
        total = TDigest(compression=compression)
        for row in blobs:
            total.merge(TDigest.from_bytes(bytes(row["sketch"])))
        vals = [round(total.cdf(p) * 100.0, 4) for p in probes]
        schema = ", ".join(f"rank_{i} double" for i in range(len(probes)))
        return df.sparkSession.createDataFrame([tuple(vals)], schema)

    keys = list(by)
    src = df.select(*[F.col(k) for k in keys],
                    F.col(col).cast("double").alias("v")).where(
        F.col(col).isNotNull())

    def part_digests(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, TDigest] = {}
        for pdf in pdfs:
            if pdf.empty:
                continue
            for kv, grp in pdf.groupby(keys, dropna=False, sort=False):
                kv = kv if isinstance(kv, tuple) else (kv,)
                td = acc.get(kv)
                if td is None:
                    td = acc[kv] = TDigest(compression=compression)
                td.add_values(grp["v"].to_numpy())
        if acc:
            out = {k: [kv[i] for kv in acc] for i, k in enumerate(keys)}
            out["sketch"] = [td.to_bytes() for td in acc.values()]
            yield pd.DataFrame(out)

    key_schema = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in keys)
    partials = src.mapInPandas(part_digests, f"{key_schema}, sketch binary")

    rank_cols = ", ".join(f"rank_{i} double" for i in range(len(probes)))

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        total = TDigest(compression=compression)
        for blob in pdf["sketch"]:
            total.merge(TDigest.from_bytes(bytes(blob)))
        out = {k: [pdf[k].iloc[0]] for k in keys}
        for i, p in enumerate(probes):
            out[f"rank_{i}"] = [round(total.cdf(p) * 100.0, 4)]
        return pd.DataFrame(out)

    return partials.groupBy(*keys).applyInPandas(
        merge_group, f"{key_schema}, {rank_cols}")
