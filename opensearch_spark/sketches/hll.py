"""HyperLogLog++ with mergeable per-partition sketches.

Reference semantics (``server/src/main/java/org/opensearch/search/
aggregations/metrics/HyperLogLogPlusPlus.java:66`` and
``CardinalityAggregator.java:87``):

- every shard builds a sketch; the coordinator merges them
  register-wise (max) — merging is associative and commutative, so a
  100 TB re-aggregation (per-partition partials -> global) is exact
  with respect to the sketch;
- a sketch stays SPARSE (an explicit set of hashes — exact counts)
  until it outgrows ``precision_threshold``, then upgrades to dense
  HLL registers, so cardinalities at or below the threshold are exact;
- ``precision_threshold`` (clamped to [3, 40000] by the reference)
  picks the register count m = 2^p.

The estimator is the standard HLL++ dense form: harmonic mean of
2^-register with the small-range linear-counting correction (Heule,
Nunkesser, Hall: "HyperLogLog in Practice", EDBT 2013). We skip the
empirical bias-correction table — the sparse-exact regime already
covers the range the table corrects, which is the same reason the
paper gives for its threshold choice.

Hashing uses Spark's ``xxhash64`` so the sketch input is computed
JVM-side; the Python side only ever sees int64 hashes in Arrow batches.
"""

from __future__ import annotations

import math
import struct
from typing import Iterator, Optional, Sequence

import numpy as np

_MAGIC_SPARSE = 1
_MAGIC_DENSE = 2


def precision_from_threshold(threshold: int) -> int:
    """Register precision p for a precision_threshold, following the
    reference's mapping (m = next pow2 >= 4 * threshold, clamped to
    [2^4, 2^18]) — same mapping search/aggs.py uses for the
    approx_count_distinct rsd."""
    thr = max(3, min(int(threshold), 40000))
    return min(18, max(4, math.ceil(math.log2(thr * 4))))


class HllPlusPlus:
    """One sketch: sparse (exact hash set) or dense (2^p registers).

    Associativity: ``merge`` is register-wise max (dense) / set union
    (sparse), with sparse->dense upgrade when the union outgrows the
    threshold — merging per-partition sketches in any order or
    grouping yields the identical final state (property-tested in
    tests/test_sketches.py)."""

    __slots__ = ("p", "threshold", "hashes", "registers")

    def __init__(self, threshold: int = 3000, p: int | None = None):
        self.threshold = max(3, min(int(threshold), 40000))
        self.p = int(p) if p is not None else precision_from_threshold(threshold)
        self.hashes: Optional[np.ndarray] = np.empty(0, dtype=np.uint64)
        self.registers: Optional[np.ndarray] = None  # uint8[2^p] when dense

    # ---- construction ----------------------------------------------------

    def add_hashes(self, h: np.ndarray) -> "HllPlusPlus":
        """Fold a batch of int64/uint64 hashes into the sketch."""
        h = np.asarray(h).astype(np.uint64, copy=False)
        if self.registers is not None:
            self._fold_dense(h)
            return self
        self.hashes = np.union1d(self.hashes, h)
        if self.hashes.size > self.threshold:
            self._densify()
        return self

    def _densify(self) -> None:
        m = 1 << self.p
        self.registers = np.zeros(m, dtype=np.uint8)
        self._fold_dense(self.hashes)
        self.hashes = None

    def _fold_dense(self, h: np.ndarray) -> None:
        if h.size == 0:
            return
        m = 1 << self.p
        bucket = (h & np.uint64(m - 1)).astype(np.int64)
        rest = h >> np.uint64(self.p)
        # rho = 1 + trailing-zero count of the remaining 64-p bits,
        # capped at 64-p+1 when those bits are all zero
        width = 64 - self.p
        tz = np.zeros(h.size, dtype=np.uint8)
        zero = rest == 0
        tz[zero] = width
        nz = ~zero
        if nz.any():
            r = rest[nz]
            # vectorized count-trailing-zeros via the isolated lowest
            # set bit's log2 (exact for < 2^53 after float conversion;
            # split higher bits arithmetically)
            low = (r & (~r + np.uint64(1)))
            lo32 = (low & np.uint64(0xFFFFFFFF)).astype(np.float64)
            hi32 = (low >> np.uint64(32)).astype(np.float64)
            ctz = np.where(
                lo32 > 0,
                np.log2(np.maximum(lo32, 1.0)),
                32.0 + np.log2(np.maximum(hi32, 1.0)),
            ).astype(np.uint8)
            tz[nz] = ctz
        rho = tz.astype(np.uint8) + 1
        np.maximum.at(self.registers, bucket, rho)

    # ---- merge -------------------------------------------------------------

    def merge(self, other: "HllPlusPlus") -> "HllPlusPlus":
        if other.p != self.p:
            raise ValueError(f"precision mismatch: {self.p} vs {other.p}")
        if self.registers is None and other.registers is None:
            self.hashes = np.union1d(self.hashes, other.hashes)
            if self.hashes.size > self.threshold:
                self._densify()
            return self
        if self.registers is None:
            self._densify()
        if other.registers is None:
            self._fold_dense(other.hashes)
        else:
            np.maximum(self.registers, other.registers, out=self.registers)
        return self

    # ---- estimate ----------------------------------------------------------

    def estimate(self) -> int:
        if self.registers is None:
            return int(self.hashes.size)
        m = float(1 << self.p)
        regs = self.registers.astype(np.float64)
        alpha = 0.7213 / (1 + 1.079 / m) if m >= 128 else (
            0.709 if m == 64 else 0.697 if m == 32 else 0.673)
        est = alpha * m * m / float(np.sum(np.exp2(-regs)))
        zeros = int(np.count_nonzero(self.registers == 0))
        if est <= 2.5 * m and zeros > 0:
            est = m * math.log(m / zeros)  # linear counting
        return int(round(est))

    # ---- serialization (one binary blob per partial) -----------------------

    def to_bytes(self) -> bytes:
        if self.registers is None:
            head = struct.pack("<BBI", _MAGIC_SPARSE, self.p, self.hashes.size)
            return head + self.hashes.astype("<u8").tobytes()
        head = struct.pack("<BBI", _MAGIC_DENSE, self.p, self.registers.size)
        return head + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, blob: bytes, threshold: int = 3000) -> "HllPlusPlus":
        magic, p, n = struct.unpack_from("<BBI", blob, 0)
        sk = cls(threshold=threshold, p=p)
        body = blob[6:]
        if magic == _MAGIC_SPARSE:
            sk.hashes = np.frombuffer(body, dtype="<u8", count=n).copy()
            if sk.hashes.size > sk.threshold:
                sk._densify()
        else:
            sk.registers = np.frombuffer(body, dtype=np.uint8, count=n).copy()
            sk.hashes = None
        return sk


def hll_cardinality(df, col: str, precision_threshold: int = 3000,
                    by: Sequence[str] | None = None, alias: str = "cardinality"):
    """Distributed cardinality via mergeable HLL++ sketches.

    - ``by=None``: one sketch per partition (mapInArrow over the
      JVM-computed xxhash64 column), merged on the driver — the
      coordinator reduce over per-shard sketches. Returns a 1-row
      DataFrame ``[alias: long]``.
    - ``by=[keys]``: per-partition per-key partial sketches, then ONE
      shuffle keyed on the group columns merges partials and estimates
      (``applyInPandas``). Rows shuffled = n_partitions x n_keys
      sketch blobs, independent of the data size — the property that
      makes this viable at 100 TB where exact countDistinct would
      shuffle every distinct value.
    """
    import pandas as pd
    import pyarrow as pa
    from pyspark.sql import functions as F

    thr = max(3, min(int(precision_threshold), 40000))
    p = precision_from_threshold(thr)

    if not by:
        hashed = df.select(F.xxhash64(F.col(col)).alias("h")).where(
            F.col(col).isNotNull())

        def part_sketch(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            sk = HllPlusPlus(threshold=thr, p=p)
            any_rows = False
            for b in it:
                h = b.column(0).to_numpy(zero_copy_only=False)
                if h.size:
                    any_rows = True
                    sk.add_hashes(h.astype(np.int64).view(np.uint64))
            if any_rows:
                yield pa.RecordBatch.from_pydict(
                    {"sketch": pa.array([sk.to_bytes()], pa.binary())})

        partials = hashed.mapInArrow(part_sketch, "sketch binary").collect()
        total = HllPlusPlus(threshold=thr, p=p)
        for row in partials:
            total.merge(HllPlusPlus.from_bytes(bytes(row["sketch"]), threshold=thr))
        spark = df.sparkSession
        return spark.createDataFrame([(total.estimate(),)], f"{alias} long")

    keys = list(by)
    hashed = df.select(
        *[F.col(k) for k in keys], F.xxhash64(F.col(col)).alias("h")
    ).where(F.col(col).isNotNull())

    def part_sketches(pdfs: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict[tuple, HllPlusPlus] = {}
        for pdf in pdfs:
            if pdf.empty:
                continue
            gb = pdf.groupby(keys, dropna=False, sort=False)
            for kv, grp in gb:
                kv = kv if isinstance(kv, tuple) else (kv,)
                sk = acc.get(kv)
                if sk is None:
                    sk = acc[kv] = HllPlusPlus(threshold=thr, p=p)
                sk.add_hashes(grp["h"].to_numpy().astype(np.int64).view(np.uint64))
        if acc:
            out = {k: [kv[i] for kv in acc] for i, k in enumerate(keys)}
            out["sketch"] = [sk.to_bytes() for sk in acc.values()]
            yield pd.DataFrame(out)

    key_schema = ", ".join(
        f"{k} {df.schema[k].dataType.simpleString()}" for k in keys)
    partials = hashed.mapInPandas(
        part_sketches, f"{key_schema}, sketch binary")

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        total = HllPlusPlus(threshold=thr, p=p)
        for blob in pdf["sketch"]:
            total.merge(HllPlusPlus.from_bytes(bytes(blob), threshold=thr))
        out = {k: [pdf[k].iloc[0]] for k in keys}
        out[alias] = [total.estimate()]
        return pd.DataFrame(out)

    return partials.groupBy(*keys).applyInPandas(
        merge_group, f"{key_schema}, {alias} long")
