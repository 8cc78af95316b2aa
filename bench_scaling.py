"""Scaling-efficiency evidence (north rule): the SAME index-build +
query job at two parallelism levels — local[8] vs local[32] — on
identical input, as the sandbox proxy for N vs 4N executor clusters.

The job plan is held constant (same input parquet, same n_segments=32,
same 64 shuffle partitions); only the executor thread count changes, so
the throughput ratio measures parallel scaling, not plan differences.

Usage:
    python bench_scaling.py                 # parent: runs 8 and 32, prints JSON
    python bench_scaling.py --worker --cpus N ...   # one measured run

Writes BENCH_SCALING.json and appends a row to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
N_DOCS = int(os.environ.get("SCALE_DOCS", "240000"))
N_SEGMENTS = 32
SHUFFLE = 64

QUERY_SET = [
    {"match": {"content": "def return import"}},
    {"match": {"content": {"query": "data load parse", "operator": "and"}}},
    {"match_phrase": {"content": "public static"}},
    {
        "bool": {
            "must": [{"match": {"content": "class"}}],
            "should": [{"match": {"content": "import"}}, {"match": {"content": "yield"}}],
        }
    },
]


def corpus_path() -> str:
    p = os.path.join(REPO, ".cache", f"scale_corpus_{N_DOCS}.parquet")
    if not os.path.exists(p):
        os.makedirs(os.path.dirname(p), exist_ok=True)
        from opensearch_spark.testing.corpus import generate_corpus

        pdf = generate_corpus(N_DOCS, seed=42)
        pdf.to_parquet(p, index=False, row_group_size=4096)  # splittable input
    return p


def worker(cpus: int, corpus: str) -> dict:
    from opensearch_spark.session import get_spark
    from opensearch_spark.index.build import build_index
    from opensearch_spark.search.engine import SearchEngine

    spark = get_spark(f"scale-{cpus}", cpus=cpus, shuffle_partitions=SHUFFLE)
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(corpus)
    n_docs = docs.count()
    n_bytes = docs.selectExpr("sum(length(content))").collect()[0][0]

    ix = f"/tmp/osx_scale_ix_{cpus}"
    shutil.rmtree(ix, ignore_errors=True)
    t0 = time.perf_counter()
    build_index(spark, docs, ix, n_segments=N_SEGMENTS, shuffle_partitions=SHUFFLE)
    build_sec = time.perf_counter() - t0

    eng = SearchEngine(spark, ix, cache=True)
    eng.search(QUERY_SET[0], k=10).collect()  # warm cache

    t0 = time.perf_counter()
    reps = 6
    lat = []
    for _ in range(reps):
        for q in QUERY_SET:
            t = time.perf_counter()
            eng.search(q, k=10).collect()
            lat.append(time.perf_counter() - t)
    q_sec = time.perf_counter() - t0
    lat.sort()

    out = {
        "cpus": cpus,
        "n_docs": n_docs,
        "corpus_mb": round(n_bytes / 1e6, 1),
        "build_sec": round(build_sec, 2),
        "index_docs_per_sec": round(n_docs / build_sec, 1),
        "index_mb_per_sec": round(n_bytes / 1e6 / build_sec, 2),
        "queries_per_sec": round(reps * len(QUERY_SET) / q_sec, 2),
        "query_p50_sec": round(lat[len(lat) // 2], 4),
    }
    spark.stop()
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", action="store_true")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--corpus", default=None)
    args = ap.parse_args()

    if args.worker:
        print(json.dumps(worker(args.cpus, args.corpus or corpus_path())))
        return

    corpus = corpus_path()
    results = {}
    for cpus in (8, 32):
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker",
             "--cpus", str(cpus), "--corpus", corpus],
            capture_output=True, text=True, cwd=REPO, timeout=3600,
        )
        if r.returncode != 0:
            sys.stderr.write(r.stderr[-4000:])
            raise SystemExit(f"worker {cpus} failed")
        results[cpus] = json.loads(r.stdout.strip().splitlines()[-1])

    speedup_ix = results[32]["index_docs_per_sec"] / results[8]["index_docs_per_sec"]
    speedup_q = results[32]["queries_per_sec"] / results[8]["queries_per_sec"]
    out = {
        "metric": "scaling_efficiency_local8_vs_local32",
        "runs": results,
        "index_speedup_4x_cores": round(speedup_ix, 3),
        "index_scaling_efficiency": round(speedup_ix / 4.0, 3),
        "query_speedup_4x_cores": round(speedup_q, 3),
        "query_scaling_efficiency": round(speedup_q / 4.0, 3),
    }
    print(json.dumps(out, indent=1))
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
