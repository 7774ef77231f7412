"""Candidate-growth probe for the exact prefix-filter similarity join.

The r6 plan audit flagged ``doc_prefix_filter_pairs`` as the heaviest
staged query (the exactness tier) but the only pair workload without a
measured 10x growth curve. This probe runs the SAME corpus and
parameters as the gate query at each given sf dir and reports, per SF:

* steady-state wall time (2 runs, second reported),
* ``n_candidates`` — distinct candidate pairs entering the exact verify
  (via the free Observation on the candidate stage),
* ``n_pairs`` — surviving pairs,
* ``lsh_candidates`` — the MinHash-LSH tier's distinct candidate count
  on the same corpus (16 bands over 64 perms, the doc_near_dup_pairs
  configuration), the probabilistic tier the exact tier is priced
  against.

Usage: python scripts/probe_prefix_filter.py [sf_dir ...]
Defaults to /root/testdata/sf0.01 /root/testdata/sf0.1. Prints one JSON
line per SF; paste the ratios into SCALE.md §3.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Observation
from pyspark.sql import functions as F


def probe(spark, sf_dir: str) -> dict:
    from smartpool_bigdata_spark.catalog import load_table
    from smartpool_bigdata_spark.ops.text import (
        banded_signatures,
        minhash_signatures,
        prefix_filter_pairs,
        release_signature_caches,
    )
    from smartpool_bigdata_spark.queries_text import _near_dup_corpus_spark

    corpus = _near_dup_corpus_spark(
        load_table(spark, sf_dir, "documents")
    ).localCheckpoint(eager=True)  # isolate probe timing from doc scan
    n_docs = corpus.count()

    timings, n_candidates, n_pairs = [], None, None
    for _ in range(2):
        obs = Observation()
        t0 = time.perf_counter()
        pairs = prefix_filter_pairs(
            corpus,
            threshold_num=3,
            threshold_den=5,
            shingle_k=3,
            candidate_observation=obs,
        )
        n_pairs = pairs.count()
        timings.append(time.perf_counter() - t0)
        n_candidates = obs.get["n_candidates"]
        release_signature_caches()

    sig = minhash_signatures(corpus, shingle_k=3)
    banded = banded_signatures(sig)
    lsh_candidates = (
        banded.alias("l")
        .join(
            banded.alias("r"),
            (F.col("l.band_idx") == F.col("r.band_idx"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select("l.doc_id", "r.doc_id")
        .distinct()
        .count()
    )
    corpus.unpersist()
    return {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "wall_s": round(timings[-1], 3),
        "n_candidates": n_candidates,
        "n_pairs": n_pairs,
        "lsh_candidates": lsh_candidates,
        "verify_selectivity": round(n_pairs / max(n_candidates, 1), 6),
    }


def main() -> None:
    from smartpool_bigdata_spark.session import get_spark

    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark(app_name="probe-prefix-filter")
    results = [probe(spark, d) for d in sf_dirs]
    for r in results:
        print(json.dumps(r))
    if len(results) >= 2:
        a, b = results[0], results[-1]
        print(
            json.dumps(
                {
                    "wall_ratio": round(b["wall_s"] / max(a["wall_s"], 1e-9), 2),
                    "candidate_ratio": round(
                        b["n_candidates"] / max(a["n_candidates"], 1), 2
                    ),
                    "lsh_candidate_ratio": round(
                        b["lsh_candidates"] / max(a["lsh_candidates"], 1), 2
                    ),
                    "docs_ratio": round(b["n_docs"] / max(a["n_docs"], 1), 2),
                }
            )
        )


if __name__ == "__main__":
    main()
