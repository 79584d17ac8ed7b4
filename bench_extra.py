#!/usr/bin/env python
"""Round-8 optimization side-bench (bench.py is FROZEN for measurement —
this file holds the extra instrumentation the optimization round needs):

  python bench_extra.py plans [names...]   # dump explain('formatted') per query
  python bench_extra.py time  [names...]   # per-query _force timing, N reps
  python bench_extra.py noop  [names...]   # per-query noop-sink timing (guide §1.4)

Numbers from here are cited in OPTIMIZATION_r08.md; the driver's
comparison still runs the round-start bench.py.
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("OPENBLAS_NUM_THREADS", "1")
os.environ.setdefault("OMP_NUM_THREADS", "1")

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

DATAOPS = [
    "extract_images", "token_count", "lang_id", "quality_signals",
    "doc_fingerprint", "dedup_exact", "dedup_jaccard_pairs",
    "dedup_minhash_lsh", "simhash", "simhash_near_dups",
    "ann_cosine_topk", "ann_lsh_topk", "ann_ivf_topk",
    "embedding_near_dups",
]


def _session():
    from img_spark.plans.session import get_spark

    s = get_spark(app="img-spark-bench-extra", master=f"local[{CPUS}]",
                  shuffle_partitions=CPUS)
    s.conf.set("spark.sql.files.maxPartitionBytes", "8m")
    return s


def _force(df):
    from pyspark.sql import functions as F

    return df.select(
        F.count("*").alias("n"),
        F.expr("bit_xor(xxhash64(struct(*)))").alias("chk"),
    ).collect()[0]["n"]


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "time"
    names = sys.argv[2:] or DATAOPS
    from img_spark.plans import queries as Q

    all_q = Q.all_queries()
    spark = _session()
    if mode == "plans":
        suffix = os.environ.get("PLAN_SUFFIX", "before")
        outdir = os.path.join(REPO, "plans", "r08")
        os.makedirs(outdir, exist_ok=True)
        for name in names:
            df = all_q[name](spark, SF_DIR)
            p = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
            with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as f:
                f.write(p)
            print(f"wrote {name}_{suffix}.txt")
        return
    reps = int(os.environ.get("REPS", "3"))
    out = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"r08:{name}")
        ts = []
        for _ in range(reps):
            t0 = time.time()
            if mode == "noop":
                all_q[name](spark, SF_DIR).write.format("noop").mode(
                    "overwrite"
                ).save()
            else:
                _force(all_q[name](spark, SF_DIR))
            ts.append(round(time.time() - t0, 3))
        out[name] = ts
        print(name, ts, flush=True)
    spark.sparkContext.setJobDescription(None)


if __name__ == "__main__":
    main()
