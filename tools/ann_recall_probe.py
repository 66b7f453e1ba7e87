"""ANN recall probe: measure recall@k of the approximate similarity
paths (sign-LSH, IVF) against the exact brute-force baseline at sf0.1
AND at the 10× replica — the check that approximate recall does not
silently decay as corpus density grows.

Why density matters: LSH bucket occupancy and IVF cell occupancy both
grow linearly with corpus size while the bucket/cell COUNT stays fixed,
so a 10× corpus packs ~10× more near-neighbors into the same hash
cells. Recall usually *rises* with density for a fixed k (more true
neighbors collide somewhere); what must not happen is a silent drop
from bucket saturation or quantizer drift. This probe measures it
instead of assuming.

Uses the same 10× replica as tools/scale_probe.py (generated on demand).
Recall@k = |approx ∩ exact| / |exact| over the same query set, exact
ties included. Prints one JSON line.

Usage: python tools/ann_recall_probe.py
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from march_mania_spark_lakehouse_spark.operators import similarity  # noqa: E402
from march_mania_spark_lakehouse_spark.session import get_spark  # noqa: E402

SMALL = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
K = 10
N_QUERIES = 20
TOPK = 10


def pairs(df) -> set:
    return {(r["q_id"], r["c_id"]) for r in df.collect()}


def recall(approx, exact) -> float:
    e, a = pairs(exact), pairs(approx)
    return round(len(e & a) / len(e), 4)


def main() -> None:
    spark = get_spark("ann_recall_probe")
    spark.sparkContext.setLogLevel("ERROR")

    import scale_probe  # sibling module: reuse the 10x replica recipe

    if not os.path.isdir(os.path.join(scale_probe.BIG, "embeddings.parquet")):
        scale_probe.generate(spark)

    out = {}
    for label, sf_dir in (("sf0.1", SMALL), ("x10", scale_probe.BIG)):
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.count()
        # fixed query set present at both scales (vec_id < N_QUERIES are
        # originals, not offset copies)
        q = emb.filter(F.col("vec_id") < N_QUERIES)
        exact = similarity.cosine_topk_bruteforce(emb, q, k=TOPK)
        lsh = similarity.cosine_topk_lsh(
            emb, q, k=TOPK, n_planes=3, n_tables=8
        )
        ivf = similarity.cosine_topk_ivf(
            emb, q, k=TOPK, n_cells=16, n_probe=4
        )
        pq = similarity.cosine_topk_pq(emb, q, k=TOPK)
        out[label] = {
            "corpus": n,
            "recall_lsh": recall(lsh, exact),
            "recall_ivf": recall(ivf, exact),
            "recall_pq": recall(pq, exact),
        }
        print(f"# {label}: {out[label]}", file=sys.stderr)

    print(json.dumps({"k": TOPK, "n_queries": N_QUERIES, "recall": out},
                     separators=(",", ":")))
    spark.stop()


if __name__ == "__main__":
    main()
