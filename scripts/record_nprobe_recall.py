"""Record the IVF recall-vs-nprobe trade as a bench artifact
(VERDICT r10 #5): sweep nprobe over {1, 2, 4, 8, 16} for the plain and
the filtered IVF paths, compute mean recall@5 against the exact cosine
baseline over the same candidate universe, and merge the curve into
BENCH_local.json under the "nprobe_recall" key (bench.py preserves
foreign top-level keys across its own rewrites).

A user sizing an index reads THIS curve to pick nprobe; the registered
production point (operators/similarity.IVF_PRODUCTION_NPROBE) is pinned
>= 0.9 mean recall by ann_recall_ivf_production and its regression test.

Usage: python scripts/record_nprobe_recall.py [sf_dir ...]
       (defaults: /root/testdata/sf0.01 /root/testdata/sf0.1)
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from flink_repartition_watermark_example_spark import get_spark
from flink_repartition_watermark_example_spark.operators import similarity as SIM
from flink_repartition_watermark_example_spark.sources.tables import load_table

# The sweep includes the crossing region: on this corpus recall grows
# ~linearly with probed fraction (isotropic synthetic embeddings — no
# cluster structure for the coarse quantizer to exploit), so the 0.9
# crossing sits near-exhaustive; the curve documents that honestly.
NPROBES = [1, 2, 4, 8, 12, 14, 15, 16]
K = 5
FILTER_LABELS = [0, 2, 4, 6, 8]  # the registered filtered-ANN predicate


def mean_recall(approx, exact) -> float:
    hits = (
        exact.select("query_id", "vec_id")
        .join(approx.select("query_id", "vec_id"), ["query_id", "vec_id"])
        .count()
    )
    n_queries = exact.select("query_id").distinct().count()
    return round(hits / (K * n_queries), 4)


def main() -> None:
    sf_dirs = sys.argv[1:] or ["/root/testdata/sf0.01", "/root/testdata/sf0.1"]
    spark = get_spark(app_name="nprobe-recall")
    from flink_repartition_watermark_example_spark.operators import kmeans as KM

    curve: dict[str, dict] = {}
    for sf_dir in sf_dirs:
        sf_key = os.path.basename(sf_dir.rstrip("/"))
        emb = load_table(spark, sf_dir, "embeddings")
        pred = F.col("label").isin(*FILTER_LABELS)
        exact_plain = SIM.cosine_topk(emb).persist()
        exact_filt = SIM.cosine_topk(
            emb.where((F.col("vec_id") < 10) | pred)
        ).persist()
        # trained-index baseline: nprobe = all lists probes every
        # candidate, i.e. the exhaustive search in the trained index's
        # own quantized integer-L2 metric
        exact_trained = KM.ivf_trained_topk(
            emb, nprobe=len(SIM.CENTROID_IDS)
        ).persist()
        exact_plain.count(), exact_filt.count(), exact_trained.count()
        rows = {}
        for nprobe in NPROBES:
            plain = mean_recall(SIM.ivf_topk(emb, nprobe=nprobe), exact_plain)
            filt = mean_recall(
                SIM.ivf_topk(emb, nprobe=nprobe, corpus_pred=pred), exact_filt
            )
            trained = mean_recall(
                KM.ivf_trained_topk(emb, nprobe=nprobe), exact_trained
            )
            rows[str(nprobe)] = {
                "ivf": plain,
                "ivf_filtered": filt,
                "ivf_trained": trained,
            }
            print(
                f"{sf_key} nprobe={nprobe}: ivf={plain} filtered={filt} "
                f"trained={trained}",
                flush=True,
            )
        exact_plain.unpersist(), exact_filt.unpersist()
        exact_trained.unpersist()
        curve[sf_key] = rows
    out = {
        "k": K,
        "n_lists": len(SIM.CENTROID_IDS),
        "production_nprobe": SIM.IVF_PRODUCTION_NPROBE,
        "gate_nprobe": SIM.NPROBE,
        "curves": curve,
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "BENCH_local.json",
    )
    try:
        with open(path) as f:
            artifact = json.load(f)
    except (OSError, json.JSONDecodeError):
        artifact = {}
    artifact["nprobe_recall"] = out
    with open(path, "w") as f:
        json.dump(artifact, f)
        f.write("\n")
    print(json.dumps({"metric": "nprobe_recall_recorded",
                      "sf_dirs": sf_dirs, "value": out["production_nprobe"]}))


if __name__ == "__main__":
    main()
