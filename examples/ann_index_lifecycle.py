"""Incremental ANN index lifecycle over the embeddings table: train
centroids + PQ codebooks on the first wave, freeze them in an index,
append arrival waves (each wave's postings land in their own batch
partition — no corpus re-encode, ever), query it three ways (exact IVF,
BQ Hamming-prefiltered, PQ ADC-scan), watch the drift report for the
retrain signal, ACT on it (reindex_ivf_index retrains the centroids and
rewrites the postings around them under the staged-swap crash
contract), and compact the accumulated batch files.

This is the 100 TB shape: a crawling corpus appends embeddings daily;
queries prune to probed cells' partitions and scan codes (bytes), not
vectors (floats); compaction bounds the file count, not the fold.

Usage: python examples/ann_index_lifecycle.py [sf_dir]
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eel_spark.operators.similarity import (
    append_ivf_batch,
    compact_ivf_index,
    init_ivf_index,
    ivf_bq_topk_against_index,
    ivf_drift_report,
    ivf_index_report,
    ivf_pq_topk_against_index,
    ivf_topk_against_index,
    reindex_ivf_index,
    train_centroids,
    train_pq,
)
from eel_spark.session import get_session

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_session("ann-index-lifecycle-example")

emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
    "vec_id", "embedding"
)
dim = emb.select(F.size("embedding").alias("d")).first()["d"]

# --- train on the first wave (in production: a sample of it) ---------------
wave0 = emb.where(F.col("vec_id") % 3 == 0)
centroids = train_centroids(wave0, n_cells=8, iterations=2)
books = train_pq(wave0, dim=dim, n_subs=8, n_codes=16, iterations=2)

with tempfile.TemporaryDirectory() as work:
    index = os.path.join(work, "ann_index")
    init_ivf_index(index, centroids, pq_books=books)

    # --- arrival waves append; nothing already stored is touched -----------
    for w in range(3):
        append_ivf_batch(
            index, emb.where(F.col("vec_id") % 3 == w), src_batch=w
        )

    queries = emb.where(F.col("vec_id") < 5).withColumnRenamed(
        "vec_id", "query_id"
    )
    # materialize the pre-compaction answer NOW: compaction deletes the
    # files this plan reads, so a later re-collect would only work while
    # completed shuffle stages happen to be reusable — not a guarantee
    exact = ivf_topk_against_index(spark, index, queries, k=5, n_probe=3)
    exact_rows = sorted(map(tuple, exact.collect()))
    bq = ivf_bq_topk_against_index(
        spark, index, queries, k=5, n_probe=3, refine=8
    )
    pq = ivf_pq_topk_against_index(
        spark, index, queries, k=5, n_probe=3, refine=8
    )
    exact_sets = {}
    for qid, vid, _cos, _rank in exact_rows:
        exact_sets.setdefault(qid, set()).add(vid)
    for name, fast in (("bq", bq), ("pq", pq)):
        fast_sets = {}
        for r in fast.collect():
            fast_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
        rec = [
            len(exact_sets[q] & fast_sets.get(q, set())) / len(exact_sets[q])
            for q in exact_sets
        ]
        print(f"{name} recall@5 vs in-index exact: {sum(rec) / len(rec):.2f}")

    # --- drift + balance: the retrain / re-shard signals --------------------
    print("drift per batch (rising mean_dist => retrain):")
    for r in ivf_drift_report(spark, index).collect():
        print(f"  batch {r['src_batch']}: n={r['n_vectors']} "
              f"mean_dist={r['mean_dist']:.4f}")
    skew = ivf_index_report(spark, index).agg(
        F.max("n_vectors").alias("mx"), F.min("n_vectors").alias("mn")
    ).first()
    print(f"cell balance: largest {skew['mx']} vs smallest {skew['mn']}")

    # --- act on the drift signal: retrain + rewrite -------------------------
    # a drifted wave: vectors nowhere near the frozen centroids (the
    # crawl found a new content region). Its drift row spikes; reindex
    # retrains centroids over ALL stored postings and re-assigns every
    # posting — sketches/codes carry through (they depend on the vector
    # and the frozen books, not the centroids), per-batch partitions and
    # drift history are preserved, and the swap is crash-safe.
    drifted = emb.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.reverse(F.transform(
            "embedding", lambda x: F.lit(-3.0) * x.cast("double")
        )).alias("embedding"),
    ).where(F.col("vec_id") % 7 == 0)
    append_ivf_batch(index, drifted, src_batch=3)
    last = ivf_drift_report(spark, index).orderBy("src_batch").collect()[-1]
    print(f"drifted batch {last['src_batch']}: "
          f"mean_dist={last['mean_dist']:.4f} (spiked => retrain)")
    reindex_ivf_index(spark, index, n_cells=8, iterations=2)
    skew2 = ivf_index_report(spark, index).agg(
        F.max("n_vectors").alias("mx"), F.min("n_vectors").alias("mn")
    ).first()
    print(f"post-reindex cell balance: largest {skew2['mx']} "
          f"vs smallest {skew2['mn']}")
    # the acted-on spike is now history: stale_epoch marks every batch
    # measured against the replaced centroids, so retrain automation
    # watches only the fresh (stale_epoch = false) trend
    stale = ivf_drift_report(spark, index).where("stale_epoch").count()
    print(f"drift rows marked stale_epoch after retrain: {stale}")
    post = ivf_topk_against_index(spark, index, queries, k=5, n_probe=3)
    print(f"post-reindex query still serves {post.count()} result rows")

    # --- compact the per-batch file sets ------------------------------------
    pre_compact = sorted(map(tuple, post.collect()))
    compact_ivf_index(spark, index)
    again = ivf_topk_against_index(spark, index, queries, k=5, n_probe=3)
    assert sorted(map(tuple, again.collect())) == pre_compact, (
        "compaction must not change results"
    )
    print("compacted: results identical, one file set per kp partition")
