"""Retrieval-eval set construction over the documents corpus: score a
batch of topic queries with multi-query BM25 (ONE corpus scan for all
queries), take the per-query top-k as positives, and mine the next
ranks as hard negatives — the (query, positive, hard-negative) triples
a retrieval model trains and evaluates on.

Usage: python examples/retrieval_eval.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from eel_spark.caching import release_pins
from eel_spark.operators.retrieval import (
    append_bm25_stats_batch,
    bm25_term_stats_multi,
    bm25_topk_multi,
    bm25_topk_multi_against_stats,
    read_bm25_stats,
    reciprocal_rank_fusion,
    retrieval_metrics,
)
from eel_spark.operators.similarity import bq_topk
from eel_spark.queries.tables import table
from eel_spark.session import get_session

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_session("retrieval-eval-example")

docs = table(spark, sf_dir, "documents").df

QUERIES = {
    "storage_ops": ["merge", "scan", "compaction"],
    "windowing": ["window", "watermark", "stream"],
    "query_planning": ["filter", "join", "partition"],
}
K = 5          # positives per query
N_HARD = 10    # hard negatives per query (ranks K+1 .. K+N_HARD)

# 1. integer sufficient statistics at (query, doc, term) grain — the
#    engine-neutral audit trail for the scores below
stats = bm25_term_stats_multi(docs, "text", "doc_id", QUERIES)
per_q = {
    r["query_id"]: (r["docs"], r["terms"])
    for r in stats.groupBy("query_id").agg(
        F.countDistinct("doc_id").alias("docs"),
        F.countDistinct("term").alias("terms"),
    ).collect()
}
for qid in sorted(QUERIES):
    d, t = per_q.get(qid, (0, 0))
    print(f"stats {qid:15s} matched_docs={d:5d} matched_terms={t}")

# 2. one ranked pool per query, deep enough for positives + negatives —
#    scored FROM the step-1 stats DataFrame (a fresh call would build a
#    new lineage and rescan the corpus), so the whole batch really is
#    one corpus scan + tokenize
pool = bm25_topk_multi(docs, "text", "doc_id", QUERIES, k=K + N_HARD,
                       stats=stats)

# 3. positives = top-K; hard negatives = the next N_HARD ranks (scored
#    high enough to be confusable, ranked low enough to teach contrast)
labeled = pool.withColumn(
    "role", F.when(F.col("rank") <= K, "positive").otherwise("hard_negative")
)
summary = labeled.groupBy("query_id", "role").agg(
    F.count(F.lit(1)).alias("n"),
    F.round(F.min("score"), 3).alias("min_score"),
    F.round(F.max("score"), 3).alias("max_score"),
)
for r in summary.orderBy("query_id", F.desc("role")).collect():
    print(f"{r['query_id']:15s} {r['role']:13s} n={r['n']:2d} "
          f"score=[{r['min_score']}, {r['max_score']}]")

# 4. the eval table itself: (query_id, doc_id, rank, role) joined back
#    to the doc text — broadcast the tiny labeled pool, not the corpus
eval_set = docs.select("doc_id", "lang", "source").join(
    F.broadcast(labeled), "doc_id"
)
w = Window.partitionBy("query_id", "role").orderBy("rank")
sample = eval_set.withColumn("__r", F.row_number().over(w)).where(
    "__r = 1"
).drop("__r")
for r in sample.orderBy("query_id", F.desc("role")).collect():
    print(f"example {r['query_id']:15s} {r['role']:13s} doc={r['doc_id']} "
          f"rank={r['rank']} score={r['score']:.3f} lang={r['lang']}")

n_pos = labeled.where("role = 'positive'").count()
n_neg = labeled.where("role = 'hard_negative'").count()
assert n_pos == K * len(QUERIES), (n_pos, K * len(QUERIES))
print(f"eval set: {n_pos} positives + {n_neg} hard negatives "
      f"across {len(QUERIES)} queries")

# 5. hybrid retrieval: pseudo-relevance feedback — each query's BM25
#    top-1 document supplies a query EMBEDDING, ANN top-k over the
#    embedding table gives a semantic ranking, and reciprocal rank
#    fusion combines both lists rank-only (no score calibration).
#    (The arms are composed by hand here because the lexical pool is
#    reused for the eval labels above; when you just want the fused
#    list, operators/retrieval.hybrid_topk is the one-call form.)
#    bq_topk is the 100×-scale dense arm: a Hamming prefilter over
#    packed sign sketches reads 32× less data than the float corpus,
#    then exact-cosine reranks the bounded candidate set — same output
#    format and tie-breaks as brute_force_topk (which remains the
#    labeled small-corpus baseline, not the template to copy).
emb = table(spark, sf_dir, "embeddings").df.select("vec_id", "embedding")
lexical = pool.select("query_id", "doc_id", "rank")
top1 = pool.where("rank = 1").select("query_id", F.col("doc_id").alias("vec_id"))
qvecs = top1.join(emb, "vec_id").select("query_id", "embedding")
semantic = bq_topk(
    emb, qvecs, id_col="vec_id", k=K + N_HARD, refine=8
).select("query_id", F.col("vec_id").alias("doc_id"), "rank")
hybrid = reciprocal_rank_fusion([lexical, semantic], "doc_id", k=K)
# sanity metric: how much of the lexical top-K the hybrid list retains
qrels = labeled.where("role = 'positive'").select("query_id", "doc_id")
m = retrieval_metrics(hybrid, qrels, "doc_id", k=K)
for r in m.orderBy("query_id").collect():
    print(f"hybrid {r['query_id']:15s} recall@{K}={r['recall_at_k']:.2f} "
          f"mrr={r['reciprocal_rank']:.2f}")

# 6. the streaming-corpus variant: maintain the corpus statistics
#    incrementally (two waves here; a stream would use
#    streaming_bm25_stats_sink), then rank a NEW wave for the whole
#    query batch against the maintained store — one wave scan, zero
#    history rescans
import shutil
import tempfile

_store_root = tempfile.mkdtemp(prefix="eel_bm25_store_")
store = _store_root + "/stats"
for i in range(2):
    append_bm25_stats_batch(
        store, docs.where(F.col("doc_id") % 2 == i), "text", src_batch=i
    )
union_terms = sorted({t for ts in QUERIES.values() for t in ts})
stats = read_bm25_stats(spark, store, union_terms)
new_wave = spark.createDataFrame(
    [(900001, "incremental merge compaction pipeline"),
     (900002, "watermarked window stream join"),
     (900003, "nothing relevant at all")],
    "doc_id long, text string",
)
ranked = bm25_topk_multi_against_stats(
    new_wave, "text", "doc_id", stats, QUERIES, k=2
)
for r in ranked.orderBy("query_id", "rank").collect():
    print(f"new-wave {r['query_id']:15s} rank={r['rank']} doc={r['doc_id']} "
          f"score={r['score']:.3f}")

# 7. the fully store-served hybrid (the 100 TB serving shape): BOTH
#    arms come from maintained state — BM25 stats from the increment
#    store above, dense candidates from an incremental IVF index —
#    so ranking a query batch rescans NO corpus history. One call:
#    hybrid_topk_against_stores.
from eel_spark.operators.retrieval import hybrid_topk_against_stores
from eel_spark.operators.similarity import (
    append_ivf_batch,
    init_ivf_index,
    train_centroids,
)

_index_root = tempfile.mkdtemp(prefix="eel_ivf_index_")
index = _index_root + "/index"
init_ivf_index(index, train_centroids(emb, n_cells=8, iterations=2))
for i in range(2):
    append_ivf_batch(
        index, emb.where(F.col("vec_id") % 2 == i), id_col="vec_id",
        src_batch=i,
    )
served = hybrid_topk_against_stores(
    spark, docs, "text", "doc_id", store, index,
    QUERIES, qvecs, k=K, n_probe=3, refine=8,
)
for r in served.orderBy("query_id", "rank").collect():
    print(f"store-served {r['query_id']:15s} rank={r['rank']} "
          f"doc={r['doc_id']} rrf={r['score']:.4f}")

release_pins()  # standalone script: free the BM25 tokenize caches
# drop the temp stores (r12 advice — corpus_prep.py's cleanup discipline)
shutil.rmtree(_store_root, ignore_errors=True)
shutil.rmtree(_index_root, ignore_errors=True)
spark.stop()
