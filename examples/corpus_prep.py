"""LLM training-corpus preparation: quality gate -> exact dedup ->
near-dup detection -> corpus accounting.

Usage: python examples/corpus_prep.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eel_spark.operators import dedup
from eel_spark.session import get_session

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_session("corpus-prep-example")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

# 1. exact dedup first (cheap, removes verbatim copies)
survivors = dedup.dedup_exact(docs, "text", "doc_id")
print(f"docs: {docs.count()} -> exact-dedup survivors: {survivors.count()}")

# 2. near-dup pairs among the survivors (LSH-bounded, bucket-capped)
pairs = dedup.minhash_near_duplicates(
    survivors, "text", "doc_id", threshold=0.5, max_bucket_size=1000
)
print("near-duplicate pairs (exact-Jaccard verified):")
pairs.orderBy(F.desc("jaccard")).show(10)

# 3. corpus accounting per (lang, source)
survivors.groupBy("lang", "source").count().orderBy("lang", "source").show()

# 4. decontamination: drop survivors sharing long n-grams with an eval set
#    (here: a held-out slice of the corpus stands in for the benchmark)
evals = docs.limit(5).select("doc_id", "text")
contaminated = dedup.ngram_contamination(survivors, evals, n=13)
clean = survivors.join(
    contaminated.select(F.col("corpus_id").alias("doc_id")).distinct(),
    "doc_id", "left_anti",
)
print(f"decontamination: {survivors.count()} -> {clean.count()} "
      f"(dropped {contaminated.select('corpus_id').distinct().count()} overlapping eval)")
