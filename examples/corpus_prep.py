"""LLM training-corpus preparation: boilerplate removal -> exact dedup ->
near-dup detection -> accounting -> decontamination -> language-mix
sampling -> sequence packing.

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

# 5. cross-doc boilerplate: strip lines that recur in >=20% of docs
from eel_spark.operators import packing, sampling

clean = dedup.remove_boilerplate_lines(clean, "text", "doc_id", min_doc_fraction=0.2)

# 6. language mixing: exact 300-doc budget, temperature-flattened toward
#    rare languages (count^(1/2) weighting), deterministic by content hash
mixed = sampling.proportional_budget_sample(
    clean, "lang", 300, ["doc_id"], temperature=2.0
)
print("language mix after temperature sampling:")
mixed.groupBy("lang").count().orderBy("lang").show()

# 7. pack the sampled docs into 2048-token training sequences
sized = mixed.withColumn("n_tokens", F.size(F.split("text", r"\s+")))
packed = packing.pack_sequences(sized, "doc_id", "n_tokens", 2048, n_shards=8)
packing.packing_stats(packed, "n_tokens", 2048).show()
