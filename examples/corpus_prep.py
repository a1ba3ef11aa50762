"""LLM training-corpus preparation: unicode normalization -> heuristic
quality gate -> exact dedup -> near-dup detection -> semantic dedup ->
accounting -> decontamination -> boilerplate/paragraph dedup ->
perplexity band -> language-mix sampling -> epoch upsampling ->
train/val split -> epoch-shuffled ordering -> BPE-budgeted packing.

Usage: python examples/corpus_prep.py [sf_dir]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from eel_spark.caching import pin, release_pins, release_stages, stage
from eel_spark.operators import dedup
from eel_spark.session import get_session

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
spark = get_session("corpus-prep-example")
docs = spark.read.parquet(f"{sf_dir}/documents.parquet")

# 0. NFKC normalization (fold invisible/compat characters BEFORE any
#    hashing — they split dedup keys) + Gopher heuristic gate. The
#    synthetic corpus is short-doc and has a one-stopword vocabulary,
#    so the word-count band and required-stopword rules are relaxed
#    here; on a real crawl keep the published defaults.
from eel_spark.functions.pytext import normalize_unicode
from eel_spark.functions.text import gopher_keep

n_raw = docs.count()
docs = docs.withColumn("text", normalize_unicode("text"))
docs = docs.filter(gopher_keep("text", min_words=10, min_stopword_hits=1))
print(f"raw docs: {n_raw} -> after normalize + gopher gate: {docs.count()}")

# 1. exact dedup first (cheap, removes verbatim copies).
#    PIN the survivor table (tracked MEMORY_AND_DISK persist): every
#    later stage reads it, and this script takes a dozen actions —
#    without the pin each one re-executes the normalize+gate+dedup
#    lineage from the raw scan (measured: the un-pinned script re-ran
#    ~1100 stages and tripled its wall time). At 100 TB you'd stage
#    these boundaries to parquet; pin() is the single-job equivalent
#    (SURVEY §4 rule) and release_pins() at the end frees the caches.
survivors = pin(dedup.dedup_exact(docs, "text", "doc_id"))
print(f"-> exact-dedup survivors: {survivors.count()}")

# 2. near-dup pairs among the survivors (LSH-bounded, bucket-capped)
pairs = pin(dedup.minhash_near_duplicates(
    survivors, "text", "doc_id", threshold=0.5, max_bucket_size=1000
))
print("near-duplicate pairs (exact-Jaccard verified):")
pairs.orderBy(F.desc("jaccard")).show(10)

# 2b. semantic dedup: paraphrase-level duplicates MinHash can't see —
#     cluster the embedding space, pairwise cosine within clusters only,
#     keep the farthest-from-centroid member of each duplicate group
from eel_spark.operators import semdedup

emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
sem = semdedup.semantic_dedup(
    survivors.join(emb.select(F.col("vec_id").alias("doc_id")), "doc_id", "left_semi"),
    emb, id_col="doc_id", n_cells=8, threshold=0.98, train_sample_mod=2,
)
print(f"semantic dedup over embedded docs: kept {sem.count()}")

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

# 5a. global paragraph dedup: a duplicated paragraph survives only at
#     its first (doc, pos) occurrence (slim shuffle: text never moves)
clean = dedup.dedup_paragraphs(clean, "text", "doc_id", min_chars=40)
clean = clean.filter(F.length(F.trim("text")) > 0)

# 5b. perplexity band filter: unigram LM trained on the cleaned corpus;
#     keep the middle band (very low = boilerplate, very high = gibberish)
from eel_spark.operators.quality_model import score_perplexity, train_unigram_lm

vocab, oov_logp = train_unigram_lm(clean, min_count=2)
ppl = score_perplexity(clean, vocab, oov_logp)
# STAGE the scored corpus (same rationale as the train stage below):
# seven operator families of lineage end here; the quantile probe, the
# band filter, and steps 6-10 all act on the result, and each should
# plan from a flat scan, not re-execute the cleaning pipeline — so the
# boundary lands BEFORE the first of those actions (approxQuantile),
# making this the lineage's single execution. stage() is the library's
# tracked write/re-read boundary (eel_spark.caching) — it allocates
# under the session staging root and release_stages() reaps the files
# at the end.
import tempfile

ppl = stage(ppl)
lo, hi = ppl.approxQuantile("bits_per_token", [0.05, 0.95], 0.01)
clean = ppl.filter(F.col("bits_per_token").between(lo, hi)).drop("bits_per_token")
print(f"perplexity band [{lo:.2f}, {hi:.2f}] bits/token keeps {clean.count()}")

# 6. language mixing: exact 300-doc budget, temperature-flattened toward
#    rare languages (count^(1/2) weighting), deterministic by content hash
mixed = pin(sampling.proportional_budget_sample(
    clean, "lang", 300, ["doc_id"], temperature=2.0
))
print("language mix after temperature sampling:")
mixed.groupBy("lang").count().orderBy("lang").show()

# 7. composition: SPLIT FIRST on the document key (so every copy of a
#    doc stays on one side — splitting after replication would leak
#    training docs into validation), and split LEAKAGE-SAFE: the step-2
#    near-dup pairs constrain near-identical docs to the same side, so
#    a paraphrase of a training doc can't inflate validation scores.
#    Then upsample only the train side: 2 epochs of the curated
#    src1/src2 slices, 1.5 of everything else. Finally an
#    epoch-interleaved deterministic global shuffle.
# the pairs path derives connected components INSIDE the split —
# an iterative job whose every round would otherwise re-execute the
# pair lineage; the pinned pairs table bounds it
split = pin(sampling.leakage_safe_split(
    mixed, {"train": 0.95, "valid": 0.05}, "doc_id", pairs=pairs
))
leaks = sampling.split_leakage_report(split, pairs, "doc_id")
assert leaks.count() == 0, "near-dup pair straddles train/valid"
print("split leakage audit: clean (no near-dup pair straddles splits)")
train = split.filter("split = 'train'")
weights = F.when(F.col("source").isin("src1", "src2"), F.lit(2.0)).otherwise(1.5)
weighted = sampling.replicate_by_weight(
    train, weights, ["doc_id"], epoch_col="epoch"
)
train = sampling.shuffle_rows(weighted, ["doc_id", "epoch"], seed=1)
# STAGE the finished train split to storage and re-read it: the
# composition boundary. Ten operator families are stacked above the
# raw scan by now; carrying that lineage into BPE + packing makes
# every downstream action re-plan (and at 100 TB re-run) the whole
# pipeline — and the plan itself grows until AQE's plan-change logging
# OOMs the driver (observed at 8g). A pin caches DATA but keeps the
# plan; writing the boundary truncates both. This is what a real
# pipeline does between prep and tokenize/pack stages.
train = stage(train)
print(f"split -> train docs upsampled to {train.count()} copies (staged)")

# 8. pack the shuffled training docs into 2048-token sequences, sized
#    by a REAL trained tokenizer: BPE merges learned from the training
#    split itself (one corpus scan + a driver loop over word types),
#    counts from the Arrow-batched encoder. Epoch copies share doc_id,
#    so pack by the unique (doc, epoch) key.
from eel_spark.operators import bpe

merges = bpe.train_bpe(train, "text", num_merges=500, max_word_types=20000)
print(f"BPE: learned {len(merges)} merges from the train split")
sized = train.withColumn(
    "copy_id", F.concat_ws("#", "doc_id", "epoch")
).withColumn("n_tokens", bpe.bpe_token_count("text", merges))
packed = packing.pack_sequences(sized, "copy_id", "n_tokens", 2048, n_shards=8)
packing.packing_stats(packed, "n_tokens", 2048).show()

# 9. publish the dataset card for the final training corpus
import json

from eel_spark.operators.datasheet import corpus_datasheet

card = corpus_datasheet(
    train, "text", group_cols=("lang",),
    gopher_kwargs={"min_words": 10, "min_stopword_hits": 1},
)
print("dataset card:", json.dumps(card, default=str)[:400], "...")

# 10. materialize the packed training set with size-targeted files —
#     the small-files lever: shard count follows the data volume, not
#     the shuffle width, so the NEXT job's scan opens a bounded number
#     of right-sized files (at 100 TB the default would write one shard
#     per shuffle task — thousands of KB-scale files per directory)
from eel_spark.scale import write_sized_files

out_dir = os.path.join(tempfile.mkdtemp(prefix="corpus_prep_"), "train_packed")
n_files = write_sized_files(packed, out_dir, target_mb=64.0)
print(f"wrote packed training set as {n_files} size-targeted files -> {out_dir}")

release_pins()  # standalone script: free the pinned caches
release_stages()  # reap the staged boundary files (downstream all done)
# the per-session staging root itself (now empty) goes too — but ONLY
# if it was auto-allocated: a user-preset stage.dir may be shared
# durable storage holding other runs' stages
from eel_spark.caching import release_stage_root

release_stage_root(spark)
