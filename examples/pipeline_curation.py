#!/usr/bin/env python
"""Training-data curation walkthrough — every stage a 100 TB pipeline
runs, composed on this engine over the documents fixture:

    python examples/pipeline_curation.py [sf_dir]

0.  quality gate       one-pass column profile + declarative constraints
1.  exact dedup        keep one doc per normalized-text fingerprint
2.  near-dup clusters  3-gram Jaccard pairs → connected components
2b. semantic dedup     k-means cells → within-cell cosine prune (embeddings)
3.  decontamination    drop docs overlapping the benchmark (src0) set
4.  quality filter     C4-style length / token / score chain
5.  PII redaction      regex detect + redact (counts per category)
6.  weighted sample    deterministic integer-A-Res domain reweighting
7.  split + packing    reproducible train/test split, 512-token bins

Each stage is the oracled operator from the registry, composed
unchanged; the end-to-end form also runs as ONE fused plan
(`pipeline_end_to_end` in the registry).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from pyspark.sql import Window
from pyspark.sql import functions as F

from iceberg_datafusion_arrow_flight_spark import get_spark
from iceberg_datafusion_arrow_flight_spark.operators import dedup as D
from iceberg_datafusion_arrow_flight_spark.operators import pipeline as P
from iceberg_datafusion_arrow_flight_spark.operators import text as T


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(master="local[4]")
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    print(f"corpus: {docs.count()} docs from {sf_dir}")

    # 0. quality gate — profile the corpus, hard-fail on broken invariants
    P.profile_columns(docs, ["doc_id", "lang", "source", "n_chars"]).show()
    gate = P.check_constraints(docs, [
        ("doc_id_not_null", F.col("doc_id").isNotNull()),
        ("n_chars_matches_text", F.length("text") == F.col("n_chars")),
    ])
    gate.show()
    assert gate.where("NOT passed").count() == 0, "quality gate failed"

    # 1. exact dedup — keep the smallest id per fingerprint group
    fp = F.md5(D.normalize_text(F.col("text")).cast("binary"))
    deduped = (docs.withColumn(
        "__rep", F.min("doc_id").over(Window.partitionBy(fp)))
        .where(F.col("doc_id") == F.col("__rep")).drop("__rep"))
    print(f"after exact dedup: {deduped.count()}")

    # 2. near-dup clusters (reporting only here; a stricter pipeline
    #    would keep each cluster's representative)
    pairs = D.ngram_jaccard_pairs(docs, "doc_id", "text", n=3,
                                  threshold_num=8, threshold_den=10)
    comps = D.connected_components(pairs)
    n_clusters = comps.select("label").distinct().count()
    print(f"near-dup clusters (J>=0.8): {n_clusters} "
          f"covering {comps.count()} docs")

    # 2b. semantic dedup on the embedding table (SemDeDup shape)
    from iceberg_datafusion_arrow_flight_spark.operators import (
        similarity as S)
    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    sem_kept = S.semantic_dedup(emb, n_clusters=16, threshold=0.35)
    print(f"semantic dedup: kept {sem_kept.count()} of {emb.count()} "
          f"embeddings")

    # 3. decontamination — src0 plays the held-out benchmark
    corpus = deduped.where(F.col("source") != "src0")
    bench = docs.where(F.col("source") == "src0")
    contaminated = (P.decontaminate(corpus, bench, n=3)
                    .where(F.col("contamination") > 0.15))
    clean = corpus.join(contaminated.select("doc_id"), "doc_id", "left_anti")
    print(f"decontamination: dropped {contaminated.count()}, "
          f"kept {clean.count()}")

    # 4. quality filter
    kept = P.quality_filter(clean)
    print(f"quality filter: kept {kept.count()}")

    # 5. PII scan + redaction (fixture text is synthetic; real corpora
    #    redact in place exactly like this)
    counts = P.pii_counts(F.col("text"))
    pii = kept.select(
        F.sum(counts["email"]).alias("emails"),
        F.sum(counts["phone"]).alias("phones"),
        F.sum(counts["ip"]).alias("ips")).first()
    kept = kept.withColumn("text", P.redact_pii(F.col("text")))
    print(f"PII redacted: {pii.asDict()}")

    # 6. domain reweighting — deterministic weighted sample (en 4x, de 2x)
    weighted = kept.withColumn(
        "weight", F.when(F.col("lang") == "en", 4)
                   .when(F.col("lang") == "de", 2).otherwise(1).cast("int"))
    balanced = P.weighted_sample(weighted, "doc_id", "weight",
                                 k=max(kept.count() // 2, 1)).drop("weight")
    balanced.groupBy("lang").count().orderBy("lang").show()

    # 7. reproducible split + sequence packing
    split = P.train_test_split(balanced)
    split.groupBy("split").count().orderBy("split").show()
    packed = P.pack_sequences(split, token_budget=512)
    packed.groupBy("lang").agg(
        F.max("bin_id").alias("bins"),
        F.sum("n_tokens").alias("tokens")).orderBy("lang").show()

    # 8. corpus health report — the statistical monitors, one line each
    from iceberg_datafusion_arrow_flight_spark.plans import REGISTRY
    zipf = REGISTRY["text_zipf_law_fit"].build(spark, sf_dir).first()
    chi2 = REGISTRY["text_chi2_lang_source"].build(spark, sf_dir).first()
    print(f"health: zipf slope {zipf['zipf_slope']} "
          f"(R2 {zipf['zipf_r2']}); lang-by-source chi2 "
          f"{chi2['chi2_stat']} @ {chi2['dof']} dof")
    print("top collocations:")
    REGISTRY["text_pmi_collocations"].build(spark, sf_dir).show(5)
    print("per-source KL vs rest:")
    REGISTRY["text_unigram_kl_by_source"].build(spark, sf_dir).show()

    # 9. seeded epoch shuffle — identical on every worker and rerun
    REGISTRY["pipeline_seeded_shuffle_shards"].build(spark, sf_dir) \
        .groupBy("shard").count().orderBy("shard").show()

    spark.stop()


if __name__ == "__main__":
    main()
