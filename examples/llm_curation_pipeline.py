#!/usr/bin/env python
"""End-to-end LLM training-data curation walkthrough over the
``documents`` fixture — the round-6 operators composed the way a real
pipeline runs them, each stage printing its accounting:

1. URL gate        — derive crawl URLs, canonical-URL dedup, then the
                     C4 domain/path blocklist (operators/pipeline.py).
2. Quality funnel  — the C4/Gopher chain with per-gate drop accounting
                     (one corpus scan).
3. Near-dup prune  — MinHash-LSH pairs -> connected components -> keep
                     the min-id representative per cluster.
4. Decontaminate   — n-gram overlap vs the benchmark source (src0) and
                     the cross-corpus LSH embedding twin.
5. Packing audit   — tokenizer-aware boundary-loss accounting, then the
                     prescribed token-budget mixture.

Run: ``python examples/llm_curation_pipeline.py [sf_dir]``
(default /root/testdata/sf0.001; sf0.01 takes ~1 min).
"""

from __future__ import annotations

import sys

from pyspark.sql import functions as F

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from iceberg_datafusion_arrow_flight_spark import get_spark  # noqa: E402
from iceberg_datafusion_arrow_flight_spark.operators import (  # noqa: E402
    dedup as D,
    pipeline as P,
    text as T,
)
from iceberg_datafusion_arrow_flight_spark.sources.registry import (  # noqa: E402
    load_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark(app_name="llm-curation-example")
    docs = load_table(spark, sf_dir, "documents")
    n0 = docs.count()
    print(f"corpus: {n0} docs from {sf_dir}")

    # -- 1. URL gate ------------------------------------------------
    flagged = P.url_domain_filter(
        P.derive_urls(docs),
        blocked_domains=["src3.example.com", "src7.example.com"],
        blocked_path_terms=["/es/"])
    kept_urls = flagged.where(F.col("kept"))
    print(f"url gate: {kept_urls.count()}/{n0} kept "
          f"(domain blocklist + path terms)")

    # -- 2. quality funnel -------------------------------------------
    kept = P.quality_filter(kept_urls)
    print(f"quality funnel: {kept.count()} kept "
          f"(char band + min tokens + composite score)")

    # -- 3. near-dup prune --------------------------------------------
    pairs = D.minhash_lsh_pairs(kept, "doc_id", "text")
    comps = D.connected_components(pairs)  # (node, label=min member id)
    dropped = (comps.where(F.col("node") != F.col("label"))
               .select(F.col("node").alias("doc_id")))
    deduped = kept.join(dropped, "doc_id", "left_anti")
    print(f"near-dup prune: {deduped.count()} kept "
          f"({dropped.count()} cluster-duplicates removed)")

    # -- 4. decontamination -------------------------------------------
    bench = docs.where(F.col("source") == "src0")
    contaminated = P.decontaminate(
        deduped.where(F.col("source") != "src0"), bench, n=3)
    print(f"decontaminate: {contaminated.count()} docs flagged for "
          f"3-gram overlap with the benchmark source")

    # -- 5. packing audit + mixture ------------------------------------
    clean = (deduped.where(F.col("source") != "src0")  # bench never trains
             .join(contaminated.select("doc_id"), "doc_id", "left_anti"))
    audit = (P.pack_boundary_accounting(clean, token_budget=512)
             .agg(F.count("*").alias("docs"),
                  F.sum("n_tokens").alias("tokens"),
                  F.sum(F.col("crosses").cast("int")).alias("crossings"),
                  F.sum("boundary_loss").alias("loss"))
             .first())
    print(f"packing audit: {audit['tokens']} subword tokens, "
          f"{audit['crossings']} boundary crossings, "
          f"{audit['loss']} tokens lost to truncate-at-boundary")

    mixture = (clean.groupBy("source")
               .agg(F.sum(T.token_count(F.col("text"))).alias("tok"))
               .orderBy(F.col("tok").desc()).limit(3).collect())
    print("top sources by tokens:",
          ", ".join(f"{r['source']}={r['tok']}" for r in mixture))
    spark.stop()
    print("OK")


if __name__ == "__main__":
    main()
