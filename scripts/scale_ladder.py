"""Scale-ladder validation (VERDICT r10 ask #1): measure how the top-8
heaviest registry plans scale from a 1x to a 10x corpus, converting the
100 TB story from plan-shape argument to measurement.

Why NOT just extrapolate the driver fixture: the driver's documents
table draws every doc from a FIXED 30-word vocabulary, so token sets
saturate (median 25 of 31 distinct tokens per doc) and the TRUE
J>=0.9 pair count is quadratic in N by construction (measured 964,854
qualifying pairs at sf0.1's 5,000 docs).  Any engine, however good,
does Omega(true pairs) work — an exponent measured on that fixture
grades the fixture, not the plan.  The ladder corpora therefore grow
the vocabulary Heaps-style (V ∝ sqrt(N), the classic type-token law)
so per-doc posting density, candidate density, and true-pair-per-doc
rate stay ~constant across scales, and t(10x)/t(1x) isolates the
PLAN's scaling.  Near-dup structure (exact copies, 1-word-substituted
copies, contiguous excerpts, bounded template families) is injected at
a rate ∝ N with bounded group sizes, mirroring what real crawl dedup
sees.

Usage:
    python scripts/scale_ladder.py gen          # write x1 + x10 corpora
    python scripts/scale_ladder.py run          # measure, emit JSON
    python scripts/scale_ladder.py run --scales x1        # one scale

Outputs .scratch/ladder/{x1,x10}/{documents,lineitem,embeddings}.parquet
and prints one JSON object with per-query times, output rows, and the
log10 time ratio ("exponent"; 1.0 = perfectly linear, flag > 1.3).
"""
from __future__ import annotations

import argparse
import gc
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if ROOT not in sys.path:
    sys.path.insert(0, ROOT)
LADDER = os.path.join(ROOT, ".scratch", "ladder")
SEED = 7          # NOT the driver's 42
BASE_DOCS = 5_000
BASE_ORDERS = 150_000
BASE_VECS = 2_000

HEAVIES = [
    "dedup_containment",
    "sim_cross_corpus_decontaminate",
    "dedup_edit_distance",
    "graph_label_propagation",
    "graph_common_neighbors_jaccard",
    "graph_pagerank_supply_chain",
    "dedup_minhash_lsh",
    "multimodal_scene_cuts",
    # r12 (VERDICT r11 ask #7): the packed-adjacency edge-iterator's
    # exponent was never measured — on the ladder's bounded-degree
    # co-purchase graph the oriented out-degree bound should keep it
    # sub-linear; a >1 exponent here means degree-threshold splitting.
    "graph_triangle_count",
    "sim_ann_pq_topk",
]


# ---------------------------------------------------------------- gen

def _vocab(n_docs: int) -> np.ndarray:
    # Heaps' law with beta=0.5: V(5k)=300, V(50k)=~949 — keeps bigram
    # document frequency (n_docs * words_per_doc / V^2) constant (~2.8)
    v = int(round(300 * (n_docs / BASE_DOCS) ** 0.5))
    return np.array([f"w{i:04d}" for i in range(v)])

def gen_documents(out_dir: str, scale: int) -> None:
    n = BASE_DOCS * scale
    rng = np.random.default_rng(SEED)
    vocab = _vocab(n)
    langs = rng.choice(["en", "zh", "es", "fr", "de"], size=n,
                       p=[0.41, 0.15, 0.15, 0.15, 0.14])
    sources = np.array([f"src{i}" for i in rng.integers(0, 20, size=n)])
    n_words = rng.integers(8, 106, size=n)          # ~44..577 chars
    # bounded template families: 1 per 500 docs, ~15-word shared prefix,
    # each family stamped on ~10% of docs => ~50 members/family (bounded
    # posting DF however large N gets)
    n_fam = max(1, n // 500)
    fam_prefix = [rng.choice(vocab, size=15) for _ in range(n_fam)]
    fam_of = rng.integers(0, n_fam, size=n)
    has_fam = rng.random(n) < 0.10

    texts: list[str] = [""] * n
    for i in range(n):
        words = rng.choice(vocab, size=n_words[i])
        if has_fam[i]:
            words = np.concatenate([fam_prefix[fam_of[i]], words])
        texts[i] = " ".join(words)

    # near-dup structure, all group sizes bounded so true pairs ∝ N:
    #  - ids ≡ 1 (mod 100): exact copy of id-1
    #  - ids ≡ 51 (mod 100) with a long base: 1-word-substituted copy of
    #    id-1 (token-set J ≈ (k-1)/(k+1) ≥ 0.9 for k ≥ 40 distinct;
    #    levenshtein = one word ≤ 10)
    #  - ids ≡ 77 (mod 100): contiguous excerpt of id-1 (containment 1.0)
    for i in range(1, n, 100):
        texts[i] = texts[i - 1]
    for i in range(51, n, 100):
        w = texts[i - 1].split(" ")
        if len(w) >= 40:
            w[len(w) // 2] = str(vocab[0])
            texts[i] = " ".join(w)
    for i in range(77, n, 100):
        w = texts[i - 1].split(" ")
        if len(w) >= 12:
            texts[i] = " ".join(w[2:2 + max(8, int(len(w) * 0.6))])

    tbl = pa.table({
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "text": pa.array(texts, type=pa.string()),
        "lang": pa.array(langs, type=pa.string()),
        "source": pa.array(sources, type=pa.string()),
        "n_chars": pa.array(np.array([len(t) for t in texts],
                                     dtype=np.int64)),
    })
    pq.write_table(tbl, os.path.join(out_dir, "documents.parquet"))


def gen_lineitem(out_dir: str, scale: int) -> None:
    n_orders = BASE_ORDERS * scale
    rng = np.random.default_rng(SEED + 1)
    lines_per = rng.integers(1, 8, size=n_orders)   # avg 4, like sf0.1
    n = int(lines_per.sum())
    orderkey = np.repeat(np.arange(n_orders, dtype=np.int64), lines_per)
    linenum = np.concatenate([np.arange(1, k + 1) for k in lines_per]) \
                .astype(np.int32)
    # key universes scale WITH the data so graph degrees stay constant
    partkey = rng.integers(0, 20_000 * scale, size=n).astype(np.int64)
    suppkey = rng.integers(0, 1_000 * scale, size=n).astype(np.int64)
    qty = rng.integers(1, 51, size=n).astype(np.float64)
    price = np.round(rng.uniform(900.0, 105_000.0, size=n), 2)
    disc = np.round(rng.integers(0, 11, size=n) / 100.0, 2)
    tax = np.round(rng.integers(0, 9, size=n) / 100.0, 2)
    rflag = np.array(["R", "A", "N"])[rng.integers(0, 3, size=n)]
    lstat = np.array(["O", "F"])[rng.integers(0, 2, size=n)]
    base = np.datetime64("1995-01-02", "us")
    ship = base + rng.integers(0, 2500, size=n) * np.timedelta64(1, "D")
    tbl = pa.table({
        "l_orderkey": pa.array(orderkey),
        "l_partkey": pa.array(partkey),
        "l_suppkey": pa.array(suppkey),
        "l_linenumber": pa.array(linenum),
        "l_quantity": pa.array(qty),
        "l_extendedprice": pa.array(price),
        "l_discount": pa.array(disc),
        "l_tax": pa.array(tax),
        "l_returnflag": pa.array(rflag, type=pa.string()),
        "l_linestatus": pa.array(lstat, type=pa.string()),
        "l_shipdate": pa.array(ship.astype("datetime64[us]")),
    })
    pq.write_table(tbl, os.path.join(out_dir, "lineitem.parquet"))


def gen_embeddings(out_dir: str, scale: int) -> None:
    n = BASE_VECS * scale
    rng = np.random.default_rng(SEED + 2)
    v = rng.standard_normal((n, 64)).astype(np.float32)
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(n, dtype=np.int64)),
        "embedding": pa.array(list(v), type=pa.list_(pa.float32())),
        "label": pa.array((np.arange(n) % 10).astype(np.int32)),
    })
    pq.write_table(tbl, os.path.join(out_dir, "embeddings.parquet"))


def gen_part(out_dir: str, scale: int) -> None:
    # Same key universe as gen_lineitem's partkey draw (20k*scale) so
    # the triangle entry's brand join keeps constant selectivity.
    n = 20_000 * scale
    rng = np.random.default_rng(SEED + 3)
    keys = np.arange(n, dtype=np.int64)
    tbl = pa.table({
        "p_partkey": pa.array(keys),
        "p_name": pa.array([f"part {i}" for i in keys], type=pa.string()),
        "p_brand": pa.array([f"Brand#{1 + int(b)}"
                             for b in rng.integers(0, 25, size=n)],
                            type=pa.string()),
        "p_type": pa.array(np.array(["ECONOMY", "STANDARD", "PROMO"])
                           [rng.integers(0, 3, size=n)], type=pa.string()),
        "p_size": pa.array(rng.integers(1, 51, size=n).astype(np.int32)),
        "p_retailprice": pa.array(np.round(
            rng.uniform(900.0, 2100.0, size=n), 2)),
    })
    pq.write_table(tbl, os.path.join(out_dir, "part.parquet"))


def gen(scales: list[int]) -> None:
    for s in scales:
        d = os.path.join(LADDER, f"x{s}")
        os.makedirs(d, exist_ok=True)
        t0 = time.time()
        gen_documents(d, s)
        gen_lineitem(d, s)
        gen_part(d, s)
        gen_embeddings(d, s)
        print(f"x{s}: generated in {time.time() - t0:.1f}s -> {d}",
              flush=True)


# ---------------------------------------------------------------- run

def run(scales: list[int], samples: int = 2,
        queries: list[str] | None = None) -> None:
    from pyspark.sql import SparkSession
    spark = (SparkSession.builder.master(
                 f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.driver.memory", "48g")
             .config("spark.sql.adaptive.enabled", "true")
             .appName("scale-ladder").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    from iceberg_datafusion_arrow_flight_spark.plans import REGISTRY

    out: dict = {"seed": SEED, "samples": samples,
                 "load1_start": os.getloadavg()[0], "queries": {}}
    for name in (queries or HEAVIES):
        out["queries"][name] = {}
        for s in scales:
            d = os.path.join(LADDER, f"x{s}")
            best, rows = None, None
            for _ in range(samples):
                spark.catalog.clearCache()
                gc.collect()
                t0 = time.time()
                res = REGISTRY[name].build(spark, d).collect()
                dt = time.time() - t0
                best = dt if best is None else min(best, dt)
                rows = len(res)
            out["queries"][name][f"x{s}"] = {
                "sec": round(best, 2), "rows": rows}
            print(f"{name} x{s}: {best:.2f}s rows={rows}", flush=True)
        q = out["queries"][name]
        if "x1" in q and "x10" in q and q["x1"]["sec"] > 0:
            ratio = q["x10"]["sec"] / q["x1"]["sec"]
            q["t_ratio"] = round(ratio, 2)
            q["exponent"] = round(float(np.log10(max(ratio, 1e-9))), 2)
            q["rows_ratio"] = round(q["x10"]["rows"]
                                    / max(q["x1"]["rows"], 1), 2)
    out["load1_end"] = os.getloadavg()[0]
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["gen", "run"])
    ap.add_argument("--scales", default="x1,x10")
    ap.add_argument("--samples", type=int, default=2)
    ap.add_argument("--queries", default=None,
                    help="comma-separated registry names (default HEAVIES)")
    a = ap.parse_args()
    scales = [int(x.lstrip("x")) for x in a.scales.split(",")]
    if a.cmd == "gen":
        gen(scales)
    else:
        run(scales, a.samples,
            a.queries.split(",") if a.queries else None)
