"""Unit tests for the round-6 operators: degree-ordered triangle
counting, URL canonicalization/filtering, tokenizer-aware packing audit,
and LSH cross-corpus decontamination.  Each checks the ALGORITHM against
an independent Python model on small inputs — the registry entries'
DuckDB oracles cover the fixture-scale behavior."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from iceberg_datafusion_arrow_flight_spark.operators import graph as G
from iceberg_datafusion_arrow_flight_spark.operators import pipeline as P
from iceberg_datafusion_arrow_flight_spark.operators import (
    similarity as S,
)


# --------------------------------------------------------- triangles

def _brute_triangles(edges: set[tuple[int, int]]) -> set[tuple[int, int, int]]:
    nodes = sorted({n for e in edges for n in e})
    und = {frozenset(e) for e in edges}
    return {tuple(sorted(t)) for t in itertools.combinations(nodes, 3)
            if {frozenset((t[0], t[1])), frozenset((t[0], t[2])),
                frozenset((t[1], t[2]))} <= und}


def test_triangles_k4_and_random_graph(spark):
    # K4: every 3-subset is a triangle -> C(4,3) = 4
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    df = spark.createDataFrame(k4, "x BIGINT, y BIGINT")
    und = G.undirected_distinct(df, "x", "y")
    tri = G.triangles(G.degree_orient(und)).collect()
    assert len(tri) == 4
    assert {tuple(sorted((r.a, r.b, r.c))) for r in tri} == \
        _brute_triangles(set(k4))

    # deterministic pseudo-random graph, duplicate + reversed edges mixed
    # in to exercise canonicalization
    edges = {((i * 7 + 3) % 23, (i * 11 + 5) % 23) for i in range(60)}
    edges = {e for e in edges if e[0] != e[1]}
    rows = [e for e in edges] + [(b, a) for a, b in list(edges)[:10]]
    df = spark.createDataFrame(rows, "x BIGINT, y BIGINT")
    tri = G.triangles(G.degree_orient(
        G.undirected_distinct(df, "x", "y"))).collect()
    got = {tuple(sorted((r.a, r.b, r.c))) for r in tri}
    assert len(tri) == len(got), "each triangle must appear exactly once"
    assert got == _brute_triangles(edges)


def test_degree_orient_out_edges_and_direction(spark):
    # star graph: hub 0 with 5 leaves — every edge must point leaf->hub
    # (leaves have degree 1 < hub's 5), so the hub's out-degree is 0.
    df = spark.createDataFrame([(0, i) for i in range(1, 6)],
                               "x BIGINT, y BIGINT")
    ori = G.degree_orient(G.undirected_distinct(df, "x", "y")).collect()
    assert all(r.d == 0 for r in ori)
    assert sorted(r.s for r in ori) == [1, 2, 3, 4, 5]


# ----------------------------------------------------- URL handling

def test_canonicalize_url_collapses_crawl_variants(spark):
    variants = [
        "https://www.Site.com/a/b?utm=1",
        "http://SITE.com/a/b",
        "https://site.com/a/b/#frag",
        "ftp://www.site.com/a/b/",
    ]
    df = spark.createDataFrame([(u,) for u in variants], "url STRING")
    keys = [r.k for r in
            df.select(P.canonicalize_url(F.col("url")).alias("k")).collect()]
    assert len(set(keys)) == 1 and keys[0] == "site.com/a/b"
    # different pages stay distinct
    df2 = spark.createDataFrame(
        [("https://site.com/a/b",), ("https://site.com/a/c",),
         ("https://other.com/a/b",)], "url STRING")
    keys2 = {r.k for r in
             df2.select(P.canonicalize_url(F.col("url")).alias("k")).collect()}
    assert keys2 == {"site.com/a/b", "site.com/a/c", "other.com/a/b"}


def test_url_domain_filter_flags(spark):
    df = spark.createDataFrame(
        [("https://www.bad.com/x",), ("https://good.com/x",),
         ("https://good.com/forbidden/page",)], "url STRING")
    out = {r.url: (r.blocked_domain, r.blocked_path, r.kept)
           for r in P.url_domain_filter(
               df, ["bad.com"], ["forbidden"]).collect()}
    assert out["https://www.bad.com/x"] == (True, False, False)
    assert out["https://good.com/x"] == (False, False, True)
    assert out["https://good.com/forbidden/page"] == (False, True, False)


# --------------------------------------------- packing boundary audit

def test_pack_boundary_accounting_hand_example(spark):
    # one shard, budget 10; subword counts are driven by the text, so
    # build texts with known subword counts: each "ab " word is one
    # <=4-char fragment -> n words = n subwords.
    def words(n):
        return " ".join(["ab"] * n)

    rows = [("s", 1, words(4)), ("s", 2, words(8)),  # doc2 spans 4..12
            ("s", 3, words(3))]                      # doc3 spans 12..15
    df = spark.createDataFrame(rows, "lang STRING, doc_id BIGINT, text STRING")
    out = {r.doc_id: r for r in
           P.pack_boundary_accounting(df, token_budget=10).collect()}
    assert (out[1].start_bin, out[1].end_bin, out[1].crosses,
            out[1].boundary_loss) == (0, 0, False, 0)
    # doc2 occupies [4, 12): crosses the 10-boundary, 2 tokens past it
    assert (out[2].start_bin, out[2].end_bin, out[2].crosses,
            out[2].boundary_loss) == (0, 1, True, 2)
    assert (out[3].start_bin, out[3].end_bin, out[3].crosses,
            out[3].boundary_loss) == (1, 1, False, 0)


# ------------------------------------- cross-corpus decontamination

def test_cross_corpus_decontaminate_matches_bucketed_brute_force(spark):
    import math

    def vec(seed):
        return [((seed * 31 + i * 7) % 13 - 6) / 6.0 for i in range(8)]

    corpus = [(i, vec(i)) for i in range(0, 40, 2)]
    other = [(i, vec(i + 1)) for i in range(1, 40, 2)]
    cdf = spark.createDataFrame(corpus, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    odf = spark.createDataFrame(other, "vec_id BIGINT, embedding ARRAY<DOUBLE>")
    got = {(r.corpus_id, r.match_id): r.sim
           for r in S.cross_corpus_decontaminate(
               cdf, odf, threshold=0.5, n_planes=2, dims=8,
               n_tables=4).collect()}

    # Python model: same buckets (lsh_bucket is deterministic), brute
    # cosine over bucket-sharing pairs, argmax per corpus id.
    def bucket(v, table):
        b = 0
        for p in range(2):
            import hashlib
            dot = 0.0
            for i in range(8):
                h = int(hashlib.md5(f"plane{table * 101 + p}|d{i}"
                                    .encode()).hexdigest()[:6], 16)
                dot += v[i] * (h / float(1 << 23) - 1.0)
            if dot >= 0:
                b += 1 << p
        return b

    def cos(a, b):
        num = sum(x * y for x, y in zip(a, b))
        den = math.sqrt(sum(x * x for x in a)) * math.sqrt(
            sum(y * y for y in b))
        return round(num / den, 6)

    best = {}
    for cid, cv in corpus:
        cands = [(oid, ov) for oid, ov in other
                 if any(bucket(cv, t) == bucket(ov, t) for t in range(4))]
        sims = [(oid, cos(cv, ov)) for oid, ov in cands]
        sims = [(oid, s) for oid, s in sims if s >= 0.5]
        if sims:
            oid, s = max(sims, key=lambda t: (t[1], -t[0]))
            best[(cid, oid)] = s
    assert got == best


def test_ivfpq_recall_and_determinism(spark, sf_dir):
    from pyspark.sql import functions as F2
    from iceberg_datafusion_arrow_flight_spark.operators import similarity
    from iceberg_datafusion_arrow_flight_spark.sources.registry import (
        load_table)
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F2.col("vec_id") % 100 == 0)
    exact = similarity.topk_cosine(queries, emb, k=10)
    approx = similarity.ann_ivfpq_topk(queries, emb, k=10, nprobe=8,
                                       n_candidates=128)
    e = {(r.query_id, r.corpus_id) for r in exact.collect()}
    a = {(r.query_id, r.corpus_id) for r in approx.collect()}
    recall = len(e & a) / len(e)
    assert recall >= 0.4, f"IVF-PQ recall too low: {recall:.2f}"
    again = {(r.query_id, r.corpus_id)
             for r in similarity.ann_ivfpq_topk(
                 queries, emb, k=10, nprobe=8, n_candidates=128).collect()}
    assert a == again, "IVF-PQ must be deterministic run-to-run"


def test_bpe_merge_table_matches_python_reference(spark):
    """The distributed BPE trainer must reproduce a straightforward
    single-machine Sennrich implementation merge-for-merge."""
    import collections
    import re as _re

    from iceberg_datafusion_arrow_flight_spark.operators.text import (
        bpe_merge_table)

    texts = ["the cat sat on the mat",
             "the cats sat", "a cat and a mat", "bats bats bats",
             "the the the them theme"]
    df = spark.createDataFrame([(t,) for t in texts], "text STRING")
    got = [(r.round, r.pair, r.merged, r.freq)
           for r in bpe_merge_table(df, n_merges=8).collect()]

    # pure-Python reference (word-level BPE, greedy left-to-right merge)
    vocab = collections.Counter()
    for t in texts:
        for w in _re.split(r"[^a-z]+", t.lower()):
            if 0 < len(w) <= 40:
                vocab[w] += 1
    state = {" ".join(list(w)) + " </w>": c for w, c in vocab.items()}
    want = []
    for rnd in range(1, 9):
        pairs = collections.Counter()
        for s, c in state.items():
            syms = s.split(" ")
            for a, b in zip(syms, syms[1:]):
                pairs[f"{a} {b}"] += c
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merged = best[0].replace(" ", "")
        want.append((rnd, best[0], merged, best[1]))
        new_state = collections.Counter()
        for s, c in state.items():
            ns = (" " + s + " ").replace(f" {best[0]} ", f" {merged} ")
            new_state[ns.strip()] += c
        state = dict(new_state)
    assert got == want
