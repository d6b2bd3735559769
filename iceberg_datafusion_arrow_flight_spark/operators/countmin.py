"""Count-min sketch: mergeable frequency estimation in pure expressions.

The sketch every streaming/telemetry pipeline reaches for when exact
per-key counts stop fitting: ``depth`` hash rows × ``width`` buckets of
counters; estimate = min over rows of the probed counter.  Guarantees:
never an underestimate, overestimate ≤ n/width with probability
1 - (1/2)^depth (classic Cormode-Muthukrishnan bounds).

Engine fit (SURVEY §7.1 step 7 — sketches as first-class operators):

- **Building** is one explode (×depth) + one (row, bucket) partial-agg
  shuffle — the sketch IS a d×w count table, so shuffle volume is d·w
  regardless of input size.
- **Merging** is free by construction: sketches add cell-wise, and a
  cell-wise add is exactly what re-aggregating the union does — the
  property that lets every executor sketch its shard independently at
  100 TB (tested: sketch(A) ⊎ sketch(B) == sketch(A ∪ B)).
- **Hashes are md5-derived** (first 8 hex digits per seeded row) rather
  than xxhash64: both engines compute md5 identically, so the whole
  sketch — not just its error bounds — is DuckDB-oracle-checkable
  bit-for-bit, same trick as the LSH hyperplanes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cm_bucket(value: Column, row: Column, width: int) -> Column:
    """Bucket of ``value`` in hash row ``row``: first 32 bits of
    md5('cm<row>|<value>') mod width — portable integer arithmetic."""
    h = F.md5(F.concat(F.lit("cm"), row.cast("string"), F.lit("|"), value))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("bigint")
            % F.lit(width))


def countmin_sketch(df: DataFrame, value_col: str,
                    depth: int = 4, width: int = 256) -> DataFrame:
    """Build the d×w sketch: (row d, bucket, c) — d·w rows total."""
    rows = df.select(
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"),
        F.col(value_col).alias("__v"))
    return (rows
            .select("d", cm_bucket(F.col("__v"), F.col("d"), width)
                    .alias("bucket"))
            .groupBy("d", "bucket")
            .agg(F.count(F.lit(1)).alias("c")))


def countmin_estimate(sketch: DataFrame, probes: DataFrame,
                      value_col: str, depth: int = 4,
                      width: int = 256) -> DataFrame:
    """Estimate each probe value's frequency: min over hash rows of its
    counter (absent bucket ⇒ 0).  The sketch (d·w rows) broadcasts; the
    probe stream is never shuffled."""
    p = probes.select(F.col(value_col).alias("__v")).distinct()
    per_row = p.select(
        "__v",
        F.explode(F.array(*[F.lit(d) for d in range(depth)])).alias("d"))
    per_row = per_row.withColumn(
        "bucket", cm_bucket(F.col("__v"), F.col("d"), width))
    joined = (per_row.join(F.broadcast(sketch), ["d", "bucket"], "left")
              .withColumn("c", F.coalesce(F.col("c"), F.lit(0))))
    return (joined.groupBy("__v")
            .agg(F.min("c").cast("bigint").alias("cm_estimate"))
            .withColumnRenamed("__v", value_col))


# --- Bloom filter (sparse-bitset form) ----------------------------------

def bloom_build(df: DataFrame, value_col: str,
                k: int = 4, m: int = 4096) -> DataFrame:
    """Bloom filter as a SPARSE bitset relation: one row per SET bit
    (bit index in [0, m)).  k hash rows reuse the count-min bucket
    family (md5-derived, engine-portable), so membership is exactly
    reproducible anywhere.

    Relational sketches merge for free: union + distinct IS bitwise OR.
    Scale: build is a projection + explode(k) + distinct (shuffle keyed
    by bit index, output <= m rows however big the input); the probe
    side broadcasts the <= m-row filter.  Classic FPR math applies:
    (1 - e^{-kn/m})^k."""
    rows = df.select(
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("kk"),
        F.col(value_col).cast("string").alias("__v"))
    return (rows.select(cm_bucket(F.col("__v"), F.col("kk"), m).alias("bit"),
                        F.col("kk"))
            .distinct())


def bloom_merge(*filters: DataFrame) -> DataFrame:
    """Bitwise OR of sparse bitsets = union + distinct."""
    out = filters[0]
    for f in filters[1:]:
        out = out.unionByName(f)
    return out.distinct()


def bloom_probe(bloom: DataFrame, probes: DataFrame, value_col: str,
                k: int = 4, m: int = 4096) -> DataFrame:
    """Membership probe: a value is maybe-present iff ALL k of its bits
    are set (no false negatives; false positives at the classic rate).
    The filter relation broadcasts; the probe stream is never shuffled
    beyond its own distinct."""
    p = probes.select(F.col(value_col)).distinct()
    per_bit = p.select(
        value_col,
        F.explode(F.array(*[F.lit(i) for i in range(k)])).alias("kk"))
    per_bit = per_bit.withColumn(
        "bit", cm_bucket(F.col(value_col).cast("string"), F.col("kk"), m))
    hits = (per_bit.join(F.broadcast(bloom), ["kk", "bit"], "left_semi")
            .groupBy(value_col)
            .agg(F.count(F.lit(1)).alias("__hits")))
    return (p.join(hits, [value_col], "left")
            .select(value_col,
                    (F.coalesce(F.col("__hits"), F.lit(0)) == k)
                    .alias("maybe_present")))


def kmv_hash(value: Column, seed: str = "kmv") -> Column:
    """60-bit md5-derived KMV priority — portable (both engines spell
    the identical integer), uniform over [0, 2^60)."""
    h = F.md5(F.concat(F.lit(f"{seed}|"), value.cast("string")))
    return F.conv(F.substring(h, 1, 15), 16, 10).cast("bigint")


def kmv_distinct(df: DataFrame, value_col: str, group_cols: list[str],
                 k: int = 64, seed: str = "kmv") -> DataFrame:
    """K-Minimum-Values distinct-count sketch (Bar-Yossef 2002): keep
    the k smallest distinct hash values per group; estimate
    N ≈ (k−1) · 2^60 / h_k where h_k is the k-th smallest.  When fewer
    than k distinct hashes exist the count is EXACT (the sketch holds
    every value).  Like the count-min/Bloom siblings the whole sketch
    is deterministic md5 integer arithmetic, so a SQL oracle replicates
    the estimate bit-for-bit — no other engine's HLL can promise that.

    Mergeable by construction: the k smallest of a union are a subset
    of the union of each side's k smallest (tested).  Shuffle: one
    distinct + one keyed top-k window; state per group is k longs."""
    from pyspark.sql.window import Window

    hashes = (df.select(*group_cols,
                        kmv_hash(F.col(value_col), seed).alias("h"))
              .distinct())
    w = Window.partitionBy(*group_cols).orderBy("h")
    topk = (hashes.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k))
    kk = (topk.groupBy(*group_cols)
          .agg(F.max("h").alias("hk"),
               F.count(F.lit(1)).cast("bigint").alias("n_le_k")))
    est = F.when(
        F.col("n_le_k") < k, F.col("n_le_k")
    ).otherwise(
        F.round(F.lit(float(k - 1))
                * (F.lit(1152921504606846976.0) / F.col("hk"))))
    return kk.select(*group_cols,
                     est.cast("bigint").alias("kmv_estimate"))


def kmv_intersect_pairs(df: DataFrame, value_col: str, set_col: str,
                        pairs: list[tuple[str, str]], k: int = 64,
                        seed: str = "kmv") -> DataFrame:
    """Theta-sketch-style KMV INTERSECTION estimate for named set pairs.

    Build each set's k-smallest-hash sketch (kmv_distinct's state),
    then for a pair (a, b): theta = min of the sides' thresholds — a
    side with fewer than k distinct hashes is complete, its threshold
    is the full hash range 2^60 — and the estimate is
    ``round(|{h in sk_a ∩ sk_b : h < theta}| * 2^60 / theta)``.  With
    both sides exact the formula degenerates to the plain common count
    (theta = 2^60), so one spelling covers both regimes.

    Scale: the sketches are k longs per set; the pair join touches
    only sketch rows (|pairs| * k), never the corpus — sketch set
    algebra is the whole point at 100 TB.  Deterministic md5 integer
    arithmetic, so a SQL oracle reproduces the estimate bit-for-bit."""
    from pyspark.sql.window import Window

    spark = df.sparkSession
    full = F.lit(1152921504606846976)  # 2^60
    hashes = (df.select(set_col,
                        kmv_hash(F.col(value_col), seed).alias("h"))
              .distinct())
    w = Window.partitionBy(set_col).orderBy("h")
    sk = (hashes.withColumn("__rn", F.row_number().over(w))
          .where(F.col("__rn") <= k).drop("__rn"))
    theta = (sk.groupBy(set_col)
             .agg(F.max("h").alias("hk"),
                  F.count(F.lit(1)).cast("bigint").alias("n_le_k"))
             .select(set_col,
                     F.when(F.col("n_le_k") < k, full)
                      .otherwise(F.col("hk")).alias("th")))
    pdf = spark.createDataFrame(pairs, "type_a string, type_b string")
    both = (pdf
            .join(theta.select(F.col(set_col).alias("type_a"),
                               F.col("th").alias("th_a")), "type_a")
            .join(theta.select(F.col(set_col).alias("type_b"),
                               F.col("th").alias("th_b")), "type_b")
            .select("type_a", "type_b",
                    F.least("th_a", "th_b").alias("th")))
    # Sketch relations are k longs per set BY CONSTRUCTION — broadcast
    # them so the pair algebra never shuffles, however big the corpus
    # that built them was.
    common = (both
              .join(F.broadcast(
                        sk.select(F.col(set_col).alias("type_a"), "h")),
                    "type_a")
              .join(F.broadcast(
                        sk.select(F.col(set_col).alias("type_b"), "h")),
                    ["type_b", "h"])
              .where(F.col("h") < F.col("th"))
              .groupBy("type_a", "type_b", "th")
              .agg(F.count(F.lit(1)).cast("bigint").alias("n_common")))
    est = (both.join(common, ["type_a", "type_b", "th"], "left")
           .select("type_a", "type_b",
                   F.round(F.coalesce(F.col("n_common"), F.lit(0))
                           * (F.lit(1152921504606846976.0)
                              / F.col("th")))
                    .cast("bigint").alias("kmv_inter_estimate")))
    return est


def ams_f2_report(df: DataFrame, key_col: str = "user_id",
                  k: int = 64, groups: int = 8) -> DataFrame:
    """AMS second-frequency-moment sketch (Alon, Matias & Szegedy
    STOC'96 — the Gödel-prize result that started streaming sketches)
    with its exact twin in ONE plan: F2 = Σ_x f_x² is the self-join
    size, THE statistic a query planner wants before picking a join
    strategy on a skewed key (F2/N² is also a Simpson-style
    concentration gauge).  Estimator j is Z_j = Σ_x s_j(x)·f_x with
    md5-derived ±1 signs; E[Z_j²] = F2.  The report compares the
    plain mean of k=64 estimators against the textbook median-of-8-
    means (robust to the heavy right tail of Z²) and the exact twin.

    Everything is INTEGER until the final ratios: Z_j are exact signed
    integer sums, Z_j² and the group sums exact bigints, the median of
    an even count is carried as the 2× numerator (middle-pair sum) —
    both engines hash-agree bit-for-bit.  Scale: ONE partial-agg pass
    over the (key, f) table computes all 64 signed sums + the exact
    twin map-side; the sketch state is k integers — mergeable across
    partitions/streams by addition, which is the whole point.
    """
    per = k // groups
    freq = (df.groupBy(key_col)
            .agg(F.count(F.lit(1)).cast("bigint").alias("f")))
    key_s = F.col(key_col).cast("string")

    def sign(j: int) -> Column:
        d = F.conv(F.substring(
            F.md5(F.concat(F.lit(f"ams{j}|"), key_s).cast("binary")),
            1, 1), 16, 10).cast("int")
        return F.when(d % 2 == 0, F.lit(1)).otherwise(F.lit(-1))

    aggs = [F.sum(sign(j) * F.col("f")).cast("bigint").alias(f"z{j}")
            for j in range(k)]
    aggs += [F.sum(F.col("f") * F.col("f")).cast("bigint")
             .alias("exact_f2"),
             F.count(F.lit(1)).cast("bigint").alias("n_keys"),
             F.sum("f").cast("bigint").alias("n_rows")]
    row = freq.agg(*aggs)
    gsums = [sum((F.col(f"z{g * per + i}") * F.col(f"z{g * per + i}")
                  for i in range(per)),
                 F.lit(0).cast("bigint")).alias(f"g{g}")
             for g in range(groups)]
    row = row.select("exact_f2", "n_keys", "n_rows", *gsums)
    garr = F.array_sort(F.array(*[F.col(f"g{g}") for g in range(groups)]))
    med2 = (F.element_at(garr, groups // 2)
            + F.element_at(garr, groups // 2 + 1)).alias("med2_gsum")
    total = sum((F.col(f"g{g}") for g in range(groups)),
                F.lit(0).cast("bigint")).alias("z2_total")
    out = row.select("exact_f2", "n_keys", "n_rows", total, med2)
    est_mean = F.col("z2_total").cast("double") / F.lit(float(k))
    est_mom = F.col("med2_gsum").cast("double") / F.lit(2.0 * per)
    return out.select(
        "exact_f2", "n_keys", "n_rows", "z2_total", "med2_gsum",
        F.round(est_mean).cast("bigint").alias("est_mean"),
        F.round(est_mom).cast("bigint").alias("est_median_of_means"),
        F.round(F.abs(est_mean - F.col("exact_f2").cast("double"))
                / F.col("exact_f2").cast("double"), 6).alias("rel_err_mean"),
        F.round(F.abs(est_mom - F.col("exact_f2").cast("double"))
                / F.col("exact_f2").cast("double"), 6).alias("rel_err_mom"))
