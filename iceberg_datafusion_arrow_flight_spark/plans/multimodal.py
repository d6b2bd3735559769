"""Multimodal plumbing plans (implementations in
:mod:`..operators.multimodal`).  The Pandas-UDF outputs are fully
deterministic (stub decode = length + md5 + metadata), so DuckDB can
oracle-check the whole mapInPandas pipeline in SQL.

North-star extension (SURVEY §7.1 step 7) — no counterpart in the
reference; operators live in operators/multimodal.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .base import register, table
from ..operators import multimodal as M
from ..operators.materialize import materialize


@register(
    "multimodal_decode",
    oracle="""
SELECT doc_id,
       CASE WHEN doc_id % 3 = 0 THEN 'png'
            WHEN doc_id % 3 = 1 THEN 'jpeg' ELSE 'webp' END AS fmt,
       CAST(32 + (doc_id % 8) * 16 AS INT) AS width,
       CAST(32 + (doc_id % 5) * 16 AS INT) AS height,
       CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
       md5(text) AS checksum
FROM documents
""",
    doc="Binary payload + metadata struct → mapInPandas decode (stubbed "
        "deterministically; real decode gated behind import-try → "
        "NotImplementedError). operators/multimodal.py:decode_payloads.",
    tags=("multimodal",),
)
def multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return M.decode_payloads(M.attach_payload(docs))


@register(
    "multimodal_frame_sample",
    oracle="""
SELECT doc_id,
       CAST(UNNEST(CASE WHEN doc_id % 4 IN (0, 1) THEN [0]
                        ELSE [0, 2] END) AS INT) AS frame_idx
FROM documents
""",
    doc="Frame sampling (every 2nd of n_frames=1+id%4) — the 1→N "
        "mapInPandas expansion; oracle checks the sampled index set "
        "(checksums verified separately in pytest). "
        "operators/multimodal.py:sample_frames.",
    tags=("multimodal",),
)
def multimodal_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return (M.sample_frames(M.attach_payload(docs))
            .select("doc_id", "frame_idx"))


@register(
    "multimodal_resize",
    oracle=None,  # mapInPandas plumbing; shape/determinism pinned in tests
    doc="Resize stage: payload + metadata -> target geometry + scale "
        "factors via mapInPandas (stub checksum in place of pixel "
        "resample; the Spark plumbing is real). "
        "operators/multimodal.py:resize_payloads.",
    tags=("multimodal",),
)
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = table(spark, sf_dir, "documents")
    return M.resize_payloads(M.attach_payload(docs))


@register(
    "multimodal_feature_extract",
    oracle="""
SELECT doc_id,
       """ + ",\n       ".join(
        f"CAST(SUM(CASE WHEN b = {k} THEN 1 ELSE 0 END) AS BIGINT) AS h{k:02d}"
        for k in range(16)) + """
FROM (
  SELECT doc_id, unnest(list_transform(range(1, length(text) + 1),
                                       i -> ord(text[i]) % 16)) AS b
  FROM documents)
GROUP BY doc_id ORDER BY doc_id
""",
    doc="Feature extraction: payload -> ARRAY<DOUBLE> embedding via "
        "mapInPandas (stub byte-histogram featurizer; swap for an "
        "ONNX/torch body on a GPU cluster — the plan is unchanged).  "
        "Oracled EXACTLY: the L1-normalized feature is un-normalized "
        "back to integer byte-bucket counts (round(f[k]*n_bytes)), "
        "which DuckDB recomputes from the text bytes — integer sums, "
        "not float means, so the cross-engine hash is stable; payload "
        "is ASCII so chars == bytes. "
        "operators/multimodal.py:extract_features.",
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = table(spark, sf_dir, "documents")
    feats = M.extract_features(M.attach_payload(docs))
    return (
        feats.join(docs.select("doc_id", "n_chars"), "doc_id")
        .select("doc_id",
                *[F.round(F.element_at("feature", k + 1) * F.col("n_chars"))
                  .cast("bigint").alias(f"h{k:02d}") for k in range(16)])
        .orderBy("doc_id"))


@register(
    "multimodal_decode_real",
    oracle="""
WITH d AS (
  SELECT doc_id,
         8 + (doc_id % 8) * 4 AS w,
         8 + (doc_id % 5) * 4 AS h
  FROM documents WHERE doc_id % 10 = 0
),
sums AS (
  SELECT doc_id,
         CAST(SUM((7 * doc_id + k * 3) % 256) AS BIGINT) AS sum_r,
         CAST(SUM((7 * doc_id + k * 3 + 1) % 256) AS BIGINT) AS sum_g,
         CAST(SUM((7 * doc_id + k * 3 + 2) % 256) AS BIGINT) AS sum_b
  FROM d, range(0, 1024) t(k)          -- static range; max w*h is 864
  WHERE k < w * h
  GROUP BY doc_id
)
SELECT d.doc_id,
       CASE WHEN d.doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS fmt,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(CASE WHEN d.doc_id % 2 = 0
            THEN length(concat('P6', chr(10), CAST(w AS VARCHAR), ' ',
                                CAST(h AS VARCHAR), chr(10), '255',
                                chr(10))) + w * h * 3
            ELSE 54 + ((w * 3 + 3) // 4) * 4 * h END AS BIGINT) AS n_bytes,
       sum_r, sum_g, sum_b
FROM d JOIN sums ON d.doc_id = sums.doc_id
""",
    doc="REAL image decode, oracle-checked: executors build actual "
        "PPM/BMP byte payloads (deterministic pixels), the decoder "
        "parses headers + pixel buffers in pure numpy, and DuckDB "
        "recomputes the byte sizes and exact per-channel integer sums "
        "from the generator formula — the hash only matches if the "
        "binary parse is bit-correct. "
        "operators/multimodal.py:decode_image_payloads.",
    tags=("multimodal",),
)
def multimodal_decode_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    real = M.decode_image_payloads(M.attach_image_payload(docs))
    return real.select("doc_id", "fmt", "width", "height", "n_bytes",
                       "sum_r", "sum_g", "sum_b")


@register(
    "multimodal_resize_real",
    oracle="""
WITH d AS (
  SELECT doc_id,
         8 + (doc_id % 8) * 4 AS w,
         8 + (doc_id % 5) * 4 AS h
  FROM documents WHERE doc_id % 10 = 0
),
samples AS (
  SELECT doc_id, w, h,
         ((oy.k * h) // 16) * w + ((ox.k * w) // 16) AS flat_px
  FROM d, range(0, 16) oy(k), range(0, 16) ox(k)
)
SELECT doc_id,
       CASE WHEN doc_id % 2 = 0 THEN 'ppm' ELSE 'bmp' END AS fmt,
       CAST(16 AS INT) AS out_width,
       CAST(16 AS INT) AS out_height,
       CAST(SUM((7 * doc_id + flat_px * 3) % 256) AS BIGINT) AS sum_r,
       CAST(SUM((7 * doc_id + flat_px * 3 + 1) % 256) AS BIGINT) AS sum_g,
       CAST(SUM((7 * doc_id + flat_px * 3 + 2) % 256) AS BIGINT) AS sum_b
FROM samples
GROUP BY doc_id
""",
    doc="REAL nearest-neighbor resize, oracle-checked: decode actual "
        "PPM/BMP pixels, resample to 16x16 via index sampling, emit "
        "exact channel sums; DuckDB recomputes the sums from the "
        "generator formula at the SAME sampled indices — hash matches "
        "only if decode + resample index math agree. "
        "operators/multimodal.py:resize_image_payloads.",
    tags=("multimodal",),
)
def multimodal_resize_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    return M.resize_image_payloads(M.attach_image_payload(docs))


@register(
    "multimodal_audio_features",
    oracle="""
WITH base AS (
  SELECT doc_id, 800 + (doc_id % 5) * 160 AS n FROM documents
  WHERE doc_id % 10 = 0
), s AS (
  SELECT doc_id, n, i,
         ((doc_id * 31 + i * 7) % 4096) - 2048 AS v,
         ((doc_id * 31 + (i + 1) * 7) % 4096) - 2048 AS v_next
  FROM base, range(0, 1440) r(i)
  WHERE i < n
)
SELECT doc_id, CAST(8000 AS INT) AS sample_rate,
       CAST(MAX(n) AS BIGINT) AS n_samples,
       CAST(MAX(ABS(v)) AS BIGINT) AS peak_amp,
       ROUND(SQRT(SUM(v * v) * 1.0 / MAX(n)), 6) AS rms,
       CAST(SUM(CASE WHEN i < n - 1 AND ((v >= 0) != (v_next >= 0))
                THEN 1 ELSE 0 END) AS BIGINT) AS n_zero_cross
FROM s GROUP BY doc_id
""",
    doc="REAL audio path: synthesize RIFF/WAVE PCM payloads (deterministic "
        "integer waveform), parse the actual container bytes back "
        "(chunk walk, fmt validation) and extract sample-domain features "
        "— peak, RMS, zero crossings.  DuckDB recomputes every feature "
        "from the waveform formula, so the hash matches only if the WAV "
        "encode, the chunk parse, and the feature math all agree. "
        "operators/multimodal.py:audio_features.",
    tags=("multimodal",),
)
def multimodal_audio(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    feats = M.audio_features(M.attach_audio_payload(docs))
    return feats.select("doc_id", "sample_rate", "n_samples", "peak_amp",
                        F.round("rms", 6).alias("rms"), "n_zero_cross")


@register(
    "multimodal_pixel_dedup",
    oracle="""
WITH off AS (
  -- smallest multiple of 1280 past every real id: copies never collide
  -- with fixture ids at ANY scale factor
  SELECT ((MAX(doc_id) // 1280) + 1) * 1280 AS o FROM documents
), ids AS (
  SELECT doc_id FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + (SELECT o FROM off) FROM documents WHERE doc_id % 5 = 0
), d AS (
  SELECT doc_id,
         8 + (doc_id % 8) * 4 AS w,
         8 + (doc_id % 5) * 4 AS h,
         CASE WHEN (doc_id // (SELECT o FROM off)) % 2 = 0
              THEN 'ppm' ELSE 'bmp' END AS fmt
  FROM ids
), sig AS (
  SELECT doc_id, w, h, fmt,
         md5(string_agg(CAST((7 * doc_id + k) % 256 AS VARCHAR),
                        ',' ORDER BY k)) AS pix_sig
  FROM d, range(0, 2592) t(k)          -- static bound: 3 * max(w*h)
  WHERE k < 3 * w * h
  GROUP BY doc_id, w, h, fmt
)
SELECT pix_sig,
       CAST(MIN(doc_id) AS BIGINT) AS rep_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(COUNT(DISTINCT fmt) AS BIGINT) AS n_fmts,
       CAST(MIN(w) AS INT) AS width,
       CAST(MIN(h) AS INT) AS height
FROM sig GROUP BY pix_sig HAVING COUNT(*) > 1
ORDER BY rep_id
""",
    doc="Cross-encoding exact image dedup: md5 over the DECODED "
        "normalized pixel stream groups images whose payload BYTES "
        "differ (PPM vs BMP: headers, BGR, bottom-up rows, padding) but "
        "whose pictures are identical — the multimodal twin of "
        "content-hash text dedup; a payload-checksum groupBy can never "
        "match these.  The corpus is the fixture ids plus re-encoded "
        "copies at id+offset, where offset is the smallest multiple of "
        "1280 (the lcm of the generator's pixel/width/height periods) "
        "past the max real id — each copy repeats its original's "
        "picture exactly, never collides with a real id at any scale "
        "factor, and fmt_period=offset puts it in the OTHER container; "
        "every reported group is genuinely cross-container (n_fmts = 2 "
        "proves it).  The oracle recomputes the generator's pixel "
        "stream and the SAME md5 in SQL — equal only if the PPM and BMP "
        "parses both reproduce the exact bytes. "
        "operators/multimodal.py:pixel_signatures.",
    tags=("multimodal", "dedup"),
)
def multimodal_pixel_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    offset = ((max_id // 1280) + 1) * 1280
    base = docs.where(F.col("doc_id") % 5 == 0).select("doc_id")
    ids = base.unionAll(
        base.select((F.col("doc_id") + offset).alias("doc_id")))
    sigs = M.pixel_signatures(
        M.attach_image_payload(ids, fmt_period=offset))
    return (sigs.groupBy("pix_sig")
            .agg(F.min("doc_id").cast("bigint").alias("rep_id"),
                 F.count(F.lit(1)).cast("bigint").alias("n_copies"),
                 F.countDistinct("fmt").cast("bigint").alias("n_fmts"),
                 F.min("width").cast("int").alias("width"),
                 F.min("height").cast("int").alias("height"))
            .where(F.col("n_copies") > 1)
            .orderBy("rep_id"))


@register(
    "multimodal_scene_cuts",
    oracle="""
WITH d AS (
  SELECT doc_id,
         8 + (doc_id % 8) * 4 AS w,
         8 + (doc_id % 5) * 4 AS h,
         4 + doc_id % 3 AS nf
  FROM documents WHERE doc_id % 10 = 0
),
pairs AS (
  SELECT doc_id, w, h, nf, (nf // 2) AS cut_at, t.k AS f
  FROM d, range(1, 6) t(k)
  WHERE t.k < nf
),
cut_sad AS (
  SELECT p.doc_id, p.f,
         CAST(SUM(ABS(CAST((7 * (p.doc_id + 1000) + t.k) % 256 AS BIGINT)
                      - CAST((7 * p.doc_id + t.k) % 256 AS BIGINT)))
              AS BIGINT) AS sad
  FROM pairs p, range(0, 2592) t(k)
  WHERE p.f = p.cut_at AND t.k < p.w * p.h * 3
  GROUP BY p.doc_id, p.f
)
SELECT p.doc_id,
       CAST(p.f AS INT) AS frame_idx,
       COALESCE(c.sad, 0) AS sad,
       ROUND(COALESCE(c.sad, 0) * 1.0 / (p.w * p.h * 3), 6)
           AS mean_abs_diff,
       COALESCE(c.sad, 0) * 1.0 / (p.w * p.h * 3) > 8.0 AS is_cut
FROM pairs p LEFT JOIN cut_sad c ON c.doc_id = p.doc_id AND c.f = p.f
ORDER BY p.doc_id, frame_idx
""",
    doc="Scene-cut detection over REAL decoded frames — the video-"
        "segmentation primitive (shot boundaries for frame dedup / "
        "caption alignment).  Executors build each doc's frame sequence "
        "as actual PPM payloads with a hard content jump at the "
        "midpoint; applyInPandas groups by a doc-HASH BUCKET (r12: one "
        "Python call iterates ~40 clips, amortizing the per-group call "
        "overhead that dominated at 4-6 frames/clip; a doc's frames "
        "land in one bucket, and the kernel resets its differ at each "
        "doc boundary, so results are bucket-independent), decodes "
        "every pixel buffer, and emits "
        "exact integer SAD vs the previous frame.  The oracle "
        "recomputes each SAD from the generator's modular-arithmetic "
        "formula — only the midpoint pair is nonzero, and its value is "
        "exact, so the hash pins decode + ordering + differencing "
        "end-to-end.  Per-group state is one clip's frames; groups "
        "hash-partition freely at 100 TB. "
        "operators/multimodal.py:attach_video_frames,scene_cut_sad.",
    tags=("multimodal",),
)
def multimodal_scene_cuts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    cuts = M.scene_cut_sad(M.attach_video_frames(docs), threshold=8.0)
    return (cuts.select("doc_id", "frame_idx", "sad",
                        F.round("mean_abs_diff", 6).alias("mean_abs_diff"),
                        "is_cut")
            .orderBy("doc_id", "frame_idx"))


@register(
    "multimodal_image_ahash",
    oracle="""
WITH d AS (
  SELECT doc_id,
         8 + (doc_id % 8) * 4 AS w,
         8 + (doc_id % 5) * 4 AS h
  FROM documents WHERE doc_id % 10 = 0
), px AS (
  SELECT doc_id, w, h, k,
         ((7 * doc_id + k * 3) % 256
          + (7 * doc_id + k * 3 + 1) % 256
          + (7 * doc_id + k * 3 + 2) % 256) // 3 AS gray,
         (((k // w) * 8) // h) * 8 + (((k % w) * 8) // w) AS b
  FROM d, range(0, 1024) t(k)          -- static range; max w*h is 864
  WHERE k < w * h
), blocks AS (
  SELECT doc_id, w, h, b,
         CAST(SUM(gray) AS BIGINT) AS bs,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM px GROUP BY doc_id, w, h, b
), tot AS (
  SELECT doc_id, CAST(SUM(gray) AS BIGINT) AS gt FROM px GROUP BY doc_id
), bits AS (
  SELECT doc_id, w, h, b,
         CASE WHEN bs * (w * h) > gt * cnt
              THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS bit
  FROM blocks JOIN tot USING (doc_id)
)
SELECT doc_id,
       CAST(MAX(w) AS INT) AS width,
       CAST(MAX(h) AS INT) AS height,
       CAST(SUM(CASE WHEN b >= 32 THEN bit << (b - 32) ELSE 0 END)
            AS BIGINT) AS ahash_hi,
       CAST(SUM(CASE WHEN b < 32 THEN bit << b ELSE 0 END)
            AS BIGINT) AS ahash_lo,
       CAST(SUM(bit) AS INT) AS n_set_bits
FROM bits
GROUP BY doc_id
ORDER BY doc_id
""",
    doc="Perceptual average-hash over REAL decoded pixels: integer "
        "grayscale, exact 8x8 block grid for any image size, bit set "
        "when block_sum*n_pixels > gray_total*block_count — all-int64 "
        "math, zero floats, so DuckDB re-derives every hash bit from "
        "the pixel generator formula and the hash only matches if the "
        "binary parse AND the block geometry are bit-correct.  The "
        "64-bit hash ships as two 32-bit halves (bit 63 would overflow "
        "signed BIGINT); near-dup search bands the halves like SimHash. "
        "operators/multimodal.py:ahash_signatures.",
    tags=("multimodal", "dedup"),
)
def multimodal_ahash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    return (M.ahash_signatures(M.attach_image_payload(docs))
            .orderBy("doc_id"))


@register(
    "multimodal_audio_silence",
    oracle="""
WITH base AS (
  SELECT doc_id, 800 + (doc_id % 5) * 160 AS n FROM documents
  WHERE doc_id % 10 = 0
), s AS (
  SELECT doc_id, n, i,
         ((doc_id * 31 + i * 7) % 4096) - 2048 AS v
  FROM base, range(0, 1440) r(i)
  WHERE i < n
), sil AS (
  SELECT doc_id, i,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY i) AS rn
  FROM s WHERE ABS(v) < 256
), runs AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS run_len
  FROM (SELECT doc_id, i - rn AS island, i FROM sil)
  GROUP BY doc_id, island
), agg AS (
  SELECT doc_id,
         CAST(COUNT(*) AS BIGINT) AS n_segments,
         CAST(MAX(run_len) AS BIGINT) AS longest_silence,
         CAST(SUM(run_len) AS BIGINT) AS silent_samples
  FROM runs WHERE run_len >= 16 GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(b.n AS BIGINT) AS n_samples,
       COALESCE(a.n_segments, 0) AS n_segments,
       COALESCE(a.longest_silence, 0) AS longest_silence,
       COALESCE(a.silent_samples, 0) AS silent_samples
FROM base b LEFT JOIN agg a USING (doc_id)
ORDER BY b.doc_id
""",
    doc="Silence segmentation over REAL parsed WAV payloads (VAD-lite: "
        "runs of >= 16 consecutive samples under amplitude 256 — the "
        "dead-air trim / pause-split pass an audio curation pipeline "
        "runs first).  Run-length encoding in numpy per Arrow batch; "
        "the oracle rebuilds the exact segments from the waveform "
        "formula with gaps-and-islands, so the hash matches only if "
        "the WAV chunk parse AND the segmentation agree sample-for-"
        "sample.  All-integer output. "
        "operators/multimodal.py:audio_silence_segments.",
    tags=("multimodal",),
)
def multimodal_audio_silence(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    return (M.audio_silence_segments(M.attach_audio_payload(docs))
            .orderBy("doc_id"))


@register(
    "multimodal_intensity_histogram",
    oracle="""
WITH d AS (
  SELECT doc_id,
         8 + (doc_id % 8) * 4 AS w,
         8 + (doc_id % 5) * 4 AS h
  FROM documents WHERE doc_id % 5 = 0
), px AS (
  SELECT doc_id, CAST(((7 * doc_id + k) % 256) // 32 AS INT) AS bin
  FROM d, range(0, 2592) t(k)          -- static bound: 3 * max(w*h)
  WHERE k < 3 * w * h
)
SELECT bin,
       CAST(SUM(cnt) AS BIGINT) AS n_pixels,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(MIN(cnt) AS BIGINT) AS min_per_doc,
       CAST(MAX(cnt) AS BIGINT) AS max_per_doc
FROM (
  SELECT doc_id, bin, COUNT(*) AS cnt FROM px GROUP BY doc_id, bin
)
GROUP BY bin
ORDER BY bin
""",
    doc="Corpus exposure profile over REAL decoded pixels: per-image "
        "8-bin intensity histograms (every channel value bucketed at "
        "width 32) rolled up per bin with doc counts and per-doc "
        "min/max — the vision-curation pre-filter that flags all-dark, "
        "blown-out, and synthetic-flat images as mass piled into one "
        "bin.  The Spark side DECODES the actual PPM/BMP payloads "
        "(numpy bincount per Arrow batch; only (id, bin, count) rows "
        "leave the executor); the oracle re-derives every count from "
        "the pixel generator formula, so a single mis-parsed header "
        "byte anywhere breaks the hash.  Exact integer counts "
        "end-to-end. operators/multimodal.py:intensity_histogram.",
    tags=("multimodal", "pipeline"),
)
def multimodal_intensity_histogram(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 5 == 0).select("doc_id"))
    per_doc = M.intensity_histogram(M.attach_image_payload(docs))
    return (per_doc.groupBy("bin")
            .agg(F.sum("n_pixels").cast("bigint").alias("n_pixels"),
                 F.count(F.lit(1)).cast("bigint").alias("n_docs"),
                 F.min("n_pixels").cast("bigint").alias("min_per_doc"),
                 F.max("n_pixels").cast("bigint").alias("max_per_doc"))
            .orderBy("bin"))


def _phash_cte() -> str:
    """The (doc_id, phash) relation as reusable SQL — re-derives every
    sampled pixel from the generator formula and runs the SAME
    fixed-point separable DCT as the numpy operator, with the shared
    Python-computed cosine basis embedded as literals (the JL-signs /
    LSH-hyperplanes synchronization trick — neither engine ever
    evaluates a transcendental).  Shared by the per-doc pHash entry and
    the Hamming-pair dedup twin."""
    from ..operators.multimodal import phash_basis
    basis = "[" + ", ".join(str(v) for v in phash_basis()) + "]"
    return f"""
WITH bt AS (SELECT {basis} AS basis),
b AS (
  SELECT u, i, basis[u * 32 + i + 1] AS c
  FROM bt, range(0, 8) tu(u), range(0, 32) ti(i)
),
d AS (
  SELECT doc_id, 8 + (doc_id % 8) * 4 AS w, 8 + (doc_id % 5) * 4 AS h
  FROM documents WHERE doc_id % 5 = 0
),
gray AS (
  SELECT doc_id, i, j,
         (7 * doc_id + 3 * (((j * h) // 32) * w + ((i * w) // 32))) % 256
       + (7 * doc_id + 3 * (((j * h) // 32) * w + ((i * w) // 32)) + 1) % 256
       + (7 * doc_id + 3 * (((j * h) // 32) * w + ((i * w) // 32)) + 2) % 256
           AS gv
  FROM d, range(0, 32) ti(i), range(0, 32) tj(j)
),
rs AS (
  SELECT gray.doc_id, bu.u AS u, gray.j, SUM(gv * bu.c) AS s
  FROM gray JOIN b bu ON bu.i = gray.i
  GROUP BY gray.doc_id, bu.u, gray.j
),
co AS (
  SELECT rs.doc_id, rs.u, bv.u AS v, CAST(SUM(s * bv.c) AS BIGINT) AS coef
  FROM rs JOIN b bv ON bv.i = rs.j
  GROUP BY rs.doc_id, rs.u, bv.u
),
ac AS (
  SELECT doc_id, u * 8 + v - 1 AS k, coef
  FROM co WHERE NOT (u = 0 AND v = 0)
),
med AS (
  SELECT doc_id, coef AS m
  FROM (SELECT doc_id, coef,
               row_number() OVER (PARTITION BY doc_id ORDER BY coef) AS rn
        FROM ac)
  WHERE rn = 32
),
ph AS (
  SELECT ac.doc_id,
         CAST(SUM(CASE WHEN coef > m
                  THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS BIGINT)
             AS phash
  FROM ac JOIN med ON med.doc_id = ac.doc_id
  GROUP BY ac.doc_id
)
"""


@register(
    "multimodal_image_phash",
    oracle=_phash_cte()
    + "SELECT doc_id, phash FROM ph ORDER BY doc_id",
    doc="DCT perceptual hash (pHash family) over REAL decoded pixels in "
        "exact integer arithmetic: decode the PPM/BMP payload, "
        "nearest-neighbor-sample a 32x32 grid (integer x = i*w div 32), "
        "grayscale as the exact channel sum, separable 8x8 low-band "
        "fixed-point DCT-II (cosines precomputed in Python to 2^14 "
        "fixed point and embedded as literals in BOTH engines), "
        "threshold the 63 AC coefficients at their lower median into a "
        "63-bit BIGINT — the standard image-dedup fingerprint, robust "
        "to resizes and container changes where ahash is not (DCT "
        "drops the DC level).  Every accumulator stays below 2^53, so "
        "numpy int64 matmuls and DuckDB HUGEINT sums agree bit-for-"
        "bit.  The oracle re-derives the sampled pixels from the "
        "generator formula, so one mis-parsed header byte anywhere "
        "breaks the hash.  Scale: O(pixels) decode + two 32x8 integer "
        "matmuls per image, no shuffle. "
        "operators/multimodal.py:image_phash.",
    tags=("multimodal", "dedup"),
)
def multimodal_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 5 == 0).select("doc_id"))
    return (M.image_phash(M.attach_image_payload(docs))
            .orderBy("doc_id"))


def _spectrogram_oracle() -> str:
    """Re-derives every sample from the waveform formula and runs the
    identical fixed-point framed DFT with the shared literal basis."""
    from ..operators.multimodal import dft_basis
    cos_t, sin_t = dft_basis()
    cb = "[" + ", ".join(str(v) for v in cos_t) + "]"
    sb = "[" + ", ".join(str(v) for v in sin_t) + "]"
    return f"""
WITH bt AS (SELECT {cb} AS cb, {sb} AS sb),
b AS (
  SELECT bin, t,
         cb[(bin - 1) * 64 + t + 1] AS c,
         sb[(bin - 1) * 64 + t + 1] AS s
  FROM bt, range(1, 9) tb(bin), range(0, 64) tt(t)
),
d AS (
  SELECT doc_id, 800 + (doc_id % 5) * 160 AS n
  FROM documents WHERE doc_id % 5 = 0
),
smp AS (
  SELECT doc_id, i // 64 AS frame, i % 64 AS t,
         ((doc_id * 31 + 7 * i) % 4096) - 2048 AS v
  FROM d, range(0, 1440) r(i)
  WHERE i < (n // 64) * 64
),
comp AS (
  SELECT smp.doc_id, smp.frame, b.bin,
         CAST(SUM(v * c) AS BIGINT) AS re,
         CAST(SUM(v * s) AS BIGINT) AS im
  FROM smp JOIN b ON b.t = smp.t
  GROUP BY smp.doc_id, smp.frame, b.bin
)
SELECT doc_id, CAST(bin AS INT) AS bin,
       CAST(SUM(re * re + im * im) AS BIGINT) AS energy
FROM comp
GROUP BY doc_id, bin
ORDER BY doc_id, bin
"""


@register(
    "multimodal_audio_spectrogram",
    oracle=_spectrogram_oracle(),
    doc="Framed fixed-point spectrogram energy over REAL parsed WAV "
        "payloads: RIFF chunk walk, 64-sample frames (tail dropped), "
        "8-bin DFT with a Python-precomputed 2^6 fixed-point basis "
        "embedded as literals in BOTH engines, per-(doc, bin) exact "
        "integer energy Σ(re² + im²) — the band-energy profile audio "
        "curation filters on, and the second literal-basis transform "
        "witness beside the pHash DCT.  The deliberately low trig "
        "precision keeps the largest accumulator (~3.1e15) under 2^53 "
        "with margin, so numpy int64 and DuckDB HUGEINT sums agree "
        "bit-for-bit; the oracle re-derives samples from the waveform "
        "formula, so one mis-walked RIFF chunk breaks the hash.  "
        "Scale: O(samples) decode + two small integer matmuls per "
        "frame, no shuffle. "
        "operators/multimodal.py:audio_spectrogram_energy.",
    tags=("multimodal", "events"),
)
def multimodal_audio_spectrogram(spark: SparkSession,
                                 sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 5 == 0).select("doc_id"))
    return (M.audio_spectrogram_energy(M.attach_audio_payload(docs))
            .orderBy("doc_id", "bin"))


@register(
    "multimodal_image_edge_density",
    oracle="""
WITH d AS (
  SELECT doc_id, 8 + (doc_id % 8) * 4 AS w, 8 + (doc_id % 5) * 4 AS h
  FROM documents WHERE doc_id % 5 = 0
),
kernel AS (
  SELECT * FROM (VALUES
    (-1, -1, -1, -1), (0, -1, -2, 0), (1, -1, -1, 1),
    (-1,  0,  0, -2), (1,  0,  0, 2),
    (-1,  1,  1, -1), (0,  1,  2, 0), (1,  1,  1, 1)
  ) k(dy, dx, wy, wx)
),
inner_px AS (
  SELECT doc_id, w, h, x, y
  FROM d, range(1, 36) tx(x), range(1, 24) ty(y)
  WHERE x < w - 1 AND y < h - 1
),
grads AS (
  SELECT p.doc_id, p.x, p.y,
         SUM(k.wx * (
             (7 * p.doc_id + 3 * ((p.y + k.dy) * p.w + p.x + k.dx)) % 256
           + (7 * p.doc_id + 3 * ((p.y + k.dy) * p.w + p.x + k.dx) + 1) % 256
           + (7 * p.doc_id + 3 * ((p.y + k.dy) * p.w + p.x + k.dx) + 2) % 256
         )) AS gx,
         SUM(k.wy * (
             (7 * p.doc_id + 3 * ((p.y + k.dy) * p.w + p.x + k.dx)) % 256
           + (7 * p.doc_id + 3 * ((p.y + k.dy) * p.w + p.x + k.dx) + 1) % 256
           + (7 * p.doc_id + 3 * ((p.y + k.dy) * p.w + p.x + k.dx) + 2) % 256
         )) AS gy
  FROM inner_px p, kernel k
  GROUP BY p.doc_id, p.x, p.y
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_interior,
       CAST(SUM(CASE WHEN ABS(gx) + ABS(gy) >= 256 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_edges,
       CAST(SUM(ABS(gx) + ABS(gy)) AS BIGINT) AS gradient_total
FROM grads
GROUP BY doc_id
ORDER BY doc_id
""",
    doc="Sobel edge-density screen over REAL decoded pixels (exact "
        "integer 3x3 gradients on the r+g+b grayscale; edge when "
        "|gx|+|gy| >= 256): per doc, interior pixel count, edge count, "
        "and exact total gradient magnitude — the sharpness/flatness "
        "filter beside the intensity-histogram exposure profile.  The "
        "oracle rebuilds every gradient from the pixel generator via "
        "an 8-row kernel join (the center tap has weight 0 in both "
        "Sobel kernels), so one mis-decoded pixel anywhere breaks the "
        "hash.  Scale: O(pixels) per image, no shuffle. "
        "operators/multimodal.py:image_edge_density.",
    tags=("multimodal", "pipeline"),
)
def multimodal_image_edge_density(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 5 == 0).select("doc_id"))
    return (M.image_edge_density(M.attach_image_payload(docs))
            .orderBy("doc_id"))


@register(
    "multimodal_phash_near_dup_pairs",
    oracle=_phash_cte()
    + """SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
FROM ph a JOIN ph b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.phash, b.phash)) <= 5
ORDER BY doc_a, doc_b""",
    doc="Perceptual near-duplicate IMAGE pairs by pHash Hamming "
        "distance <= 5, found at scale by pigeonhole band blocking: "
        "the 63-bit hash splits into 6 bands, and any pair within "
        "distance 5 must agree exactly on at least one band (6 bands > "
        "5 flipped bits — the SimHash chunk argument applied to the "
        "DCT hash), so candidates come from 6 band-keyed equi-joins "
        "and only candidates pay the bit_count verify.  Closes the "
        "multimodal dedup loop: pixel-exact dup detection "
        "(multimodal_pixel_dedup) catches re-encodes, pHash Hamming "
        "catches near-misses.  The oracle verifies EXHAUSTIVELY "
        "(O(n²/2) bit_counts over the recomputed hashes) — the banded "
        "plan must find exactly the same pairs, which is the "
        "completeness guarantee itself.  Scale: band join fan-out "
        "bounded per band value; verify O(candidates). "
        "operators/multimodal.py:image_phash + band blocking.",
    tags=("multimodal", "dedup"),
)
def multimodal_phash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 5 == 0).select("doc_id"))
    ph = (M.image_phash(M.attach_image_payload(docs))
          .transform(materialize))
    # 6 pigeonhole bands over the 63 bits: 5 x 11 bits + 1 x 8 bits
    bands = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.expr(f"(phash >> {i * 11}) & "
                        f"{(1 << (11 if i < 5 else 8)) - 1}")
                  .alias("val"))
        for i in range(6)])
    keyed = (ph.select("doc_id", "phash", F.explode(bands).alias("bk"))
             .select("doc_id", "phash",
                     F.col("bk.band").alias("band"),
                     F.col("bk.val").alias("val")))
    right = keyed.select(F.col("doc_id").alias("doc_b"),
                         F.col("phash").alias("phash_b"),
                         "band", "val")
    ham = F.bit_count(F.col("phash").bitwiseXOR(F.col("phash_b")))
    return (keyed.join(right, ["band", "val"])
            .where(F.col("doc_id") < F.col("doc_b"))
            .select(F.col("doc_id").alias("doc_a"), "doc_b",
                    ham.cast("int").alias("hamming"))
            .where(F.col("hamming") <= 5)
            .distinct()
            .orderBy("doc_a", "doc_b"))


@register(
    "multimodal_color_moments",
    oracle="""
WITH d AS (
  SELECT doc_id,
         8 + (doc_id % 8) * 4 AS w,
         8 + (doc_id % 5) * 4 AS h
  FROM documents WHERE doc_id % 5 = 0
), px AS (
  SELECT doc_id, CAST(k % 3 AS INT) AS channel,
         (7 * doc_id + k) % 256 AS v
  FROM d, range(0, 2592) t(k)          -- static bound: 3 * max(w*h)
  WHERE k < 3 * w * h
)
SELECT doc_id, channel,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(SUM(v * v) AS BIGINT) AS sum_v2,
       ROUND(SUM(v) * 1.0 / COUNT(*), 6) AS mean_v
FROM px GROUP BY doc_id, channel
ORDER BY doc_id, channel
""",
    doc="Per-image per-RGB-channel color moments over REAL decoded "
        "pixels: exact integer count / sum / sum-of-squares plus the "
        "derived mean — the color-cast and contrast screen of a vision "
        "curation pass (grayscale triplication, blown channels, and "
        "synthetic-flat fills all read directly off the moment rows). "
        "The Spark side decodes the actual PPM/BMP payloads (channel-"
        "sliced numpy sums per Arrow batch; only (id, channel, 3 ints) "
        "leave the executor); the oracle re-derives every moment from "
        "the pixel generator formula with channel = flat_index mod 3, "
        "so a mis-parsed header or a BGR/RGB swap anywhere breaks the "
        "hash.  All-integer till the final ratio. "
        "operators/multimodal.py:color_moments.",
    tags=("multimodal", "pipeline"),
)
def multimodal_color_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 5 == 0).select("doc_id"))
    per = M.color_moments(M.attach_image_payload(docs))
    return (per.select("doc_id", "channel", "n_px", "sum_v", "sum_v2",
                       F.round(F.col("sum_v").cast("double")
                               / F.col("n_px"), 6).alias("mean_v"))
            .orderBy("doc_id", "channel"))


@register(
    "multimodal_png_decode",
    oracle="""
WITH d AS (
  SELECT doc_id,
         8 + (doc_id % 8) * 4 AS w,
         8 + (doc_id % 5) * 4 AS h
  FROM documents WHERE doc_id % 7 = 0
), px AS (
  SELECT doc_id, CAST(k % 3 AS INT) AS channel,
         (7 * doc_id + k) % 256 AS v
  FROM d, range(0, 2592) t(k)          -- static bound: 3 * max(w*h)
  WHERE k < 3 * w * h
)
SELECT doc_id, channel,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(SUM(v * v) AS BIGINT) AS sum_v2
FROM px GROUP BY doc_id, channel
ORDER BY doc_id, channel
""",
    doc="REAL PNG decode, pixel-oracled: payloads are genuine "
        "zlib-compressed truecolor PNGs (chunk CRCs verified, "
        "scanline filters undone) built and parsed by the pure "
        "numpy+stdlib-zlib codec in operators/multimodal.py — the "
        "'png decode needs Pillow' gap is CLOSED for the 8-bit RGB "
        "profile (jpeg/webp stay genuinely library-gated).  The "
        "oracle re-derives every channel moment from the pixel "
        "generator formula, so one wrong inflate byte, filter "
        "prediction, or CRC anywhere breaks the hash. "
        "operators/multimodal.py:_decode_png,attach_png_payload.",
    tags=("multimodal", "pipeline"),
)
def multimodal_png_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 7 == 0).select("doc_id"))
    per = M.color_moments(M.attach_png_payload(docs))
    return (per.select("doc_id", "channel", "n_px", "sum_v", "sum_v2")
            .orderBy("doc_id", "channel"))


@register(
    "multimodal_pixel_dedup_cross_codec",
    oracle="""
WITH off AS (
  SELECT ((MAX(doc_id) // 1280) + 1) * 1280 AS o FROM documents
), ids AS (
  SELECT doc_id FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + (SELECT o FROM off) FROM documents WHERE doc_id % 5 = 0
  UNION ALL
  SELECT doc_id + 2 * (SELECT o FROM off) FROM documents
  WHERE doc_id % 5 = 0
), d AS (
  SELECT doc_id,
         8 + (doc_id % 8) * 4 AS w,
         8 + (doc_id % 5) * 4 AS h,
         CASE (doc_id // (SELECT o FROM off)) % 3
              WHEN 0 THEN 'ppm' WHEN 1 THEN 'bmp' ELSE 'png' END AS fmt
  FROM ids
), sig AS (
  SELECT doc_id, w, h, fmt,
         md5(string_agg(CAST((7 * doc_id + k) % 256 AS VARCHAR),
                        ',' ORDER BY k)) AS pix_sig
  FROM d, range(0, 2592) t(k)
  WHERE k < 3 * w * h
  GROUP BY doc_id, w, h, fmt
)
SELECT pix_sig,
       CAST(MIN(doc_id) AS BIGINT) AS rep_id,
       CAST(COUNT(*) AS BIGINT) AS n_copies,
       CAST(COUNT(DISTINCT fmt) AS BIGINT) AS n_fmts,
       CAST(MIN(w) AS INT) AS width,
       CAST(MIN(h) AS INT) AS height
FROM sig GROUP BY pix_sig HAVING COUNT(*) > 2
ORDER BY rep_id
""",
    doc="THREE-codec exact image dedup (the cross-encoding entry "
        "extended to the PNG codec): each sampled picture exists as "
        "PPM, BMP, and zlib-compressed PNG bytes; md5 over the DECODED "
        "pixel stream must group all three (n_fmts = 3), which only "
        "happens if the plain-buffer parses AND the inflate+unfilter "
        "PNG parse reproduce byte-identical pixels.  Same id-offset "
        "construction as multimodal_pixel_dedup (offset = smallest "
        "1280-multiple past the max id, so copies never collide at any "
        "SF). operators/multimodal.py:attach_image_payload_3way,"
        "pixel_signatures.",
    tags=("multimodal", "dedup"),
)
def multimodal_pixel_dedup_3way(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = table(spark, sf_dir, "documents")
    max_id = docs.agg(F.max("doc_id")).first()[0]
    offset = ((max_id // 1280) + 1) * 1280
    base = docs.where(F.col("doc_id") % 5 == 0).select("doc_id")
    ids = (base
           .unionAll(base.select((F.col("doc_id") + offset)
                                 .alias("doc_id")))
           .unionAll(base.select((F.col("doc_id") + 2 * offset)
                                 .alias("doc_id"))))
    sigs = M.pixel_signatures(M.attach_image_payload_3way(ids, offset))
    return (sigs.groupBy("pix_sig")
            .agg(F.min("doc_id").cast("bigint").alias("rep_id"),
                 F.count(F.lit(1)).cast("bigint").alias("n_copies"),
                 F.countDistinct("fmt").cast("bigint").alias("n_fmts"),
                 F.min("width").cast("int").alias("width"),
                 F.min("height").cast("int").alias("height"))
            .where(F.col("n_copies") > 2)
            .orderBy("rep_id"))


@register(
    "multimodal_jpeg_decode",
    oracle="""
WITH d AS (
  SELECT doc_id,
         16 * (1 + doc_id % 3) AS w,
         16 * (1 + doc_id % 2) AS h
  FROM documents WHERE doc_id % 5 = 0
), tile AS (
  SELECT doc_id, w, h,
         (11 * doc_id + 7 * k) % 256 AS r,
         (23 * doc_id + 13 * k) % 256 AS g,
         (5 * doc_id + 29 * k) % 256 AS b
  FROM d, range(0, 6) t(k)            -- static bound: (48/16)*(32/16)
  WHERE k < (w // 16) * (h // 16)
), ycc AS (
  SELECT doc_id,
         CAST(FLOOR((77*r + 150*g + 29*b + 128) / 256.0) AS BIGINT)
           AS y,
         128 + CAST(FLOOR((-43*r - 85*g + 128*b + 128) / 256.0)
                    AS BIGINT) AS cb,
         128 + CAST(FLOOR((128*r - 107*g - 21*b + 128) / 256.0)
                    AS BIGINT) AS cr
  FROM tile
), rgb AS (
  SELECT doc_id,
         GREATEST(0, LEAST(255, y + CAST(FLOOR((359*(cr-128) + 128)
                                               / 256.0) AS BIGINT)))
           AS r2,
         GREATEST(0, LEAST(255, y - CAST(FLOOR((88*(cb-128)
                                                + 183*(cr-128) + 128)
                                               / 256.0) AS BIGINT)))
           AS g2,
         GREATEST(0, LEAST(255, y + CAST(FLOOR((454*(cb-128) + 128)
                                               / 256.0) AS BIGINT)))
           AS b2
  FROM ycc
)
SELECT doc_id, ch.channel,
       CAST(SUM(256) AS BIGINT) AS n_px,
       CAST(SUM(256 * CASE ch.channel WHEN 0 THEN r2
                                      WHEN 1 THEN g2 ELSE b2 END)
            AS BIGINT) AS sum_v,
       CAST(SUM(256 * (CASE ch.channel WHEN 0 THEN r2
                                       WHEN 1 THEN g2 ELSE b2 END)
                    * (CASE ch.channel WHEN 0 THEN r2
                                       WHEN 1 THEN g2 ELSE b2 END))
            AS BIGINT) AS sum_v2
FROM rgb CROSS JOIN (SELECT UNNEST([0, 1, 2]) AS channel) ch
GROUP BY doc_id, ch.channel
ORDER BY doc_id, channel
""",
    doc="REAL baseline JPEG decode, pixel-oracled: payloads are genuine "
        "JFIF bytes (SOF0 markers, DHT-embedded canonical Huffman "
        "tables, byte-stuffed entropy stream, quantized DCT blocks) "
        "built AND parsed by the pure-numpy codec in "
        "operators/multimodal.py — the 'jpeg decode needs Pillow' gap "
        "is CLOSED for the baseline sequential profile (even ids "
        "encode 4:2:0, odd 4:4:4, so BOTH subsampling paths are "
        "exercised; progressive/arithmetic/restart streams raise "
        "loudly; webp/VP8 stays library-gated).  The fixture class is "
        "16x16-constant tiles, where the lossy pipeline is exactly "
        "invertible (AC quantizes to 0, DC step divides the DC scale), "
        "so the oracle replicates the decoded pixels analytically "
        "through the codec's DEFINED fixed-point YCbCr round-trip — "
        "one wrong Huffman bit, dequant step, IDCT term, upsample, or "
        "color coefficient anywhere breaks the hash.  Random-image "
        "tolerance + exactness pytests cover the AC path. "
        "operators/multimodal.py:_decode_jpeg,attach_jpeg_payload.",
    tags=("multimodal", "pipeline"),
)
def multimodal_jpeg_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 5 == 0).select("doc_id"))
    per = M.color_moments(M.attach_jpeg_payload(docs))
    return (per.select("doc_id", "channel", "n_px", "sum_v", "sum_v2")
            .orderBy("doc_id", "channel"))


@register(
    "multimodal_jpeg_subsampling_dedup",
    oracle="""
WITH d AS (
  SELECT doc_id,
         16 * (1 + doc_id % 3) AS w,
         16 * (1 + doc_id % 2) AS h
  FROM documents WHERE doc_id % 11 = 0
), px AS (
  SELECT doc_id, w, h, k,
         ((k // 3) // w // 16) * (w // 16) + ((k // 3) % w) // 16 AS t,
         k % 3 AS ch
  FROM d, range(0, 4608) s(k)         -- static bound: 3 * 48 * 32
  WHERE k < 3 * w * h
), tile AS (
  SELECT doc_id, w, h, k, ch,
         (11 * doc_id + 7 * t) % 256 AS r,
         (23 * doc_id + 13 * t) % 256 AS g,
         (5 * doc_id + 29 * t) % 256 AS b
  FROM px
), ycc AS (
  SELECT doc_id, w, h, k, ch,
         CAST(FLOOR((77*r + 150*g + 29*b + 128) / 256.0) AS BIGINT)
           AS y,
         128 + CAST(FLOOR((-43*r - 85*g + 128*b + 128) / 256.0)
                    AS BIGINT) AS cb,
         128 + CAST(FLOOR((128*r - 107*g - 21*b + 128) / 256.0)
                    AS BIGINT) AS cr
  FROM tile
), v AS (
  SELECT doc_id, w, h, k,
         CASE ch
           WHEN 0 THEN GREATEST(0, LEAST(255,
             y + CAST(FLOOR((359*(cr-128) + 128) / 256.0) AS BIGINT)))
           WHEN 1 THEN GREATEST(0, LEAST(255,
             y - CAST(FLOOR((88*(cb-128) + 183*(cr-128) + 128) / 256.0)
                      AS BIGINT)))
           ELSE GREATEST(0, LEAST(255,
             y + CAST(FLOOR((454*(cb-128) + 128) / 256.0) AS BIGINT)))
         END AS val
  FROM ycc
), sig AS (
  SELECT doc_id, w, h,
         md5(string_agg(CAST(val AS VARCHAR), ',' ORDER BY k))
           AS pix_sig
  FROM v GROUP BY doc_id, w, h
)
SELECT pix_sig,
       CAST(MIN(doc_id) AS BIGINT) AS rep_id,
       CAST(2 * COUNT(*) AS BIGINT) AS n_copies,
       CAST(MIN(w) AS INT) AS width,
       CAST(MIN(h) AS INT) AS height
FROM sig GROUP BY pix_sig
ORDER BY rep_id
""",
    doc="Cross-SUBSAMPLING exact image dedup: every sampled picture is "
        "encoded twice — 4:2:0 and 4:4:4 baseline JPEG, different "
        "bytes — and md5 over the DECODED pixel stream must group the "
        "pair (n_copies = 2 per id; ids 768 apart share tile colors "
        "and merge further, which the oracle reproduces since it "
        "groups by the same signature).  Passing requires BOTH "
        "entropy-decode paths (interleaved 2x2-Y MCUs with chroma "
        "upsample vs per-block 4:4:4) to reproduce byte-identical "
        "pixels.  operators/multimodal.py:attach_jpeg_payload,"
        "pixel_signatures.",
    tags=("multimodal", "dedup"),
)
def multimodal_jpeg_subsampling_dedup(spark: SparkSession,
                                      sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 11 == 0).select("doc_id"))
    sigs = M.pixel_signatures(
        M.attach_jpeg_payload(docs, both_subsamplings=True))
    return (sigs.groupBy("pix_sig")
            .agg(F.min("doc_id").cast("bigint").alias("rep_id"),
                 F.count(F.lit(1)).cast("bigint").alias("n_copies"),
                 F.min("width").cast("int").alias("width"),
                 F.min("height").cast("int").alias("height"))
            .orderBy("rep_id"))


@register(
    "multimodal_jpeg_header_scan",
    oracle="""
SELECT doc_id,
       CAST(16 * (1 + doc_id % 3) AS INT) AS width,
       CAST(16 * (1 + doc_id % 2) AS INT) AS height,
       CAST(3 AS INT) AS n_components,
       CASE WHEN doc_id % 2 = 0 THEN '420' ELSE '444' END AS subsampling,
       CAST(8 AS INT) AS dc_step_luma
FROM documents WHERE doc_id % 5 = 0
ORDER BY doc_id
""",
    doc="Header-ONLY JPEG metadata scan: walk the marker segments "
        "(SOI/DQT/SOF0) and emit dimensions, component count, chroma "
        "subsampling mode, and the luma DC quant step WITHOUT entropy-"
        "decoding a single block — the gate a 100 TB vision-curation "
        "pass runs first, because rejecting by dimensions/subsampling/"
        "quality proxy reads a few hundred header bytes per object "
        "instead of megapixels (the quant step IS the standard quality "
        "proxy: bigger steps = lower quality).  The oracle re-derives "
        "every field from the fixture formulas, so a mis-parsed "
        "length, sampling nibble, or table id breaks the hash. "
        "operators/multimodal.py:_jpeg_header,jpeg_header_scan.",
    tags=("multimodal", "pipeline"),
)
def multimodal_jpeg_header_scan(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 5 == 0).select("doc_id"))
    return (M.jpeg_header_scan(M.attach_jpeg_payload(docs))
            .orderBy("doc_id"))


@register(
    "multimodal_gif_decode",
    oracle="""
WITH d AS (
  SELECT doc_id,
         8 + (doc_id % 8) * 4 AS w,
         8 + (doc_id % 5) * 4 AS h
  FROM documents WHERE doc_id % 9 = 0
), px AS (
  SELECT doc_id, c.c AS channel,
         CASE c.c WHEN 0 THEN (7 * doc_id + k) % 256
                  WHEN 1 THEN (2 * ((7 * doc_id + k) % 256)) % 256
                  ELSE (3 * ((7 * doc_id + k) % 256)) % 256 END AS v
  FROM d, range(0, 864) t(k), (SELECT unnest([0, 1, 2]) AS c) c
  WHERE k < w * h
)
SELECT doc_id, CAST(channel AS INT) AS channel,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(SUM(v * v) AS BIGINT) AS sum_v2
FROM px GROUP BY doc_id, channel
ORDER BY doc_id, channel
""",
    doc="REAL GIF decode, pixel-oracled: payloads are genuine GIF89a "
        "bytes — 256-entry global color table + variable-width LZW "
        "(LSB-first packing, CLEAR/EOI, 12-bit cap with reset) — "
        "built and parsed by the pure stdlib+numpy codec in "
        "operators/multimodal.py, closing the last feasible codec gap "
        "after PNG (r9) and JPEG (r10); webp (VP8 entropy coding) "
        "stays honestly library-gated.  The LZW decoder is cross-"
        "validated against the published 10x10 GIF sample stream "
        "(tests/test_operators.py::test_gif_lzw_spec_vector), not "
        "just self-roundtripped.  The affine fixture palette (i, 2i, "
        "3i mod 256) lets the oracle derive every channel moment from "
        "the index formula, so one wrong LZW code width, sub-block "
        "seam, or palette lookup anywhere breaks the hash. "
        "operators/multimodal.py:_decode_gif,attach_gif_payload.",
    tags=("multimodal", "pipeline"),
)
def multimodal_gif_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 9 == 0).select("doc_id"))
    per = M.color_moments(M.attach_gif_payload(docs))
    return (per.select("doc_id", "channel", "n_px", "sum_v", "sum_v2")
            .orderBy("doc_id", "channel"))


@register(
    "multimodal_gif_animation_dedup",
    oracle="""
WITH d AS (
  SELECT doc_id,
         8 + (doc_id % 8) * 4 AS w,
         8 + (doc_id % 5) * 4 AS h
  FROM documents WHERE doc_id % 15 = 0
), fr AS (
  SELECT doc_id, w, h, f.f AS frame_idx,
         CASE f.f WHEN 0 THEN 0 WHEN 1 THEN 0
                  WHEN 2 THEN 11 ELSE 29 END AS off
  FROM d, (SELECT unnest([0, 1, 2, 3]) AS f) f
), sums AS (
  SELECT doc_id, frame_idx, w, h,
         CAST(SUM((7 * doc_id + k + off) % 256) AS BIGINT) AS idx_sum
  FROM fr, range(0, 864) t(k)
  WHERE k < w * h
  GROUP BY doc_id, frame_idx, w, h
)
SELECT doc_id, CAST(frame_idx AS INT) AS frame_idx,
       CAST(w AS INT) AS width, CAST(h AS INT) AS height,
       CAST(10 AS INT) AS delay_cs, idx_sum,
       frame_idx = 1 AS is_dup_of_prev
FROM sums
ORDER BY doc_id, frame_idx
""",
    doc="Animated-GIF frame-level dedup over REAL multi-frame decode: "
        "each payload is a genuine 4-frame GIF89a animation (Graphic "
        "Control Extension per frame, delay 10 cs) whose frames 0 and "
        "1 are exact duplicates — the looping-still pattern a video/"
        "animation curation pass drops before feature extraction.  "
        "Every frame is fully LZW-decoded; the dup flag is whole-"
        "index-stream equality and the exact per-frame index sum pins "
        "all four decodes, GCE delay parse included.  Per-group state "
        "is one payload's frames; only (id, frame, ints) rows leave "
        "the executor — payload bytes never shuffle. "
        "operators/multimodal.py:gif_frame_dedup,attach_gif_payload.",
    tags=("multimodal", "pipeline"),
)
def multimodal_gif_animation_dedup(spark: SparkSession,
                                   sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 15 == 0).select("doc_id"))
    return (M.gif_frame_dedup(M.attach_gif_payload(docs, n_frames=4))
            .orderBy("doc_id", "frame_idx"))


@register(
    "multimodal_tiff_decode",
    oracle="""
WITH d AS (
  SELECT doc_id,
         8 + (doc_id % 8) * 4 AS w,
         8 + (doc_id % 5) * 4 AS h,
         CASE WHEN doc_id % 2 = 0 THEN 'none' ELSE 'packbits' END
           AS compression
  FROM documents WHERE doc_id % 7 = 1
), px AS (
  SELECT doc_id, compression, CAST(k % 3 AS INT) AS channel,
         (5 * doc_id + k // 24) % 256 AS v
  FROM d, range(0, 2592) t(k)          -- static bound: 3 * max(w*h)
  WHERE k < 3 * w * h
)
SELECT doc_id, compression, channel,
       CAST(COUNT(*) AS BIGINT) AS n_px,
       CAST(SUM(v) AS BIGINT) AS sum_v,
       CAST(SUM(v * v) AS BIGINT) AS sum_v2
FROM px GROUP BY doc_id, compression, channel
ORDER BY doc_id, channel
""",
    doc="REAL baseline-TIFF decode, pixel-oracled: payloads are "
        "genuine TIFF 6.0 files (IFD walk, multi-strip assembly with "
        "RowsPerStrip=4, Compression 1 AND 32773/PackBits alternating "
        "by id parity, both II and MM readable) built and parsed by "
        "the pure numpy+struct codec; the pixel formula holds each "
        "byte for 24 positions so the PackBits strips actually carry "
        "RLE runs — a run-decode bug cannot hide behind literal-only "
        "streams, and the PackBits decoder is additionally pinned to "
        "the TIFF 6.0 spec's published example vector in pytest.  The "
        "oracle re-derives every channel moment from the generator "
        "formula, so one wrong strip offset, byte-count, or RLE copy "
        "breaks the hash.  Tiles/planar-2/LZW/other depths raise "
        "loudly (GAPS.md codec row). "
        "operators/multimodal.py:_decode_tiff,attach_tiff_payload.",
    tags=("multimodal", "pipeline"),
)
def multimodal_tiff_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 7 == 1).select("doc_id"))
    per = M.color_moments(M.attach_tiff_payload(docs))
    return (per.withColumn(
                "compression",
                F.when(F.col("doc_id") % 2 == 0, "none")
                 .otherwise("packbits"))
            .select("doc_id", "compression", "channel", "n_px",
                    "sum_v", "sum_v2")
            .orderBy("doc_id", "channel"))


@register(
    "multimodal_audio_mulaw_roundtrip",
    oracle="""
WITH d AS (
  SELECT doc_id, 800 + (doc_id % 5) * 160 AS n
  FROM documents WHERE doc_id % 6 = 1
), s AS (
  SELECT doc_id, (((31 * doc_id + 7 * i) % 4096) - 2048) * 16 AS v
  FROM d, range(0, 1440) t(i) WHERE i < n
), e AS (
  SELECT doc_id, v, v >> 2 AS p FROM s
), x AS (
  SELECT doc_id, v,
         CASE WHEN p < 0 THEN 127 ELSE 255 END AS mask,
         LEAST(ABS(p), 8159) + 33 AS pb,
         CASE WHEN ABS(p) > 8159 THEN 1 ELSE 0 END AS clipped
  FROM e
), g AS (
  SELECT doc_id, v, mask, pb, clipped,
         (CASE WHEN pb > 63 THEN 1 ELSE 0 END)
         + (CASE WHEN pb > 127 THEN 1 ELSE 0 END)
         + (CASE WHEN pb > 255 THEN 1 ELSE 0 END)
         + (CASE WHEN pb > 511 THEN 1 ELSE 0 END)
         + (CASE WHEN pb > 1023 THEN 1 ELSE 0 END)
         + (CASE WHEN pb > 2047 THEN 1 ELSE 0 END)
         + (CASE WHEN pb > 4095 THEN 1 ELSE 0 END)
         + (CASE WHEN pb > 8191 THEN 1 ELSE 0 END) AS seg
  FROM x
), c AS (
  SELECT doc_id, v, clipped,
         mask - (CASE WHEN seg >= 8 THEN 127
                      ELSE seg * 16 + ((pb >> (seg + 1)) & 15) END) AS code
  FROM g
), u AS (
  SELECT doc_id, v, clipped, code, 255 - code AS uc FROM c
), dec AS (
  SELECT doc_id, v, clipped, code,
         CASE WHEN uc >= 128
              THEN 132 - (((uc % 16) * 8 + 132)
                          * ([1,2,4,8,16,32,64,128])[((uc // 16) % 8) + 1])
              ELSE (((uc % 16) * 8 + 132)
                    * ([1,2,4,8,16,32,64,128])[((uc // 16) % 8) + 1]) - 132
         END AS w
  FROM u
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_samples,
       CAST(COUNT(DISTINCT code) AS BIGINT) AS n_codes,
       CAST(SUM(code) AS BIGINT) AS sum_code,
       CAST(SUM(ABS(v - w)) AS BIGINT) AS sum_abs_err,
       CAST(MAX(ABS(v - w)) AS BIGINT) AS max_abs_err,
       CAST(SUM(clipped) AS BIGINT) AS n_clipped
FROM dec GROUP BY doc_id ORDER BY doc_id
""",
    doc="G.711 μ-law companding round-trip (ITU-T G.711, the telephony "
        "codec speech-data ingestion meets first), pixel-oracle style: "
        "the Spark side parses REAL WAV containers, scales the 12-bit "
        "fixture waveform to 16-bit (so the −32768 extreme exercises "
        "the 14-bit ±8159 clip), μ-law encodes with the Sun/CCITT "
        "reference algorithm — arithmetic >>2 to 14 bits (FLOORS "
        "negatives, the detail naive ports get wrong; verified equal "
        "to stdlib audioop over the full 16-bit range, pinned in "
        "pytest), clip 8159 + bias 33, threshold-count segment, "
        "XOR-complemented code — decodes back, and reports "
        "exact integer stats per clip (code-stream sum + distinct "
        "codes, quantization-error sum/max, clipped count); the "
        "oracle re-derives the identical closed form from the "
        "waveform formula — a wrong shift, bias, or clamp anywhere "
        "breaks the hash.  All-integer end to end; map-only, one "
        "7-int row per clip. operators/multimodal.py:audio_mulaw_stats.",
    tags=("multimodal", "pipeline"),
)
def multimodal_audio_mulaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    docs = (table(spark, sf_dir, "documents")
            .where(F.col("doc_id") % 6 == 1).select("doc_id"))
    return (M.audio_mulaw_stats(M.attach_audio_payload(docs))
            .orderBy("doc_id"))
