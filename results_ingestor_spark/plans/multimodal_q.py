"""Multimodal-column queries (north-star M3).

The payloads here are UTF-8 bytes standing in for image/audio content
(the corpus has no binary media); the *Spark path* is the real thing —
binary columns, Arrow-batched mapInPandas kernels, fan-out schemas.
Because the stub 'decode' is a deterministic function of the bytes, the
oracle can verify the whole Python-side path value-for-value.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from results_ingestor_spark.operators.multimodal import (
    CHUNK_SIZE, FRAME_STRIDE, decode_features, sample_frames)
from results_ingestor_spark.plans import exact
from results_ingestor_spark.plans.registry import query
from results_ingestor_spark.sources.tables import load_tables


@query("multimodal_decode_features", oracle="""
SELECT doc_id,
  strlen(text) AS n_bytes,
  md5(text) AS content_md5,
  CAST(strlen(text) % 251 AS DOUBLE) / 251.0 AS fake_feature
FROM documents""")
def multimodal_decode_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary decode → features through mapInPandas (Arrow batches).
    The oracle checks the bytes seen by Python match the source exactly
    (md5 over the binary payload)."""
    t = load_tables(spark, sf_dir, ("documents",))
    return decode_features(t["documents"])


@query("multimodal_frame_sample", oracle=f"""
SELECT doc_id, CAST(i AS INT) AS frame_idx,
  md5(substr(text, CAST(i * {FRAME_STRIDE} + 1 AS INT), {FRAME_STRIDE}))
    AS frame_md5
FROM (SELECT doc_id, text,
        unnest(range(strlen(text) // {FRAME_STRIDE})) AS i
      FROM documents)""")
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling: one output row per 100-byte chunk per document —
    the N-rows-per-input fan-out shape of video frame extraction,
    executed batch-local inside mapInPandas."""
    t = load_tables(spark, sf_dir, ("documents",))
    return sample_frames(t["documents"])


@query("multimodal_chunk_energy", oracle=f"""
SELECT doc_id, CAST(i AS INT) AS chunk_idx,
  CAST(floor((list_sum([ord(substr(text, CAST(i * {CHUNK_SIZE} + j AS INT), 1)) for j in range(1, {CHUNK_SIZE + 1})]) / {CHUNK_SIZE}.0) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE) AS energy
FROM (SELECT doc_id, text, unnest(range(strlen(text) // {CHUNK_SIZE})) AS i
      FROM documents WHERE doc_id < 100)""")
def multimodal_chunk_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-shaped kernel: mean byte value per fixed window over the
    binary payload (the post-decode waveform-energy computation),
    mapInPandas fan-out.  The oracle recomputes every chunk's energy
    from code points — the corpus is ASCII, so byte == code point and
    the Python-side arithmetic is value-checked end-to-end."""
    from results_ingestor_spark.operators.multimodal import chunk_energy
    t = load_tables(spark, sf_dir, ("documents",))
    return chunk_energy(t["documents"].where(F.col("doc_id") < 100))


@query("multimodal_png_header_parse", oracle="""
SELECT doc_id,
  TRUE AS is_png,
  CAST(doc_id % 1920 + 1 AS BIGINT) AS width,
  CAST(doc_id % 1080 + 1 AS BIGINT) AS height,
  CAST(8 AS BIGINT) AS bit_depth,
  CAST(strlen(text) AS BIGINT) AS n_content_bytes
FROM documents""")
def multimodal_png_header_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Structured binary metadata extraction with zero Python: build a
    real PNG signature + IHDR header around each payload (dimensions
    derived from doc_id), then parse the fields back out of the BYTES
    with substring/hex/conv inside codegen.  The oracle states the
    ground truth directly, so a green row proves encode→parse is the
    identity — the binary plumbing is exact, not approximated."""
    from results_ingestor_spark.operators.multimodal import (
        parse_png_header, with_png_payload)
    t = load_tables(spark, sf_dir, ("documents",))
    d = with_png_payload(t["documents"],
                         width=F.col("doc_id") % 1920 + 1,
                         height=F.col("doc_id") % 1080 + 1)
    return parse_png_header(d)


@query("multimodal_resize", oracle="""
WITH r AS (
  SELECT doc_id, strlen(text) AS orig_bytes,
    array_to_string(
      list_transform(range((strlen(text) + 3) // 4),
                     i -> substr(text, CAST(i * 4 + 1 AS INT), 1)), '')
      AS resized
  FROM documents)
SELECT doc_id, orig_bytes,
  CAST(strlen(resized) AS BIGINT) AS resized_bytes,
  md5(resized) AS resized_md5
FROM r""")
def multimodal_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize kernel (image-pipeline shape): nearest-neighbor 1-D
    downsample by 4 through the Arrow mapInPandas path — the oracle
    rebuilds every 4th byte and its md5, so the Python-side resize is
    value-checked end-to-end (the corpus is ASCII: byte == char)."""
    from results_ingestor_spark.operators.multimodal import resize_payloads
    t = load_tables(spark, sf_dir, ("documents",))
    return resize_payloads(t["documents"])


def _phash_oracle() -> str:
    """Unrolled-SQL replay of the ENTIRE pHash pipeline — byte tiling,
    the 8x32 quantized-integer DCT factor matmuls, the doubled-median
    threshold, MSB-first bit packing, signed-64 conversion, 4x16-bit
    banding, and the pair join.  Possible because the kernel's basis is
    quantized to integers (operators/multimodal.py::phash_basis_q), so
    both engines do identical int64 arithmetic; the 256 basis literals
    inline here (the kmeans_sql.py unrolled-replay device).  This
    removed the entry from the rows-only census in round 5."""
    from results_ingestor_spark.operators.multimodal import phash_basis_q
    bq = phash_basis_q()
    rows = ", ".join(
        f"({u},{r},{int(bq[u, r])})"
        for u in range(bq.shape[0]) for r in range(bq.shape[1]))
    return f"""
WITH b(u, r, w) AS (VALUES {rows}),
d AS (SELECT doc_id, hex(encode(text)) AS hx,
        octet_length(encode(text)) AS len0,
        GREATEST(1, octet_length(encode(text))) AS len
      FROM documents),
px AS (  -- 32x32 'image': payload BYTES tiled/truncated, row-major.
  -- Byte access replays the kernel's UTF-8 tiling exactly (ADVICE r5:
  -- character substr() diverges on any non-ASCII codepoint): each byte
  -- is decoded from its hex pair, and GREATEST(1, octet_length) guards
  -- the modulo like the kernel's max(1, len) — an empty payload is an
  -- all-zero image in both engines.
  SELECT doc_id, CAST(p.i AS BIGINT) AS p,
    CASE WHEN len0 = 0 THEN 0 ELSE
      16 * (strpos('0123456789ABCDEF',
                   substr(hx, 2 * CAST(p.i % len AS INT) + 1, 1)) - 1)
         + (strpos('0123456789ABCDEF',
                   substr(hx, 2 * CAST(p.i % len AS INT) + 2, 1)) - 1)
    END AS v
  FROM d CROSS JOIN (SELECT unnest(range(0, 1024)) AS i) p),
t AS (  -- t[u,c] = sum_r b[u,r] * img[r,c]
  SELECT doc_id, b.u AS u, (p % 32) AS c, SUM(b.w * v) AS tv
  FROM px JOIN b ON b.r = (p // 32)
  GROUP BY doc_id, b.u, p % 32),
low AS (  -- dct[u,v] = sum_c t[u,c] * b[v,c]  (8x8 low block)
  SELECT doc_id, t.u AS u, b2.u AS v, SUM(t.tv * b2.w) AS val
  FROM t JOIN b b2 ON b2.r = t.c
  GROUP BY doc_id, t.u, b2.u),
ranked AS (
  SELECT doc_id, u, v, val,
    row_number() OVER (PARTITION BY doc_id ORDER BY val) AS rk
  FROM low),
med AS (  -- 2*median of the 64 coefs = sum of the two middle values
  SELECT doc_id, SUM(val) AS med2 FROM ranked WHERE rk IN (32, 33)
  GROUP BY doc_id),
hb AS (  -- MSB-first bit pack, unsigned in HUGEINT
  SELECT r.doc_id,
    SUM(CASE WHEN 2 * val > med2
        THEN CAST(1 AS HUGEINT) << (63 - (u * 8 + v))
        ELSE CAST(0 AS HUGEINT) END) AS uh
  FROM ranked r JOIN med USING (doc_id) GROUP BY r.doc_id),
h AS (  -- two's-complement signed 64-bit, matching the kernel's int64
  SELECT doc_id,
    CAST(CASE WHEN uh >= CAST(1 AS HUGEINT) << 63
         THEN uh - (CAST(1 AS HUGEINT) << 64) ELSE uh END AS BIGINT)
      AS phash
  FROM hb),
keyed AS (
  SELECT doc_id, phash, CAST(bb.band AS INT) AS bidx,
    (phash >> (16 * CAST(bb.band AS INT))) & 65535 AS bkey
  FROM h CROSS JOIN (SELECT unnest(range(0, 4)) AS band) bb),
pairs AS (
  SELECT DISTINCT l.doc_id AS id_a, r.doc_id AS id_b,
    l.phash AS pa, r.phash AS pb
  FROM keyed l JOIN keyed r
    ON l.bidx = r.bidx AND l.bkey = r.bkey AND l.doc_id < r.doc_id)
SELECT id_a, id_b,
  CAST(bit_count(xor(pa, pb)) AS INT) AS hamming,
  bit_count(xor(pa, pb)) <= 3 AS is_near_dup
FROM pairs"""


@query("multimodal_phash_neardup", oracle=_phash_oracle())
def multimodal_phash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Image near-duplicate detection by 64-bit perceptual hash: the
    payload 'decodes' through the Arrow mapInPandas path into a pHash
    (32x32 → DCT → 8x8 low block → median threshold — the real pHash
    algorithm over the stub decode), then pairs within Hamming
    distance 3 surface via a 4x16-bit banded equi-join whose candidate
    set is pigeonhole-COMPLETE at that threshold — the result provably
    equals the all-pairs scan while shuffling only (band key, id).
    VALUE-CHECKED since round 5: the basis quantizes to integers
    (``phash_basis_q``), making the DCT exact int64 in both engines,
    and the oracle replays tiling→matmul→threshold→banding in unrolled
    SQL.  Completeness vs brute force, determinism, and exact-dup ⊂
    hamming-0 stay pinned in tests/test_text_multimodal.py."""
    from results_ingestor_spark.operators.multimodal import (
        perceptual_hashes, phash_near_dup_pairs)
    t = load_tables(spark, sf_dir, ("documents",))
    return phash_near_dup_pairs(perceptual_hashes(t["documents"]))


@query("multimodal_patch_grid", oracle="""
WITH d AS (
  SELECT doc_id,
    CAST(doc_id % 1920 + 1 AS BIGINT) AS w,
    CAST(doc_id % 1080 + 1 AS BIGINT) AS h
  FROM documents)
SELECT doc_id, w AS width, h AS height,
  (w + 15) // 16 AS n_patches_x,
  (h + 15) // 16 AS n_patches_y,
  ((w + 15) // 16) * ((h + 15) // 16) AS n_patches,
  ((w + 15) // 16) * ((h + 15) // 16) + 1 AS seq_len_with_cls,
  ((w + 15) // 16) * 16 - w AS pad_x,
  ((h + 15) // 16) * 16 - h AS pad_y,
  ((((h + 15) // 16) - 1) * 16 * w + (((w + 15) // 16) - 1) * 16) * 3
    AS last_patch_byte_offset
FROM d ORDER BY doc_id""")
def multimodal_patch_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ViT-style 16×16 patch-grid planning over the synthetic image
    dimensions (the png-header entry's width/height convention): patch
    counts per axis, total sequence length with the CLS token, the
    zero-padding each axis needs, and the byte offset of the LAST
    patch in an RGB row-major buffer — the addressing arithmetic a
    vision-preprocessing stage must get right before any pixel moves.
    Everything is exact integer expressions in codegen; the oracle
    states the ground truth independently.

    Scale: pure map stage over metadata columns; bodies are never
    touched (the offsets exist so a later mapInPandas kernel can slice
    without decoding)."""
    t = load_tables(spark, sf_dir, ("documents",))
    w = (F.col("doc_id") % 1920 + 1).cast("long")
    h = (F.col("doc_id") % 1080 + 1).cast("long")
    npx = F.shiftright(w + 15, 4)  # integer ceil-div by 16, no double
    npy = F.shiftright(h + 15, 4)
    return (t["documents"].select(
        "doc_id", w.alias("width"), h.alias("height"),
        npx.alias("n_patches_x"), npy.alias("n_patches_y"),
        (npx * npy).alias("n_patches"),
        (npx * npy + 1).alias("seq_len_with_cls"),
        (npx * 16 - w).alias("pad_x"),
        (npy * 16 - h).alias("pad_y"),
        (((npy - 1) * 16 * w + (npx - 1) * 16) * 3)
        .alias("last_patch_byte_offset"))
        .orderBy("doc_id"))


_AR_BUCKETS = """CASE
  WHEN 8 * w < 3 * h THEN '1:4'
  WHEN 8 * w < 5 * h THEN '1:2'
  WHEN 8 * w < 7 * h THEN '3:4'
  WHEN 6 * w < 7 * h THEN '1:1'
  WHEN 3 * w < 5 * h THEN '4:3'
  WHEN w < 3 * h THEN '2:1'
  ELSE '4:1' END"""

_AR_TARGET_A = ("CASE bucket WHEN '1:4' THEN 1 WHEN '1:2' THEN 1 "
                "WHEN '3:4' THEN 3 WHEN '1:1' THEN 1 WHEN '4:3' THEN 4 "
                "WHEN '2:1' THEN 2 ELSE 4 END")
_AR_TARGET_B = ("CASE bucket WHEN '1:4' THEN 4 WHEN '1:2' THEN 2 "
                "WHEN '3:4' THEN 4 WHEN '1:1' THEN 1 WHEN '4:3' THEN 3 "
                "WHEN '2:1' THEN 1 ELSE 1 END")

_AR_KEPT = """CASE
  WHEN w * b > h * a THEN ((h * a) {div} b) * h
  WHEN w * b < h * a THEN w * ((w * b) {div} a)
  ELSE w * h END"""


@query("multimodal_aspect_bucketing", oracle=f"""
WITH img AS (
  SELECT doc_id,
    CAST(doc_id % 1920 + 1 AS BIGINT) AS w,
    CAST(doc_id % 1080 + 1 AS BIGINT) AS h
  FROM documents),
bkt AS (
  SELECT doc_id, w, h, {_AR_BUCKETS} AS bucket FROM img),
tgt AS (
  SELECT doc_id, w, h, bucket,
    CAST({_AR_TARGET_A} AS BIGINT) AS a,
    CAST({_AR_TARGET_B} AS BIGINT) AS b
  FROM bkt),
k AS (
  SELECT bucket, w, h,
    {_AR_KEPT.format(div='//')} AS kept_bucket,
    least(w, h) * least(w, h) AS kept_square
  FROM tgt),
s AS (
  SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_images,
    CAST(SUM(w * h) AS BIGINT) AS total_pixels,
    CAST(SUM(kept_square) AS BIGINT) AS kept_square,
    CAST(SUM(kept_bucket) AS BIGINT) AS kept_bucket
  FROM k GROUP BY bucket),
tot AS (SELECT CAST(SUM(n_images) AS BIGINT) AS n FROM s)
SELECT bucket, n_images,
  CAST(floor((CAST(n_images AS DOUBLE) / n) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE) AS share,
  total_pixels,
  CAST(floor((1.0 - CAST(kept_square AS DOUBLE) / total_pixels) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE)
    AS square_crop_loss,
  CAST(floor((1.0 - CAST(kept_bucket AS DOUBLE) / total_pixels) * 1000000000.0 + 0.5) AS BIGINT) / CAST(1000000000.0 AS DOUBLE)
    AS bucket_crop_loss
FROM s CROSS JOIN tot ORDER BY bucket""")
def multimodal_aspect_bucketing(spark: SparkSession,
                                sf_dir: str) -> DataFrame:
    """Aspect-ratio bucketing census (the SDXL/NovelAI batching trick):
    assign each image to the nearest of 7 canonical aspect buckets
    (1:4 … 4:1, band edges as EXACT cross-multiplied integer
    comparisons — no float ratio ever exists) and measure, per bucket,
    the pixel loss of cropping to the bucket's ratio versus the naive
    square center-crop.  bucket_crop_loss << square_crop_loss is the
    measured justification for ratio-bucketed batching in a multimodal
    training pipeline; the share column sizes the per-bucket batch
    queues.  Width/height derive from doc_id exactly as
    multimodal_png_header_parse's convention.

    Determinism: kept-pixel counts use integer floor division on
    BIGINT (both engines floor on positive integers), sums are exact,
    one double division per output column.  Shape: pure map expressions
    + a 7-group aggregate + a 1-row share divisor — image METADATA
    only; payload bytes never leave the scan at 100 TB."""
    t = load_tables(spark, sf_dir, ("documents",))
    img = t["documents"].select(
        (F.col("doc_id") % 1920 + 1).cast("long").alias("w"),
        (F.col("doc_id") % 1080 + 1).cast("long").alias("h"))
    bkt = img.select("w", "h", F.expr(_AR_BUCKETS).alias("bucket"))
    tgt = bkt.select("w", "h", "bucket",
                     F.expr(_AR_TARGET_A).cast("long").alias("a"),
                     F.expr(_AR_TARGET_B).cast("long").alias("b"))
    k = tgt.select(
        "bucket", "w", "h",
        F.expr(_AR_KEPT.format(div="DIV")).alias("kept_bucket"),
        (F.least("w", "h") * F.least("w", "h")).alias("kept_square"))
    s = (k.groupBy("bucket")
         .agg(F.count("*").cast("long").alias("n_images"),
              F.sum(F.col("w") * F.col("h")).cast("long")
               .alias("total_pixels"),
              F.sum("kept_square").cast("long").alias("kept_square"),
              F.sum("kept_bucket").cast("long").alias("kept_bucket")))
    tot = s.agg(F.sum("n_images").cast("long").alias("n"))
    return (s.crossJoin(F.broadcast(tot))
            .select("bucket", "n_images",
                    exact.snap_double_col(F.col("n_images").cast("double") / F.col("n"), 9).alias("share"),
                    "total_pixels",
                    exact.snap_double_col(1.0 - F.col("kept_square").cast("double") / F.col("total_pixels"), 9)
                    .alias("square_crop_loss"),
                    exact.snap_double_col(1.0 - F.col("kept_bucket").cast("double") / F.col("total_pixels"), 9)
                    .alias("bucket_crop_loss"))
            .orderBy("bucket"))


@query("multimodal_vad_segments", oracle=f"""
WITH ch AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
    CAST(floor((list_sum([ord(substr(text, CAST(i * {CHUNK_SIZE} + j AS INT), 1)) for j in range(1, {CHUNK_SIZE + 1})]) / {CHUNK_SIZE}.0) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE) AS energy
  FROM (SELECT doc_id, text,
          unnest(range(strlen(text) // {CHUNK_SIZE})) AS i
        FROM documents WHERE doc_id < 100)),
thr AS (
  SELECT doc_id, CAST(floor((AVG(energy)) * 1000000.0 + 0.5) AS BIGINT) / CAST(1000000.0 AS DOUBLE) AS thr FROM ch GROUP BY doc_id),
v AS (
  SELECT ch.doc_id, chunk_idx,
    chunk_idx - row_number()
      OVER (PARTITION BY ch.doc_id ORDER BY chunk_idx) AS island
  FROM ch JOIN thr ON thr.doc_id = ch.doc_id
  WHERE energy > thr),
seg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS seg_len
  FROM v GROUP BY doc_id, island),
tot AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS total_chunks FROM ch
  GROUP BY doc_id)
SELECT tot.doc_id, total_chunks,
  CAST(coalesce(SUM(seg_len), 0) AS BIGINT) AS voiced_chunks,
  CAST(COUNT(seg_len) AS BIGINT) AS n_segments,
  CAST(coalesce(MAX(seg_len), 0) AS BIGINT) AS longest_segment
FROM tot LEFT JOIN seg ON seg.doc_id = tot.doc_id
GROUP BY tot.doc_id, total_chunks ORDER BY tot.doc_id""")
def multimodal_vad_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Voice-activity-detection segmentation over the audio-shaped
    chunk energies (multimodal_chunk_energy's Arrow kernel): chunks
    louder than the clip's own mean energy are "voiced", and maximal
    runs of voiced chunks — gaps-and-islands on chunk index — become
    speech segments.  Per clip: total/voiced chunk counts, segment
    count, and the longest segment, i.e. the pre-transcription split
    plan an audio pipeline feeds to its ASR stage (only voiced
    segments get transcribed; the split points bound per-task size).

    Adaptive threshold = the clip's OWN mean (rounded 6 dp on both
    sides, so the voiced set is bit-identical).  Shape: the
    mapInPandas energy kernel (sanctioned Arrow path) → doc-keyed mean
    → doc-partitioned islands window → two doc-keyed aggregates; every
    stage shares the doc_id shuffle key."""
    from results_ingestor_spark.operators.multimodal import chunk_energy
    t = load_tables(spark, sf_dir, ("documents",))
    ch = chunk_energy(t["documents"].where(F.col("doc_id") < 100))
    thr = ch.groupBy("doc_id").agg(exact.snap_double_col(F.avg("energy"), 6)
                                   .alias("thr"))
    w = Window.partitionBy("doc_id").orderBy("chunk_idx")
    v = (ch.join(thr, "doc_id")
         .where(F.col("energy") > F.col("thr"))
         .select("doc_id", "chunk_idx",
                 (F.col("chunk_idx") - F.row_number().over(w))
                 .alias("island")))
    seg = (v.groupBy("doc_id", "island")
           .agg(F.count("*").cast("long").alias("seg_len")))
    tot = ch.groupBy("doc_id").agg(F.count("*").cast("long")
                                   .alias("total_chunks"))
    return (tot.join(seg, "doc_id", "left")
            .groupBy("doc_id", "total_chunks")
            .agg(F.coalesce(F.sum("seg_len"), F.lit(0)).cast("long")
                 .alias("voiced_chunks"),
                 F.count("seg_len").cast("long").alias("n_segments"),
                 F.coalesce(F.max("seg_len"), F.lit(0)).cast("long")
                 .alias("longest_segment"))
            .orderBy("doc_id"))
