"""Multimodal column plumbing (north-star M3).

Images/audio/video ride through the engine as opaque ``binary`` columns
with typed metadata; decode / feature-extract / frame-sample run as
Arrow-batched ``mapInPandas`` stages.  The decode kernels themselves are
STUBBED (no image/audio libraries in this container — see
``fake_decode_features``, clearly deterministic), but everything Spark
cares about is real and tested: the binary schema, the batch iterator
signature, the output schema contract, and the partition-parallel
execution shape.

At 100 TB: mapInPandas streams Arrow batches through Python with
``spark.sql.execution.arrow.maxRecordsPerBatch`` controlling batch
memory; binary payloads never pass through the driver, and the
per-partition iterator lets a real decoder hold codec state across a
whole batch instead of per row.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = ("doc_id long, n_bytes long, content_md5 string, "
                  "fake_feature double")
FRAME_SCHEMA = "doc_id long, frame_idx int, frame_md5 string"
FRAME_STRIDE = 100  # one sampled "frame" per 100 payload bytes


def with_binary_payload(df: DataFrame, source_col: str = "text",
                        payload_col: str = "payload") -> DataFrame:
    """Materialize an opaque binary column (UTF-8 bytes of the source —
    stand-in for image/audio bytes read from object storage)."""
    return df.withColumn(payload_col, F.encode(F.col(source_col), "UTF-8"))


def fake_decode_features(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: 'decode' each payload and emit features.

    A real deployment would decode image bytes here (PIL/libvips/ffmpeg);
    those libs are absent, so the feature is a deterministic function of
    the bytes (md5 + length) — which also makes the stage oracle-checkable.
    """
    for pdf in batches:
        payload = pdf["payload"]
        yield pd.DataFrame({
            "doc_id": pdf["doc_id"],
            "n_bytes": payload.map(len).astype("int64"),
            "content_md5": payload.map(lambda b: hashlib.md5(b).hexdigest()),
            "fake_feature": payload.map(lambda b: (len(b) % 251) / 251.0),
        })


def fake_frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel with fan-out: sample one 'frame' per
    FRAME_STRIDE bytes (the shape of video frame extraction — N output
    rows per input row, batch-local)."""
    for pdf in batches:
        ids, idxs, hashes = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for i in range(len(payload) // FRAME_STRIDE):
                ids.append(doc_id)
                idxs.append(i)
                chunk = payload[i * FRAME_STRIDE:(i + 1) * FRAME_STRIDE]
                hashes.append(hashlib.md5(chunk).hexdigest())
        yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                            "frame_idx": pd.Series(idxs, dtype="int32"),
                            "frame_md5": pd.Series(hashes, dtype="object")})


def decode_features(df: DataFrame) -> DataFrame:
    """documents → per-doc features through the binary + Arrow path."""
    from results_ingestor_spark.sources.tables import ensure_min_parallelism
    return (with_binary_payload(ensure_min_parallelism(df))
            .select("doc_id", "payload")
            .mapInPandas(fake_decode_features, FEATURE_SCHEMA))


def sample_frames(df: DataFrame) -> DataFrame:
    """documents → sampled frame rows through the binary + Arrow path."""
    from results_ingestor_spark.sources.tables import ensure_min_parallelism
    return (with_binary_payload(ensure_min_parallelism(df))
            .select("doc_id", "payload")
            .mapInPandas(fake_frame_sample, FRAME_SCHEMA))


CHUNK_SCHEMA = "doc_id long, chunk_idx int, energy double"
CHUNK_SIZE = 200  # bytes per "audio window"


def fake_chunk_energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel, audio shape: mean byte value per fixed-size
    chunk — the waveform-energy-per-window computation a real pipeline
    runs after PCM decode.  Deterministic over the bytes, so
    oracle-checkable; only complete chunks are emitted (a real windowing
    stage drops the tail or pads — dropping is the deterministic choice).
    """
    for pdf in batches:
        ids, idxs, energies = [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            for i in range(len(payload) // CHUNK_SIZE):
                chunk = payload[i * CHUNK_SIZE:(i + 1) * CHUNK_SIZE]
                ids.append(doc_id)
                idxs.append(i)
                energies.append(round(sum(chunk) / float(CHUNK_SIZE), 6))
        yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                            "chunk_idx": pd.Series(idxs, dtype="int32"),
                            "energy": pd.Series(energies, dtype="float64")})


def chunk_energy(df: DataFrame) -> DataFrame:
    """documents → per-chunk energy through the binary + Arrow path."""
    from results_ingestor_spark.sources.tables import ensure_min_parallelism
    return (with_binary_payload(ensure_min_parallelism(df))
            .select("doc_id", "payload")
            .mapInPandas(fake_chunk_energy, CHUNK_SCHEMA))


RESIZE_SCHEMA = ("doc_id long, orig_bytes long, resized_bytes long, "
                 "resized_md5 string")
RESIZE_FACTOR = 4  # keep every 4th byte (1-D nearest-neighbor)


def fake_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel, image-resize shape: nearest-neighbor
    downsample of the payload by RESIZE_FACTOR (a real kernel would
    decode and PIL.resize; the byte-stride stand-in keeps the batch
    plumbing, output schema, and size accounting real AND deterministic,
    so the whole Python path is oracle-checkable)."""
    for pdf in batches:
        out_ids, n_in, n_out, digests = [], [], [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            resized = payload[::RESIZE_FACTOR]
            out_ids.append(doc_id)
            n_in.append(len(payload))
            n_out.append(len(resized))
            digests.append(hashlib.md5(resized).hexdigest())
        yield pd.DataFrame({"doc_id": pd.Series(out_ids, dtype="int64"),
                            "orig_bytes": pd.Series(n_in, dtype="int64"),
                            "resized_bytes": pd.Series(n_out, dtype="int64"),
                            "resized_md5": pd.Series(digests, dtype="object")})


def resize_payloads(df: DataFrame) -> DataFrame:
    """documents → resize accounting through the binary + Arrow path."""
    from results_ingestor_spark.sources.tables import ensure_min_parallelism
    return (with_binary_payload(ensure_min_parallelism(df))
            .select("doc_id", "payload")
            .mapInPandas(fake_resize, RESIZE_SCHEMA))


# ---- structured binary parsing (no Python, no stub) -----------------

PNG_SIG_HEX = "89504e470d0a1a0a"          # 8-byte PNG signature
_IHDR_PREFIX_HEX = "0000000d49484452"     # IHDR length (13) + chunk type


def with_png_payload(df: DataFrame, width: F.Column, height: F.Column,
                     source_col: str = "text",
                     payload_col: str = "payload") -> DataFrame:
    """Prepend a REAL PNG signature + IHDR chunk (big-endian dimensions,
    bit depth 8, color type 6) to the source bytes — a structurally
    faithful image header, built entirely with JVM expressions."""
    header_hex = F.concat(
        F.lit(PNG_SIG_HEX + _IHDR_PREFIX_HEX),
        F.lpad(F.hex(width), 8, "0"),
        F.lpad(F.hex(height), 8, "0"),
        F.lit("0806000000"))  # depth, color, compression, filter, interlace
    payload = F.concat(F.to_binary(header_hex, F.lit("hex")),
                       F.encode(F.col(source_col), "UTF-8"))
    return df.withColumn(payload_col, payload)


def parse_png_header(df: DataFrame,
                     payload_col: str = "payload") -> DataFrame:
    """Parse width/height/bit-depth back OUT of the binary payload —
    byte-slicing + hex + base conversion, all inside whole-stage codegen
    (the metadata-extraction pass a media pipeline runs before routing
    payloads to decoders; at 100 TB this is a map-only stage that never
    touches Python)."""
    p = F.col(payload_col)

    def be_int(start: int, nbytes: int) -> F.Column:
        return F.conv(F.hex(F.substring(p, start, nbytes)), 16, 10) \
                .cast("long")

    return df.select(
        "doc_id",
        (F.lower(F.hex(F.substring(p, 1, 8))) == PNG_SIG_HEX).alias("is_png"),
        be_int(17, 4).alias("width"),
        be_int(21, 4).alias("height"),
        be_int(25, 1).alias("bit_depth"),
        (F.length(p) - 29).cast("long").alias("n_content_bytes"))


PHASH_SCHEMA = "doc_id long, phash long"
_PHASH_SIDE = 32  # 'image' side length the payload is shaped into
_PHASH_LOW = 8    # low-frequency block kept from the DCT


_PHASH_BASIS_SCALE = 1 << 20  # DCT basis quantization (≈6 dp)


def phash_basis_q():
    """The first _PHASH_LOW rows of the orthonormal DCT-II basis
    (scipy.fft.dct(norm='ortho') equivalent), QUANTIZED to integers at
    2^20 scale.  Only these rows are needed: the kept low block is
    b[:8] @ img @ b[:8].T.  Quantizing makes the whole pHash pipeline
    exact int64 arithmetic — bit-identical in any engine — instead of
    float matmuls whose summation-order noise could flip a
    near-median bit and change the hash cross-engine.  Magnitudes:
    |b_q| < 2^18, so Σ_32 b·byte < 2^31 and Σ_32 b·t < 2^54 — no
    overflow.  The same literals are inlined into the DuckDB oracle
    (plans/multimodal_q.py::_phash_oracle)."""
    import numpy as np
    n = _PHASH_SIDE
    k = np.arange(n)[:, None]
    basis = np.cos(np.pi * (2 * np.arange(n)[None, :] + 1) * k / (2 * n))
    basis *= np.sqrt(2.0 / n)
    basis[0] *= np.sqrt(0.5)
    return np.round(basis[:_PHASH_LOW] * _PHASH_BASIS_SCALE).astype(np.int64)


def fake_phash(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: 64-bit perceptual hash (pHash) per payload.

    Real deployment: decode the image, resize to 32x32 grayscale, 2-D
    DCT, keep the 8x8 low-frequency block, threshold at its median.
    Here the 'grayscale image' is the payload bytes tiled/truncated to
    32x32 (deterministic stand-in for the absent decoder); the DCT →
    low-block → median-threshold pipeline is the real algorithm, run
    over the QUANTIZED integer basis (``phash_basis_q``) so every
    product and sum is exact int64 and the hash is engine-portable —
    value-checked against an unrolled-SQL DuckDB twin since round 5.
    The median threshold compares 2·coef against the sum of the two
    middle order statistics (median×2) to stay in integers.
    Identical payloads hash identically; near-identical 'images' differ
    in few bits — Hamming distance is the similarity metric.
    """
    import numpy as np
    n = _PHASH_SIDE
    bq = phash_basis_q()
    for pdf in batches:
        ids, hashes = [], []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = np.frombuffer(payload, dtype=np.uint8)
            if len(raw) == 0:  # empty payload → all-zero image (the
                raw = np.zeros(1, dtype=np.uint8)  # oracle tiles 0s too)
            need = n * n
            reps = -(-need // len(raw))
            img = np.tile(raw, reps)[:need].astype(np.int64).reshape(n, n)
            low = (bq @ img @ bq.T).ravel()
            s = np.sort(low)
            med2 = s[_PHASH_LOW * _PHASH_LOW // 2 - 1] \
                + s[_PHASH_LOW * _PHASH_LOW // 2]
            bits = 2 * low > med2
            h = np.uint64(0)
            for b in bits:
                h = (h << np.uint64(1)) | np.uint64(bool(b))
            ids.append(doc_id)
            hashes.append(np.int64(h.astype(np.int64)))
        yield pd.DataFrame({"doc_id": pd.Series(ids, dtype="int64"),
                            "phash": pd.Series(hashes, dtype="int64")})


def perceptual_hashes(df: DataFrame) -> DataFrame:
    """doc frame → (doc_id, 64-bit phash), Arrow-batched."""
    from results_ingestor_spark.sources.tables import ensure_min_parallelism
    return (ensure_min_parallelism(with_binary_payload(df))
            .select("doc_id", "payload")
            .mapInPandas(fake_phash, PHASH_SCHEMA))


def phash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 3,
                         ) -> DataFrame:
    """Banded Hamming near-dup over 64-bit perceptual hashes.

    The hash splits into 4 x 16-bit bands; a pair is a candidate iff it
    collides on at least one band.  By pigeonhole, any pair with
    Hamming distance <= 3 has a clean band, so at this threshold the
    banded candidate set is COMPLETE — the result provably equals the
    all-pairs scan (pinned against brute force in tests) while the
    shuffle carries only (band_idx, 16-bit key, id).  The verify step
    is bit_count(xor) — exact, JVM-side.
    """
    bands = F.array(*[
        F.shiftright(F.col("phash"), 16 * b).bitwiseAND(F.lit(0xFFFF))
        for b in range(4)])
    keyed = hashes.select("doc_id", "phash",
                          F.posexplode(bands).alias("bidx", "bkey"))
    left = keyed.alias("l")
    right = keyed.alias("r")
    ham = F.bit_count(F.col("l.phash").bitwiseXOR(F.col("r.phash")))
    return (left.join(right,
                      (F.col("l.bidx") == F.col("r.bidx"))
                      & (F.col("l.bkey") == F.col("r.bkey"))
                      & (F.col("l.doc_id") < F.col("r.doc_id")))
            .select(F.col("l.doc_id").alias("id_a"),
                    F.col("r.doc_id").alias("id_b"),
                    ham.alias("hamming"))
            .distinct()
            .withColumn("is_near_dup", F.col("hamming") <= max_hamming))
