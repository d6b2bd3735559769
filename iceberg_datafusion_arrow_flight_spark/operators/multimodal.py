"""Multimodal column plumbing: opaque ``binary`` payloads + typed
metadata, processed by Arrow-batched Pandas UDFs (``mapInPandas``).

The decode step is STUBBED (this container has no image/audio/video
libraries): ``_try_real_decode`` gates on importability and raises
``NotImplementedError`` if a real decode is requested without the lib;
the default path is a deterministic fake decode (byte length + md5 +
metadata passthrough).  Everything around the stub — the binary schema,
the metadata struct, the mapInPandas batch shape, the partition-parallel
execution — is real and tested (SURVEY north-star requirement).

Scale: mapInPandas streams Arrow batches per partition; payload bytes
never pass through the driver.  At 100 TB keep payloads in object-store
refs + byte-ranges (the metadata struct has a ``uri`` slot for exactly
that) and decode behind a column-pruned projection so untouched payloads
are never read.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODED_SCHEMA = ("doc_id BIGINT, fmt STRING, width INT, height INT, "
                  "n_bytes BIGINT, checksum STRING")

FRAME_SCHEMA = "doc_id BIGINT, frame_idx INT, frame_checksum STRING"


def attach_payload(df: DataFrame, id_col: str = "doc_id",
                   text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: payload = utf8 bytes of the text,
    metadata struct (fmt, width, height, n_frames, uri) derived
    deterministically from the id.  On a real lakehouse this is how an
    image/video table looks: binary (or uri) + typed metadata."""
    did = F.col(id_col)
    return df.select(
        did,
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.when(did % 3 == 0, "png").when(did % 3 == 1, "jpeg")
            .otherwise("webp").alias("fmt"),
            (32 + (did % 8) * 16).cast("int").alias("width"),
            (32 + (did % 5) * 16).cast("int").alias("height"),
            (1 + did % 4).cast("int").alias("n_frames"),
            F.concat(F.lit("memory://doc/"), did.cast("string")).alias("uri"),
        ).alias("meta"))


def _try_real_decode(fmt: str):
    """Return a real decoder if the library exists; else None.  Raising
    path kept explicit so a cluster WITH the libs changes behavior only
    by opting in (decode_mode='real')."""
    try:
        import PIL.Image  # noqa: F401 — absent in this container
        return PIL.Image
    except ImportError:
        return None


def decode_payloads(df: DataFrame, decode_mode: str = "stub") -> DataFrame:
    """'Decode' each payload → (doc_id, fmt, width, height, n_bytes,
    checksum) via mapInPandas (Arrow batches, partition-parallel)."""
    if decode_mode == "real" and _try_real_decode("png") is None:
        raise NotImplementedError(
            "real image decode requires an image library not present in "
            "this environment; use decode_mode='stub'")

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "fmt": [m["fmt"] for m in pdf["meta"]],
                "width": [m["width"] for m in pdf["meta"]],
                "height": [m["height"] for m in pdf["meta"]],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "checksum": [hashlib.md5(bytes(p)).hexdigest()
                             for p in pdf["payload"]],
            })
            yield out

    return df.mapInPandas(decode, schema=DECODED_SCHEMA)


def sample_frames(df: DataFrame, every_nth: int = 2) -> DataFrame:
    """Frame sampling: emit every_nth 'frame' per payload (frame count
    from metadata; frame checksum = md5(payload || frame_idx)).  Shows
    the 1→N mapInPandas expansion shape a video pipeline needs."""

    def sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sums = [], [], []
            for did, payload, meta in zip(pdf["doc_id"], pdf["payload"], pdf["meta"]):
                for fi in range(0, int(meta["n_frames"]), every_nth):
                    ids.append(did)
                    idxs.append(fi)
                    sums.append(hashlib.md5(bytes(payload) + str(fi).encode())
                                .hexdigest())
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs,
                                "frame_checksum": sums})

    return df.mapInPandas(sample, schema=FRAME_SCHEMA)


RESIZED_SCHEMA = ("doc_id BIGINT, fmt STRING, out_width INT, out_height INT, "
                  "scale_x DOUBLE, scale_y DOUBLE, resized_checksum STRING")

FEATURE_SCHEMA = "doc_id BIGINT, feature ARRAY<DOUBLE>"


def resize_payloads(df: DataFrame, out_width: int = 64,
                    out_height: int = 64) -> DataFrame:
    """'Resize' each payload to (out_width, out_height) via mapInPandas.

    STUB geometry path (no image libs in this container): computes the
    real scale factors from metadata and a deterministic checksum of
    (payload, target size) standing in for resized bytes.  A cluster
    with Pillow swaps the checksum line for `img.resize(...)` — the
    Spark-side shape (schema, batching, partition parallelism, column
    pruning of untouched payloads) is identical and tested."""

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"],
                "fmt": [m["fmt"] for m in pdf["meta"]],
                "out_width": out_width,
                "out_height": out_height,
                "scale_x": [out_width / m["width"] for m in pdf["meta"]],
                "scale_y": [out_height / m["height"] for m in pdf["meta"]],
                "resized_checksum": [
                    hashlib.md5(bytes(p) + f"{out_width}x{out_height}"
                                .encode()).hexdigest()
                    for p in pdf["payload"]],
            })

    return df.mapInPandas(resize, schema=RESIZED_SCHEMA)


def extract_features(df: DataFrame, dim: int = 16) -> DataFrame:
    """Feature extraction: payload → fixed-dim float vector via
    mapInPandas.  STUB featurizer = byte-histogram folded to ``dim``
    buckets, L1-normalized — deterministic, library-free, and shaped
    exactly like a real embedding UDF (binary in, ARRAY<DOUBLE> out,
    Arrow-batched).  Swap the body for an ONNX/torch call on a GPU
    cluster; the plan does not change."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for p in pdf["payload"]:
                buf = bytes(p)
                hist = [0.0] * dim
                for b in buf:
                    hist[b % dim] += 1.0
                total = sum(hist) or 1.0
                feats.append([v / total for v in hist])
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "feature": feats})

    return df.mapInPandas(featurize, schema=FEATURE_SCHEMA)
