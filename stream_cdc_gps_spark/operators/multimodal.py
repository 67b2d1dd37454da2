"""Multimodal column convention + decode/feature plumbing (SURVEY.md §2B).

Convention: media payloads are opaque ``binary`` columns travelling beside a
typed metadata struct (modality, mime, width/height/duration, source uri).
All Spark-side plumbing — schema, partition sizing, Arrow batch shape through
``mapInPandas`` — is real and tested; only the codec call itself is stubbed
(image/audio libraries are not in this environment) behind
``decode_stub_features``, a deterministic fake with the exact signature a real
decoder plugs into.

Scale notes: binary payloads make rows wide, so the pipeline (a) never
shuffles the blob — feature extraction is a map-only ``mapInPandas`` stage
reading the scan directly; (b) keeps Arrow batches bounded via
``spark.sql.execution.arrow.maxRecordsPerBatch`` rather than row counts, so a
4 MB image and a 4 KB thumbnail batch to similar memory; (c) drops the blob
column (projection) the moment features are extracted.

The corpus has no real media, so payloads are synthesized deterministically
from the documents table (utf-8 text bytes as the "blob") — which also makes
every query DuckDB-checkable at the byte level.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from stream_cdc_gps_spark.operators.common import t
from stream_cdc_gps_spark.registry import query

MEDIA_SCHEMA = (
    "doc_id bigint, payload binary, "
    "meta struct<modality:string, mime:string, n_bytes:bigint, uri:string>"
)


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents -> multimodal convention table (binary payload + metadata).

    Deterministic: payload = utf-8 bytes of text, so every downstream feature
    has a closed-form oracle."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("text").alias("modality"),
            F.lit("text/plain").alias("mime"),
            F.length(F.encode("text", "utf-8")).cast("bigint").alias("n_bytes"),
            F.concat(F.lit("synthetic://docs/"), F.col("doc_id")).alias("uri"),
        ).alias("meta"),
    )


def decode_stub_features(payload: bytes) -> dict[str, float]:
    """STUB for the real codec (PIL / torchaudio / ffmpeg not installed).

    Deterministic fake features from raw bytes; a real decoder replaces this
    one function — the Spark plumbing (batching, schema, projection) is
    unchanged. Raises on None so missing payloads surface, mirroring a codec
    error."""
    if payload is None:
        raise NotImplementedError("no payload — real decoder would surface a codec error")
    n = len(payload)
    return {
        "byte_len": float(n),
        "byte_sum_mod": float(sum(payload) % 997),
        "first_byte": float(payload[0]) if n else -1.0,
    }


FEATURE_SCHEMA = (
    "doc_id bigint, modality string, byte_len double, byte_sum_mod double, "
    "first_byte double"
)


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads (mapInPandas).

    Map-only: no shuffle touches the blob; the output projects the payload
    away. Batch size is governed by Arrow's maxRecordsPerBatch so executor
    memory is bounded regardless of blob size."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_stub_features(p) for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "modality", [m["modality"] for m in pdf["meta"]])
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return media.mapInPandas(batches, schema=FEATURE_SCHEMA)


@query(
    "q80_media_metadata",
    oracle="""
SELECT doc_id,
       'text'                                   AS modality,
       'text/plain'                             AS mime,
       octet_length(encode(text))               AS n_bytes,
       'synthetic://docs/' || doc_id            AS uri
FROM documents
""",
)
def q80_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal convention: typed metadata beside an opaque binary payload
    (payload checked byte-exactly via its length; the struct is flattened
    because the oracle hash compares scalar columns)."""
    m = media_table(spark, sf_dir)
    return m.select(
        "doc_id",
        F.col("meta.modality").alias("modality"),
        F.col("meta.mime").alias("mime"),
        F.col("meta.n_bytes").alias("n_bytes"),
        F.col("meta.uri").alias("uri"),
    )


@query(
    "q81_media_features",
    # corpus text is pure ASCII (verified octet_length == length), so the
    # utf-8 byte sum equals the sum of ascii() codes per character. Empty
    # payloads are excluded on BOTH sides: the stub encodes len==0 as
    # first_byte=-1 while list_reduce over an empty list errors in DuckDB,
    # so the guard keeps the oracle total and latent-failure-free if the
    # corpus ever gains an empty text row (same guard as q82's n > 0).
    oracle="""
SELECT doc_id,
       'text' AS modality,
       CAST(length(text) AS DOUBLE) AS byte_len,
       CAST(list_reduce(list_transform(range(1, length(text) + 1),
                                       i -> ascii(substr(text, i, 1))),
                        (a, b) -> a + b) % 997 AS DOUBLE) AS byte_sum_mod,
       CAST(ascii(substr(text, 1, 1)) AS DOUBLE) AS first_byte
FROM documents
WHERE length(text) > 0
""",
)
def q81_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-batched (mapInPandas) feature extraction over binary payloads —
    the real multimodal plumbing with the codec call stubbed."""
    return (
        extract_features(media_table(spark, sf_dir))
        .filter(F.col("byte_len") > 0)
        .select("doc_id", "modality", "byte_len", "byte_sum_mod", "first_byte")
    )


def sample_frames_stub(
    payload: bytes, n_frames: int = 4, frame_bytes: int = 16
) -> list[tuple[int, int, bytes]]:
    """STUB for a real frame sampler (ffmpeg not installed): deterministic
    byte-slice "frames" at evenly spaced offsets, each "resized" by clamping
    to ``frame_bytes``. A real video decoder replaces only this function;
    the 1→N mapInPandas plumbing is unchanged. Raises on None like a codec
    error."""
    if payload is None:
        raise NotImplementedError("no payload — real decoder would surface a codec error")
    n = len(payload)
    if n == 0:
        return []
    stride = n // n_frames
    return [
        (i, i * stride, bytes(payload[i * stride : i * stride + frame_bytes]))
        for i in range(n_frames)
    ]


FRAME_SCHEMA = "doc_id bigint, frame_idx int, offset bigint, frame binary"


def sample_frames(media: DataFrame, n_frames: int = 4, frame_bytes: int = 16) -> DataFrame:
    """Frame sampling: each media row expands to ``n_frames`` frame rows —
    the one-to-many shape video/audio segmentation needs (vs the 1:1
    ``extract_features``). Map-only; the blob never shuffles; downstream
    projects frames, not payloads."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                for i, off, frame in sample_frames_stub(payload, n_frames, frame_bytes):
                    rows.append((doc_id, i, off, frame))
            yield pd.DataFrame(rows, columns=["doc_id", "frame_idx", "offset", "frame"])

    return media.mapInPandas(batches, schema=FRAME_SCHEMA)


@query(
    "q82_media_frames",
    # corpus text is ASCII (length == octet_length, see q81), so byte slices
    # of the utf-8 payload equal character slices of the text — md5s agree.
    oracle="""
WITH m AS (SELECT doc_id, text, length(text) AS n FROM documents),
f AS (SELECT doc_id, CAST(i AS INT) AS frame_idx,
             CAST(i * (n // 4) AS BIGINT) AS "offset",
             substr(text, CAST(1 + i * (n // 4) AS BIGINT), 16) AS frame
      FROM m, range(0, 4) r(i)
      WHERE n > 0)
SELECT doc_id, frame_idx, "offset",
       CAST(length(frame) AS BIGINT) AS frame_len,
       md5(frame) AS frame_md5
FROM f
""",
)
def q82_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling through mapInPandas (1→N expansion), frames checked
    byte-exactly via md5 against the oracle's closed-form slicing."""
    frames = sample_frames(media_table(spark, sf_dir))
    return frames.select(
        "doc_id",
        "frame_idx",
        "offset",
        F.length("frame").cast("bigint").alias("frame_len"),
        F.md5("frame").alias("frame_md5"),
    )


def resize_stub(payload: bytes, target: int = 32) -> bytes:
    """STUB for a real resizer (PIL.Image.resize / librosa.resample not
    installed): deterministic nearest-neighbor downsample of the byte
    stream to ``target`` samples — the 1-D analog of image resizing, with
    the exact signature a real resizer plugs into (payload in, smaller
    payload out). Payloads already at or below ``target`` pass through
    (the stub never upsamples). Raises on None like a codec error."""
    if payload is None:
        raise NotImplementedError("no payload — real resizer would surface a codec error")
    n = len(payload)
    if n <= target:
        return bytes(payload)
    return bytes(payload[(j * n) // target] for j in range(target))


RESIZED_SCHEMA = "doc_id bigint, orig_len bigint, resized binary"


def resize_media(media: DataFrame, target: int = 32) -> DataFrame:
    """Resize stage: map-only mapInPandas over the payload, projecting the
    original blob away immediately (the resized output is what travels
    downstream — at 100 TB this is the step that shrinks the dataset before
    any shuffle ever sees a blob)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].values,
                    "orig_len": [len(p) for p in pdf["payload"]],
                    "resized": [resize_stub(p) for p in pdf["payload"]],
                }
            )

    return media.mapInPandas(batches, schema=RESIZED_SCHEMA)


@query(
    "q102_media_resize",
    # ASCII corpus (see q81/q82): byte j of the utf-8 payload equals
    # character j+1 of the text, so the oracle gathers the same
    # nearest-neighbor sample positions with substr and md5s the result.
    oracle="""
WITH m AS (SELECT doc_id, text, length(text) AS n FROM documents),
r AS (
    SELECT doc_id, n,
           CASE WHEN n <= 32 THEN text
                ELSE array_to_string(
                    list_transform(range(0, 32),
                                   j -> substr(text, CAST(1 + (j * n) // 32 AS BIGINT), 1)),
                    '')
           END AS resized
    FROM m
)
SELECT doc_id,
       CAST(n AS BIGINT)                    AS orig_len,
       CAST(length(resized) AS BIGINT)      AS resized_len,
       md5(resized)                         AS resized_md5
FROM r
""",
)
def q102_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize through the multimodal plumbing (mapInPandas, codec stubbed):
    deterministic nearest-neighbor byte downsampling checked byte-exactly
    via md5 against the oracle's closed-form gather — completes the
    decode / feature-extract / resize / frame-sample verb set. Map-only;
    the original blob is projected away inside the stage."""
    resized = resize_media(media_table(spark, sf_dir))
    return resized.select(
        "doc_id",
        "orig_len",
        F.length("resized").cast("bigint").alias("resized_len"),
        F.md5("resized").alias("resized_md5"),
    )
