"""Multimodal-column plumbing — SURVEY §2.11.

Beyond-reference mandate: treat image/audio/video as opaque ``binary``
columns with typed metadata; decode / feature-extract as Arrow-batched
``mapInPandas``. The container has no image/audio libraries, so the decode
step is STUBBED (``decode_image_real`` raises NotImplementedError; the
pipeline runs a deterministic fake) — but the Spark-side plumbing is real
and oracle-tested: schema, binary column handling, mapInPandas batch shape,
and partition behavior are exactly what a real decoder would use.

Scale notes: binary payloads ride in parquet as-is (no Python until the
decode stage); ``mapInPandas`` streams Arrow batches so one task never
materializes more than ``spark.sql.execution.arrow.maxRecordsPerBatch``
rows of blobs.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from streamline_hybrid_engine_spark.catalog import load_table
from streamline_hybrid_engine_spark.registry import query

MM_SCHEMA = (
    "doc_id long, n_bytes int, width int, height int, n_frames int, checksum string"
)


def decode_image_real(payload: bytes) -> tuple[int, int]:
    """Real decoder hook — requires an image library not in this container."""
    raise NotImplementedError(
        "image decode requires e.g. Pillow; wire it here on a cluster image"
    )


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic fake 'decode': metadata derived from the byte length.

    Stands in for decode_image_real so the pipeline (and its oracle) is
    fully testable without media libraries.
    """
    n = len(payload)
    return (n % 640) + 16, (n % 480) + 16, (n % 30) + 1


def decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: (doc_id, payload: bytes) → typed metadata rows."""
    for pdf in batches:
        meta = [_fake_decode(p) for p in pdf["payload"]]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "n_bytes": [len(p) for p in pdf["payload"]],
                "width": [m[0] for m in meta],
                "height": [m[1] for m in meta],
                "n_frames": [m[2] for m in meta],
                "checksum": [
                    __import__("hashlib").md5(p).hexdigest() for p in pdf["payload"]
                ],
            }
        )


@query(
    "mm_decode_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS INT) AS n_bytes,
           CAST(octet_length(encode(text)) % 640 + 16 AS INT) AS width,
           CAST(octet_length(encode(text)) % 480 + 16 AS INT) AS height,
           CAST(octet_length(encode(text)) % 30 + 1 AS INT) AS n_frames,
           md5(text) AS checksum
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def mm_decode_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode pipeline, end to end.

    documents.text is re-encoded as the stand-in binary payload (the
    fixtures ship no real media), then decoded via the Arrow mapInPandas
    kernel. The oracle recomputes the deterministic fake in SQL — so the
    whole binary → Python-batch → typed-metadata path is value-checked,
    which is the part that carries over unchanged to a real decoder.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return docs.mapInPandas(decode_batch, schema=MM_SCHEMA)


@query(
    "mm_binary_meta",
    oracle="""
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
           CAST(max(octet_length(encode(text))) AS INT) AS max_bytes
    FROM documents GROUP BY source
    """,
    tags=("llm", "multimodal"),
)
def mm_binary_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed metadata over binary payloads without ever leaving the JVM:
    byte lengths aggregate per source (the cheap pre-decode audit pass)."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.encode("text", "UTF-8").alias("payload")
    )
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.octet_length("payload")).alias("total_bytes"),
        F.max(F.octet_length("payload")).cast("int").alias("max_bytes"),
    )


CHUNK = 256


@query(
    "mm_chunk_binary",
    oracle=f"""
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           CAST(length(substr(text, i * {CHUNK} + 1, {CHUNK})) AS INT) AS chunk_bytes,
           md5(substr(text, i * {CHUNK} + 1, {CHUNK})) AS chunk_md5
    FROM documents,
         LATERAL (SELECT unnest(range(0, CAST(ceil(length(text) / {CHUNK}.0) AS BIGINT))) AS i)
    """,
    tags=("llm", "multimodal", "chunk"),
)
def mm_chunk_binary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size chunking of a binary payload — the audio-window /
    video-segment plumbing step (chunk → per-chunk decode/feature UDF).

    Stays entirely JVM-side: sequence → explode → binary substring → md5;
    no Python per chunk. At 100 TB chunks inherit the scan's partitioning
    (explode is pipelined, no shuffle); a decoder then maps per-chunk via
    ``mapInPandas`` exactly like mm_decode_meta. The fixture payload is the
    UTF-8 text re-encode (ASCII — byte == char, so the oracle mirrors with
    string substr).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    n_chunks = F.ceil(F.length("payload") / float(CHUNK)).cast("int")
    return (
        docs.withColumn("chunk_idx", F.explode(F.sequence(F.lit(0), n_chunks - 1)))
        .withColumn(
            "chunk",
            F.expr(f"substring(payload, chunk_idx * {CHUNK} + 1, {CHUNK})"),
        )
        .select(
            "doc_id",
            F.col("chunk_idx").cast("int").alias("chunk_idx"),
            F.octet_length("chunk").alias("chunk_bytes"),
            F.md5("chunk").alias("chunk_md5"),
        )
    )


FRAME = 64   # bytes per fake "frame"
SAMPLE = 4   # keep every 4th frame


def frame_sample_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: sample every SAMPLE-th FRAME-byte slice of the
    payload — the shape of real video frame-sampling (decode replaced by a
    byte-slice; a real decoder drops into the same loop)."""
    import hashlib

    for pdf in batches:
        rows = {"doc_id": [], "frame_no": [], "frame_bytes": [], "frame_md5": []}
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            n_frames = (len(payload) + FRAME - 1) // FRAME
            for f in range(0, n_frames, SAMPLE):
                chunk = payload[f * FRAME : (f + 1) * FRAME]
                rows["doc_id"].append(doc_id)
                rows["frame_no"].append(f)
                rows["frame_bytes"].append(len(chunk))
                rows["frame_md5"].append(hashlib.md5(chunk).hexdigest())
        yield pd.DataFrame(rows)


@query(
    "mm_frame_sample",
    oracle=f"""
    SELECT doc_id,
           CAST(i AS INT) AS frame_no,
           CAST(length(substr(text, i * {FRAME} + 1, {FRAME})) AS INT) AS frame_bytes,
           md5(substr(text, i * {FRAME} + 1, {FRAME})) AS frame_md5
    FROM documents,
         LATERAL (SELECT unnest(range(0, CAST(ceil(length(text) / {FRAME}.0) AS BIGINT))) AS i)
    WHERE i % {SAMPLE} = 0
    """,
    tags=("llm", "multimodal", "frames"),
)
def mm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over a video-like binary column via ``mapInPandas``
    (every 4th 64-byte 'frame'): the Arrow-batched Python loop a real
    ffmpeg-style sampler plugs into — batch shape, schema and partitioning
    identical; only the slice→decode call changes. ASCII fixture payload →
    the oracle mirrors with string substr."""
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return docs.mapInPandas(
        frame_sample_batch,
        schema="doc_id long, frame_no int, frame_bytes int, frame_md5 string",
    )


@query(
    "mm_ahash_dedup",
    oracle="""
    WITH px AS (
      SELECT doc_id,
             list_transform(range(0, 64),
               i -> ascii(substr(text,
                      CAST(1 + i * greatest(length(text) // 64, 1) AS BIGINT), 1)))
               AS p
      FROM documents
    ),
    h AS (
      SELECT doc_id,
             array_to_string(list_transform(p,
               v -> CASE WHEN v > list_sum(p) // 64 THEN '1' ELSE '0' END), '')
               AS ahash
      FROM px
    )
    SELECT doc_id, ahash,
           CAST(count(*) OVER (PARTITION BY ahash) AS BIGINT) AS n_same_hash
    FROM h
    """,
    tags=("llm", "multimodal", "dedup"),
)
def mm_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual average-hash (aHash) over the multimodal payload — the
    image-dedup step of a multimodal pipeline: 64 evenly-spaced samples of
    the payload stand in for the 8×8 downscaled grayscale a real decoder
    would produce (same hash construction: bit i = sample_i > mean);
    payloads sharing an aHash are near-duplicate candidates.

    Entirely JVM-side (sequence → transform → ascii → integer mean) — the
    pixel source is the only piece a real image pipeline swaps (decode UDF
    feeding the same 64-sample reduction). Exact-hash grouping is the
    blocking step; a Hamming-distance verify within blocks is `bit_count`
    on the XOR of the two hashes — same verify-after-blocking economics as
    the text LSH family. Integer mean (`div 64`) keeps the threshold
    engine-exact.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    px = F.expr(
        "transform(sequence(0, 63), i -> "
        "ascii(substring(text, 1 + i * greatest(length(text) div 64, 1), 1)))"
    )
    with_px = docs.select("doc_id", px.alias("p"))
    mean = F.expr("aggregate(p, 0, (acc, v) -> acc + v) div 64")
    ahash = F.expr(
        "array_join(transform(p, v -> "
        "CASE WHEN v > _mean THEN '1' ELSE '0' END), '')"
    )
    hashed = with_px.withColumn("_mean", mean).select(
        "doc_id", ahash.alias("ahash")
    )
    from pyspark.sql import Window

    return hashed.select(
        "doc_id",
        "ahash",
        F.count("*").over(Window.partitionBy("ahash")).alias("n_same_hash"),
    )
