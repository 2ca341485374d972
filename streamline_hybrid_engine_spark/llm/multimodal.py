"""Multimodal-column plumbing — SURVEY §2.11.

Beyond-reference mandate: treat image/audio/video as opaque ``binary``
columns with typed metadata; decode / feature-extract as Arrow-batched
``mapInPandas``. ``decode_image_real`` is a REAL pure-Python decoder for
uncompressed 24bpp BMP (both row orders, oracle-value-checked end to end by
``mm_decode_bmp_stats``); compressed codecs (PNG/JPEG/...) raise ValueError
with instructions to wire an image library into the same hook on a cluster
image. ``mm_decode_meta`` additionally keeps a deterministic fake decode so
the generic plumbing (schema, binary columns, mapInPandas batch shape,
partition behavior) stays testable independent of any codec.

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


def encode_bmp(pixels: list, top_down: bool = False) -> bytes:
    """Pure-Python BMP writer (24bpp BI_RGB, 54-byte header). ``pixels``
    is top-down row-major [[(r,g,b), ...], ...]; rows pad to 4-byte
    multiples. ``top_down=True`` writes a negative-height BMP (rows in
    file order); otherwise the standard bottom-up layout."""
    import struct

    h, w = len(pixels), len(pixels[0])
    row_size = (w * 3 + 3) // 4 * 4
    file_size = 54 + h * row_size
    out = [
        struct.pack("<2sIHHI", b"BM", file_size, 0, 0, 54),
        struct.pack(
            "<IiiHHIIiiII", 40, w, h if not top_down else -h, 1, 24,
            0, h * row_size, 2835, 2835, 0, 0,
        ),
    ]
    rows = pixels if top_down else pixels[::-1]
    pad = b"\x00" * (row_size - w * 3)
    for row in rows:
        out.append(bytes(c for (r, g, b) in row for c in (b, g, r)) + pad)
    return b"".join(out)


def decode_image_real(payload: bytes) -> tuple[int, int, list]:
    """Real image decoder — pure-Python BMP (24bpp uncompressed BI_RGB,
    both bottom-up and negative-height top-down layouts). Returns
    (width, height, pixels) with pixels top-down row-major [(r,g,b)...]
    rows — i.e. BGR byte order and bottom-up row order are normalized
    away here, which is exactly what mm_decode_bmp_stats's
    position-weighted checksum verifies. Compressed or non-24bpp
    payloads (PNG/JPEG/RLE/paletted BMP) raise ValueError — those
    codecs need an image library this container doesn't ship; wire
    Pillow into this same hook on a cluster image."""
    import struct

    if len(payload) < 54 or payload[:2] != b"BM":
        raise ValueError("not a BMP payload (compressed formats need Pillow)")
    (pix_off,) = struct.unpack_from("<I", payload, 10)
    hdr_size, w, h_signed = struct.unpack_from("<Iii", payload, 14)
    planes, bpp, compression = struct.unpack_from("<HHI", payload, 26)
    if hdr_size < 40 or planes != 1:
        raise ValueError("unsupported BMP header")
    if bpp != 24 or compression != 0:
        raise ValueError(
            "only 24bpp BI_RGB decodes in pure Python; compressed/paletted "
            "BMP needs an image library (wire Pillow here on a cluster image)"
        )
    top_down = h_signed < 0
    h = -h_signed if top_down else h_signed
    if w <= 0 or h == 0:
        # w<=0 would make row_size negative and sneak past the truncation
        # check below (its RHS shrinks) to return (w, h, []) — malformed
        # dimensions must fail loudly like every other malformed input
        raise ValueError("invalid BMP dimensions")
    row_size = (w * 3 + 3) // 4 * 4
    if len(payload) < pix_off + h * row_size:
        raise ValueError("truncated BMP pixel array")
    rows = []
    for y in range(h):
        base = pix_off + y * row_size
        rows.append(
            [
                (payload[base + 3 * x + 2], payload[base + 3 * x + 1],
                 payload[base + 3 * x])
                for x in range(w)
            ]
        )
    return w, h, rows if top_down else rows[::-1]


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


def _bmp_fixture_pixels(doc_id: int) -> tuple[list, bool]:
    """Deterministic per-doc test image: (doc_id%4+1) × (doc_id%3+1) px
    (every 24bpp row-padding case 0..3 bytes), channel values affine in
    (doc_id, x, y), odd doc_ids written top-down (negative height)."""
    w, h = doc_id % 4 + 1, doc_id % 3 + 1
    pixels = [
        [
            (
                (doc_id * 7 + 13 * x + 31 * y) % 256,
                (doc_id * 11 + 17 * x + 5 * y) % 256,
                (doc_id * 3 + 29 * x + 23 * y) % 256,
            )
            for x in range(w)
        ]
        for y in range(h)
    ]
    return pixels, doc_id % 2 == 1


def bmp_stats_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: per doc, ENCODE a real BMP file (pure struct
    packing), run it through the REAL decoder, and reduce the decoded
    pixel grid to exact-integer stats. Everything downstream of the
    encode sees only genuine BMP bytes — a decode bug (BGR order, row
    padding, bottom-up flip, header offsets) shifts the stats and fails
    the oracle."""
    for pdf in batches:
        rows = {k: [] for k in (
            "doc_id", "n_bytes", "width", "height",
            "sum_r", "sum_g", "sum_b", "wchk",
        )}
        for doc_id in pdf["doc_id"]:
            doc_id = int(doc_id)
            pixels, top_down = _bmp_fixture_pixels(doc_id)
            payload = encode_bmp(pixels, top_down=top_down)
            w, h, px = decode_image_real(payload)
            rows["doc_id"].append(doc_id)
            rows["n_bytes"].append(len(payload))
            rows["width"].append(w)
            rows["height"].append(h)
            rows["sum_r"].append(sum(p[0] for r in px for p in r))
            rows["sum_g"].append(sum(p[1] for r in px for p in r))
            rows["sum_b"].append(sum(p[2] for r in px for p in r))
            # position-weighted checksum over the DECODED top-down grid:
            # permutation-sensitive, so a row-order or channel-order
            # decode bug cannot cancel out the way plain sums would
            rows["wchk"].append(
                sum(
                    (y * w + x + 1)
                    * (px[y][x][0] * 65536 + px[y][x][1] * 256 + px[y][x][2])
                    for y in range(h)
                    for x in range(w)
                )
            )
        yield pd.DataFrame(rows).astype(
            {
                "doc_id": "int64", "n_bytes": "int32", "width": "int32",
                "height": "int32", "sum_r": "int64", "sum_g": "int64",
                "sum_b": "int64", "wchk": "int64",
            }
        )


@query(
    "mm_decode_bmp_stats",
    oracle="""
    WITH px AS (
      SELECT d.doc_id,
             CAST(d.doc_id % 4 + 1 AS BIGINT) AS w,
             CAST(d.doc_id % 3 + 1 AS BIGINT) AS h,
             x.x, y.y,
             (d.doc_id * 7 + 13 * x.x + 31 * y.y) % 256 AS r,
             (d.doc_id * 11 + 17 * x.x + 5 * y.y) % 256 AS g,
             (d.doc_id * 3 + 29 * x.x + 23 * y.y) % 256 AS b
      FROM documents d,
           LATERAL (SELECT unnest(range(0, d.doc_id % 4 + 1)) AS x) x,
           LATERAL (SELECT unnest(range(0, d.doc_id % 3 + 1)) AS y) y
    )
    SELECT doc_id,
           CAST(54 + h * ((w * 3 + 3) // 4 * 4) AS INT) AS n_bytes,
           CAST(w AS INT) AS width,
           CAST(h AS INT) AS height,
           CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g,
           CAST(sum(b) AS BIGINT) AS sum_b,
           CAST(sum((y * w + x + 1) * (r * 65536 + g * 256 + b)) AS BIGINT)
             AS wchk
    FROM px GROUP BY doc_id, w, h
    """,
    tags=("llm", "multimodal"),
)
def mm_decode_bmp_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """REAL image decode, end to end: per document a genuine 24bpp BMP
    file is written (pure-Python struct packing — tiny per-doc images
    covering all four row-padding widths and BOTH row orders: odd
    doc_ids negative-height top-down, even bottom-up), then parsed back
    by :func:`decode_image_real` — the tree's actual decoder, not a
    fake — inside one Arrow ``mapInPandas`` pass. Output is exact
    integer pixel stats of the DECODED grid; the oracle computes the
    same stats analytically from the pixel formula, so any header,
    padding, BGR, or row-flip mistake in the decoder is a value
    mismatch, not a silent pass. The position-weighted checksum makes
    the check permutation-sensitive (channel sums alone can't see a
    row-order bug).

    Scale: encode+decode ride the scan partitioning (mapInPandas, no
    shuffle, no collect); real corpora swap the synthetic encode for a
    parquet binary column and keep the identical kernel shape."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    return docs.mapInPandas(
        bmp_stats_batch,
        schema="doc_id long, n_bytes int, width int, height int,"
        " sum_r long, sum_g long, sum_b long, wchk long",
    )


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
