"""Multimodal (binary) column operators.

The engine treats images/audio/video as opaque ``BinaryType`` columns
with typed metadata structs (SURVEY.md §1.2 extension types). The
testdata has no real media, so the *content* here is bytes derived from
``documents.text`` — but the Spark-side plumbing is the real thing:

- binary columns + flat metadata projection (oracle-checked)
- a REAL decode path for all three modalities with no codec library:
  documents carry genuine binary containers synthesized JVM-side —
  P6 PPM images, RIFF/WAVE audio (8-bit PCM), and 4-frame
  concatenated-PPM "video" clips — and Arrow-batched ``mapInPandas``
  kernels implement the complete binary formats: PPM header parse +
  RGB reshape + average-pool thumbnails, a RIFF chunk walker with fmt
  validation, and a frame demuxer with strided sampling. All are
  hash-checked against SQL oracles that recompute the byte streams
  positionally. Formats that DO need a codec (JPEG/MP3/H.264) slot
  into the same kernels by swapping one decode body for PIL/ffmpeg.

At 100 TB: binary payloads dominate partition size — keep
``maxPartitionBytes`` low enough that a batch of decoded frames fits
executor memory, and always project metadata columns *without* the
payload when the payload isn't needed (column pruning does this for
free if the payload is a separate column, never inside a struct with
hot metadata).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from spark_stream_kudu_spark.functions.rounding import fround
from spark_stream_kudu_spark.registry import register
from spark_stream_kudu_spark.session import tune_session
from spark_stream_kudu_spark.sources.tables import load_table
from spark_stream_kudu_spark.functions.lineage import pin as _pin

FRAME_BYTES = 256  # fake "frame" granularity for sampling offsets


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    tune_session(spark)
    return load_table(spark, sf_dir, "documents")


def with_binary_payload(d: DataFrame) -> DataFrame:
    """Attach an opaque binary payload + metadata columns.

    In production the payload comes from the storage layer (parquet
    BinaryType / object-store refs); here it's utf-8 bytes of ``text``.
    """
    return d.select(
        "doc_id",
        F.encode(F.col("text"), "UTF-8").alias("payload"),
        F.lit("application/octet-stream").alias("content_type"),
        F.md5(F.col("text")).alias("checksum"),
    )


_META_ORACLE = f"""
SELECT doc_id,
       octet_length(encode(text))                                    AS byte_len,
       CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames,
       md5(text)                                                     AS checksum,
       'application/octet-stream'                                    AS content_type
FROM documents
"""


@register(
    "multimodal_meta",
    "multimodal",
    "Binary-column metadata projection: byte length, frame count at "
    f"{FRAME_BYTES}-byte granularity, content checksum — computed without ever "
    "shipping the payload to Python.",
    oracle=_META_ORACLE,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_binary_payload(_docs(spark, sf_dir))
    return d.select(
        "doc_id",
        F.octet_length("payload").cast("long").alias("byte_len"),
        # float-by-design: oracle computes ceil(len / 256.0) in double
        F.ceil(F.octet_length("payload") / F.lit(float(FRAME_BYTES)))
        .cast("long")
        .alias("n_frames"),
        "checksum",
        "content_type",
    )


# --------------------------------------------------------------------------
# REAL image decode: PPM (P6) container — header parse + numpy reshape.
#
# The sandbox has no PIL/ffmpeg, but the binary PPM format
# (netpbm's ppm(5): "P6\n<w> <h>\n255\n" + w*h*3 raw RGB bytes) needs
# no codec library. We synthesize a genuine P6 container per document
# with NATIVE Spark expressions (dims from the text's md5, pixels =
# text bytes tiled to w*h*3), then decode it with a real parser: magic
# check, whitespace-tokenized header, maxval validation,
# frombuffer+reshape to (h, w, 3). Swapping PPM for JPEG means swapping
# this one kernel body for PIL — every other part of the pipeline
# (payload column, Arrow batching, schema, per-channel outputs) is
# exactly what the JPEG path uses.
# --------------------------------------------------------------------------


def encode_ppm(d: DataFrame) -> DataFrame:
    """Attach a genuine P6 PPM binary payload per document.

    Dims derive from the text's md5 (4..11 px per side — kept small so
    the SQL oracle's per-pixel unnest stays cheap); pixel bytes are the
    document's ASCII bytes tiled to w*h*3. Built entirely with native
    expressions: the payload synthesis never leaves the JVM.
    """
    d = d.filter(
        # ASCII guard: the payload synthesis and both decoders equate
        # characters with bytes (UTF-8 encode, char-indexed oracle);
        # octet_length == length holds iff text is pure ASCII, so the
        # assumption is enforced, not implicit (same predicate in SQL).
        (F.length("text") > 0)
        & (F.octet_length("text") == F.length("text"))
    ).select(
        "doc_id",
        "text",
        (F.conv(F.substring(F.md5("text"), 1, 2), 16, 10).cast("long") % 8 + 4
         ).alias("width"),
        (F.conv(F.substring(F.md5("text"), 3, 2), 16, 10).cast("long") % 8 + 4
         ).alias("height"),
    )
    pixels = F.expr(
        "substr(repeat(text, cast(ceil(width * height * 3 / length(text)) as int)),"
        " 1, cast(width * height * 3 as int))"
    )
    header = F.concat_ws(
        "", F.lit("P6\n"), F.col("width"), F.lit(" "), F.col("height"),
        F.lit("\n255\n"),
    )
    return d.select(
        "doc_id",
        F.encode(F.concat(header, pixels), "UTF-8").alias("payload"),
    )


def decode_ppm(payload: bytes):
    """REAL P6 PPM decoder: parse the header, validate magic + maxval,
    reshape the raw RGB bytes to an (h, w, 3) uint8 array. No codec
    library — this is the complete binary-format implementation."""
    import numpy as np

    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM payload")
    idx, vals = 2, []
    while len(vals) < 3:  # width, height, maxval tokens
        while payload[idx : idx + 1].isspace():
            idx += 1
        start = idx
        while not payload[idx : idx + 1].isspace():
            idx += 1
        vals.append(int(payload[start:idx]))
    idx += 1  # exactly one whitespace byte separates maxval from pixels
    w, h, maxval = vals
    if maxval != 255:
        raise ValueError(f"unsupported maxval {maxval}")
    arr = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=idx)
    return w, h, arr.reshape(h, w, 3)


# Exact-integer outputs (per-channel byte sums), so the hash compare has
# no float surface at all. The oracle recomputes the tiled pixel stream
# positionally: byte j of the w*h*3 pixel area is ord(text[j mod n]),
# channel j mod 3.
_DECODE_ORACLE = """
WITH d AS (
  SELECT doc_id, text, length(text) AS n,
         4 + (CAST('0x' || substr(md5(text), 1, 2) AS BIGINT) % 8) AS width,
         4 + (CAST('0x' || substr(md5(text), 3, 2) AS BIGINT) % 8) AS height
  FROM documents
  WHERE length(text) > 0 AND octet_length(encode(text)) = length(text)
),
px AS (
  SELECT doc_id, width, height, n, text,
         unnest(generate_series(0, width * height * 3 - 1)) AS j
  FROM d
),
v AS (
  SELECT doc_id, width, height, j % 3 AS ch,
         ord(substr(text, CAST(j % n AS INT) + 1, 1)) AS b
  FROM px
)
SELECT doc_id,
       any_value(width)                                        AS width,
       any_value(height)                                       AS height,
       CAST(any_value(width) * any_value(height) AS BIGINT)    AS n_px,
       CAST(SUM(CASE WHEN ch = 0 THEN b ELSE 0 END) AS BIGINT) AS r_sum,
       CAST(SUM(CASE WHEN ch = 1 THEN b ELSE 0 END) AS BIGINT) AS g_sum,
       CAST(SUM(CASE WHEN ch = 2 THEN b ELSE 0 END) AS BIGINT) AS b_sum
FROM v GROUP BY doc_id
"""


@register(
    "multimodal_decode_ppm",
    "multimodal",
    "REAL image decode (stub retired): each document carries a genuine P6 "
    "PPM binary container (synthesized JVM-side — dims from md5, pixels = "
    "text bytes tiled); an Arrow-batched mapInPandas kernel parses the PPM "
    "header (magic, dims, maxval), reshapes the raw RGB bytes to (h, w, 3), "
    "and emits exact per-channel byte sums. The oracle recomputes the pixel "
    "stream positionally in SQL, so the decoder is hash-checked end-to-end. "
    "Row-local; swapping PPM for JPEG swaps one kernel body for PIL.",
    oracle=_DECODE_ORACLE,
)
def multimodal_decode_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    return ppm_decode_features(_docs(spark, sf_dir))


def ppm_decode_features(docs: DataFrame) -> DataFrame:
    """Attach PPM payloads to ``(doc_id, text)`` rows and decode them to
    exact per-channel feature rows — the shared kernel behind the batch
    query and its streaming ingest twin (identical math per row, so the
    two paths share one oracle)."""
    import numpy as np
    import pandas as pd

    d = encode_ppm(docs)

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {k: [] for k in
                   ("doc_id", "width", "height", "n_px", "r_sum", "g_sum", "b_sum")}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, arr = decode_ppm(bytes(payload))
                sums = arr.sum(axis=(0, 1), dtype=np.int64)
                out["doc_id"].append(doc_id)
                out["width"].append(w)
                out["height"].append(h)
                out["n_px"].append(w * h)
                out["r_sum"].append(int(sums[0]))
                out["g_sum"].append(int(sums[1]))
                out["b_sum"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        decode,
        schema="doc_id long, width long, height long, n_px long, "
               "r_sum long, g_sum long, b_sum long",
    )


def frame_offsets(d: DataFrame) -> DataFrame:
    """Frame-sampling plumbing: per-payload list of byte offsets, one per
    FRAME_BYTES window — the shape a video frame-sampler consumes."""
    # float-by-design: oracle computes ceil(len / 256.0) in double
    n = F.ceil(F.octet_length("payload") / F.lit(float(FRAME_BYTES))).cast("int")
    return d.select(
        "doc_id",
        F.transform(F.sequence(F.lit(0), n - 1), lambda i: i * FRAME_BYTES).alias(
            "offsets"
        ),
    )


# --------------------------------------------------------------------------
# Frame sampling (video-style strided access over binary payloads)
# --------------------------------------------------------------------------

FRAME_STRIDE = 4  # sample every 4th frame
MAX_FRAMES = 8  # cap per document (bounded output at any payload size)

# ASCII corpus => payload bytes == text chars, so substr+md5 give the
# oracle an exact twin of the byte-slice hashing.
_FRAME_ORACLE = f"""
WITH n AS (
  SELECT doc_id, text,
         CAST(ceil(octet_length(encode(text)) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames
  FROM documents
),
idx AS (
  SELECT doc_id, text, n_frames, unnest(generate_series(0, {MAX_FRAMES - 1})) AS k
  FROM n
),
sampled AS (
  SELECT doc_id, k AS frame_idx, (k * {FRAME_STRIDE}) * {FRAME_BYTES} AS byte_offset,
         substr(text, (k * {FRAME_STRIDE}) * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS frame
  FROM idx WHERE k * {FRAME_STRIDE} < n_frames
)
SELECT doc_id, frame_idx, byte_offset,
       length(frame) AS frame_len,
       md5(frame) AS frame_md5
FROM sampled
"""


@register(
    "multimodal_frame_sample",
    "multimodal",
    f"Frame sampling: every {FRAME_STRIDE}th {FRAME_BYTES}-byte frame (max "
    f"{MAX_FRAMES}) sliced from the binary payload in an Arrow-batched "
    "mapInPandas kernel — the strided-access shape a video frame-sampler "
    "uses (seek offsets, bounded frames per item); per-frame checksums are "
    "oracle-verified. A real decoder replaces the byte-slice with a codec "
    "seek at the same offsets.",
    oracle=_FRAME_ORACLE,
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    d = with_binary_payload(_docs(spark, sf_dir))

    def sample(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            out = {"doc_id": [], "frame_idx": [], "byte_offset": [], "frame_len": [], "frame_md5": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                payload = bytes(payload)
                n_frames = -(-len(payload) // FRAME_BYTES)  # ceil
                for k in range(MAX_FRAMES):
                    f = k * FRAME_STRIDE
                    if f >= n_frames:
                        break
                    off = f * FRAME_BYTES
                    frame = payload[off : off + FRAME_BYTES]
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["byte_offset"].append(off)
                    out["frame_len"].append(len(frame))
                    out["frame_md5"].append(hashlib.md5(frame).hexdigest())
            yield pd.DataFrame(out)

    return d.mapInPandas(
        sample,
        schema="doc_id long, frame_idx long, byte_offset long, frame_len long, frame_md5 string",
    )


# --------------------------------------------------------------------------
# REAL resize: 2x2 average-pool thumbnail over decoded PPM pixels
# --------------------------------------------------------------------------

POOL = 2  # thumbnail grid is POOL x POOL blocks per channel

_THUMB_CELLS = [
    f"c{by}{bx}_{ch}" for by in range(POOL) for bx in range(POOL)
    for ch in ("r", "g", "b")
]

# Block membership of pixel (x, y) in a w x h image: by = (y*POOL) div h,
# bx = (x*POOL) div w — the same integer partition the kernel applies, so
# the oracle reproduces the pooled sums exactly (no float surface).
_THUMB_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS n,
         4 + (CAST('0x' || substr(md5(text), 1, 2) AS BIGINT) % 8) AS width,
         4 + (CAST('0x' || substr(md5(text), 3, 2) AS BIGINT) % 8) AS height
  FROM documents
  WHERE length(text) > 0 AND octet_length(encode(text)) = length(text)
),
px AS (
  SELECT doc_id, width, height, n, text,
         unnest(generate_series(0, width * height * 3 - 1)) AS j
  FROM d
),
v AS (
  SELECT doc_id,
         ((j // 3) // width) * {POOL} // height AS by,
         ((j // 3) % width) * {POOL} // width   AS bx,
         j % 3 AS ch,
         ord(substr(text, CAST(j % n AS INT) + 1, 1)) AS b
  FROM px
)
SELECT doc_id,
       {", ".join(
           f"CAST(SUM(CASE WHEN by = {by} AND bx = {bx} AND ch = {ch} "
           f"THEN b ELSE 0 END) AS BIGINT) AS {cell}"
           for by in range(POOL) for bx in range(POOL)
           for ch, cell in enumerate(
               f"c{by}{bx}_{c}" for c in ("r", "g", "b"))
       )}
FROM v GROUP BY doc_id
"""


@register(
    "multimodal_thumbnail_ppm",
    "multimodal",
    f"REAL image resize (stub retired): decode the P6 PPM payload, then "
    f"average-pool the (h, w, 3) pixel array into a {POOL}x{POOL} block grid "
    "per channel — emitted as exact per-block byte sums so the SQL oracle "
    "(which re-derives every pixel's block from integer coordinates) "
    "hash-checks the pooling math bit-for-bit. Row-local, Arrow-batched, "
    "fixed-width output regardless of payload size — the property that "
    "bounds memory when payloads vary from KB thumbnails to GB video.",
    oracle=_THUMB_ORACLE,
)
def multimodal_thumbnail_ppm(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    d = encode_ppm(_docs(spark, sf_dir))

    def thumbnail(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            out: dict[str, list] = {"doc_id": []}
            for cell in _THUMB_CELLS:
                out[cell] = []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                w, h, arr = decode_ppm(bytes(payload))
                ys = (np.arange(h) * POOL) // h
                xs = (np.arange(w) * POOL) // w
                out["doc_id"].append(doc_id)
                i = 0
                for by in range(POOL):
                    rows = arr[ys == by]
                    for bx in range(POOL):
                        block = rows[:, xs == bx, :]
                        sums = block.sum(axis=(0, 1), dtype=np.int64)
                        for ch in range(3):
                            out[_THUMB_CELLS[i]].append(int(sums[ch]))
                            i += 1
            yield pd.DataFrame(out)

    schema = "doc_id long, " + ", ".join(f"{c} long" for c in _THUMB_CELLS)
    return d.mapInPandas(thumbnail, schema)


# --------------------------------------------------------------------------
# REAL audio decode: WAV (RIFF) container — chunk walk + PCM stats.
#
# Same pattern as the PPM image path, extended to the audio modality:
# documents carry genuine RIFF/WAVE containers (8-bit mono PCM,
# synthesized with native expressions — the little-endian header ints
# are built as hex strings and unhex'd JVM-side), and the Arrow kernel
# is a REAL RIFF chunk walker: validates the RIFF/WAVE magic, iterates
# word-aligned chunks, reads the fmt descriptor (PCM, channels, rate,
# bits), and extracts the data chunk's samples. Swapping WAV for MP3
# swaps this one kernel body for an ffmpeg call.
# --------------------------------------------------------------------------

_WAV_RATE = 8000


def _le_hex_sql(expr: str, nbytes: int) -> str:
    """SQL fragment: hex string of ``expr`` as an ``nbytes`` little-endian
    unsigned integer (the RIFF header int encoding)."""
    return " || ".join(
        f"lpad(hex(({expr}) div {256 ** i} % 256), 2, '0')"
        for i in range(nbytes)
    )


# Constant header middle: "WAVE" + "fmt " chunk (16-byte PCM descriptor:
# format=1, channels=1, rate/byte_rate=8000, block_align=1, bits=8) + "data".
_WAV_CONST_HEX = (
    b"WAVE"
    + b"fmt "
    + (16).to_bytes(4, "little")
    + (1).to_bytes(2, "little")
    + (1).to_bytes(2, "little")
    + _WAV_RATE.to_bytes(4, "little")
    + _WAV_RATE.to_bytes(4, "little")
    + (1).to_bytes(2, "little")
    + (8).to_bytes(2, "little")
    + b"data"
).hex()


def encode_wav(d: DataFrame) -> DataFrame:
    """Attach a genuine RIFF/WAVE binary payload per document: 8-bit
    mono PCM, sample count from the text's md5 (16..128 — keeps the
    SQL oracle's per-sample unnest cheap), samples = the document's
    ASCII bytes tiled. Built entirely with native expressions."""
    d = d.filter(
        # ASCII guard: the payload synthesis and both decoders equate
        # characters with bytes (UTF-8 encode, char-indexed oracle);
        # octet_length == length holds iff text is pure ASCII, so the
        # assumption is enforced, not implicit (same predicate in SQL).
        (F.length("text") > 0)
        & (F.octet_length("text") == F.length("text"))
    ).select(
        "doc_id",
        "text",
        (
            F.conv(F.substring(F.md5("text"), 5, 3), 16, 10).cast("long") % 113
            + 16
        ).alias("ns"),
    )
    header = F.expr(
        f"unhex('{b'RIFF'.hex()}' || {_le_hex_sql('36 + ns', 4)}"
        f" || '{_WAV_CONST_HEX}' || {_le_hex_sql('ns', 4)})"
    )
    samples = F.expr(
        "encode(substr(repeat(text, cast(ceil(ns / length(text)) as int)),"
        " 1, cast(ns as int)), 'UTF-8')"
    )
    return d.select("doc_id", F.concat(header, samples).alias("payload"))


def decode_wav(payload: bytes):
    """REAL RIFF/WAVE decoder: magic check, word-aligned chunk walk,
    PCM fmt validation, data-chunk sample extraction. No codec
    library — this is the complete container-format implementation."""
    import numpy as np

    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    end = min(len(payload), 8 + int.from_bytes(payload[4:8], "little"))
    idx, fmt, data = 12, None, None
    while idx + 8 <= end:
        cid = payload[idx : idx + 4]
        size = int.from_bytes(payload[idx + 4 : idx + 8], "little")
        body = payload[idx + 8 : idx + 8 + size]
        if cid == b"fmt ":
            fmt = body
        elif cid == b"data":
            data = body
        idx += 8 + size + (size & 1)  # chunks are 16-bit word aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    audio_format = int.from_bytes(fmt[0:2], "little")
    channels = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if audio_format != 1 or bits != 8 or channels != 1:
        raise ValueError(f"unsupported encoding {audio_format}/{bits}/{channels}")
    return rate, np.frombuffer(data, np.uint8)


# Exact-integer amplitude stats; the oracle recomputes the tiled sample
# stream positionally (sample j = ord(text[j mod n])).
_WAV_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS n,
         16 + (CAST('0x' || substr(md5(text), 5, 3) AS BIGINT) % 113) AS ns
  FROM documents
  WHERE length(text) > 0 AND octet_length(encode(text)) = length(text)
),
s AS (
  SELECT doc_id, ns, text, n, unnest(generate_series(0, ns - 1)) AS j
  FROM d
),
v AS (
  SELECT doc_id, ns, ord(substr(text, CAST(j % n AS INT) + 1, 1)) AS a
  FROM s
)
SELECT doc_id,
       CAST({_WAV_RATE} AS BIGINT)    AS sample_rate,
       any_value(ns)                  AS n_samples,
       CAST(sum(a) AS BIGINT)         AS amp_sum,
       CAST(sum(a * a) AS BIGINT)     AS amp_sq_sum,
       CAST(min(a) AS BIGINT)         AS amp_min,
       CAST(max(a) AS BIGINT)         AS amp_max
FROM v GROUP BY doc_id
"""


@register(
    "multimodal_audio_wav",
    "multimodal",
    "REAL audio decode (the audio twin of the PPM image path): each "
    "document carries a genuine RIFF/WAVE container (8-bit mono PCM, "
    "synthesized JVM-side — little-endian header ints built as hex and "
    "unhex'd); an Arrow-batched mapInPandas kernel walks the RIFF "
    "chunks (magic, fmt descriptor validation, data extraction) and "
    "emits exact-integer amplitude stats (sum, energy, min, max). The "
    "oracle recomputes the tiled sample stream positionally in SQL, so "
    "the chunk walker is hash-checked end-to-end. Row-local, zero "
    "exchanges; swapping WAV for MP3 swaps one kernel body for ffmpeg.",
    oracle=_WAV_ORACLE,
)
def multimodal_audio_wav(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    d = encode_wav(_docs(spark, sf_dir))

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = (
            "doc_id", "sample_rate", "n_samples", "amp_sum", "amp_sq_sum",
            "amp_min", "amp_max",
        )
        for pdf in batches:
            if pdf.empty:
                continue
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                rate, a = decode_wav(bytes(payload))
                a64 = a.astype(np.int64)
                out["doc_id"].append(doc_id)
                out["sample_rate"].append(rate)
                out["n_samples"].append(len(a))
                out["amp_sum"].append(int(a64.sum()))
                out["amp_sq_sum"].append(int((a64 * a64).sum()))
                out["amp_min"].append(int(a64.min()))
                out["amp_max"].append(int(a64.max()))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        decode,
        schema="doc_id long, sample_rate long, n_samples long, amp_sum long, "
               "amp_sq_sum long, amp_min long, amp_max long",
    )


# --------------------------------------------------------------------------
# REAL video demux: concatenated-PPM frame stream -> strided frame sample
#
# The video twin: each document carries a 4-frame "clip" (four complete
# P6 PPM containers back to back, frame k's pixels rotated k bytes —
# distinct frames, same dims), and the kernel is a REAL demuxer: it
# walks the byte stream parsing one full PPM per step, then samples
# every 2nd frame and emits per-frame channel sums. This is the
# frame-extraction shape (seek, decode, stride) a video pipeline runs;
# swapping the PPM stream for H.264 swaps the demux step for ffmpeg.
# --------------------------------------------------------------------------

_CLIP_FRAMES = 4
_FRAME_STRIDE = 2


def encode_ppm_clip(d: DataFrame) -> DataFrame:
    """Attach a 4-frame concatenated-PPM clip per document. Frame k's
    pixel bytes are the text rotated left by k (mod its length), tiled
    to w*h*3 — so frames are distinct but each is exactly recomputable
    positionally by the oracle. Native expressions only."""
    d = d.filter(
        # ASCII guard: the payload synthesis and both decoders equate
        # characters with bytes (UTF-8 encode, char-indexed oracle);
        # octet_length == length holds iff text is pure ASCII, so the
        # assumption is enforced, not implicit (same predicate in SQL).
        (F.length("text") > 0)
        & (F.octet_length("text") == F.length("text"))
    ).select(
        "doc_id",
        "text",
        (F.conv(F.substring(F.md5("text"), 1, 2), 16, 10).cast("long") % 8 + 4
         ).alias("width"),
        (F.conv(F.substring(F.md5("text"), 3, 2), 16, 10).cast("long") % 8 + 4
         ).alias("height"),
    )
    frames = []
    for k in range(_CLIP_FRAMES):
        rot = (
            f"concat(substr(text, pmod({k}, length(text)) + 1),"
            f" substr(text, 1, pmod({k}, length(text))))"
        )
        frames.append(
            F.encode(
                F.concat(
                    F.concat_ws(
                        "", F.lit("P6\n"), F.col("width"), F.lit(" "),
                        F.col("height"), F.lit("\n255\n"),
                    ),
                    F.expr(
                        f"substr(repeat({rot}, cast(ceil(width * height * 3"
                        f" / length(text)) as int)), 1,"
                        f" cast(width * height * 3 as int))"
                    ),
                ),
                "UTF-8",
            )
        )
    return d.select("doc_id", F.concat(*frames).alias("payload"))


def demux_ppm_stream(payload: bytes):
    """REAL PPM-stream demuxer: repeatedly parse a complete P6 container
    (header tokens + pixel block) and yield (w, h, frame_array) until
    the stream is exhausted."""
    import numpy as np

    off = 0
    while off < len(payload):
        if payload[off : off + 2] != b"P6":
            raise ValueError(f"bad frame magic at offset {off}")
        idx, vals = off + 2, []
        while len(vals) < 3:
            while payload[idx : idx + 1].isspace():
                idx += 1
            start = idx
            while not payload[idx : idx + 1].isspace():
                idx += 1
            vals.append(int(payload[start:idx]))
        idx += 1  # single whitespace byte after maxval
        w, h, maxval = vals
        if maxval != 255:
            raise ValueError(f"unsupported maxval {maxval}")
        arr = np.frombuffer(payload, np.uint8, count=w * h * 3, offset=idx)
        yield w, h, arr.reshape(h, w, 3)
        off = idx + w * h * 3


# Oracle: byte j of frame k is ord(text[(j + k) mod n]), channel j mod 3;
# sampled frames are k in {0, 2} (stride 2 over 4 frames).
_CLIP_ORACLE = f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS n,
         4 + (CAST('0x' || substr(md5(text), 1, 2) AS BIGINT) % 8) AS width,
         4 + (CAST('0x' || substr(md5(text), 3, 2) AS BIGINT) % 8) AS height
  FROM documents
  WHERE length(text) > 0 AND octet_length(encode(text)) = length(text)
),
px AS (
  SELECT doc_id, width, height, n, text, k.k, unnest(generate_series(0, width * height * 3 - 1)) AS j
  FROM d CROSS JOIN (
    SELECT unnest(generate_series(0, {_CLIP_FRAMES - 1}, {_FRAME_STRIDE})) AS k
  ) k
),
v AS (
  SELECT doc_id, k, j % 3 AS ch,
         ord(substr(text, CAST((j + k) % n AS INT) + 1, 1)) AS b
  FROM px
)
SELECT doc_id,
       CAST(k AS BIGINT)                                       AS frame_idx,
       CAST({_CLIP_FRAMES} AS BIGINT)                          AS n_frames,
       CAST(SUM(CASE WHEN ch = 0 THEN b ELSE 0 END) AS BIGINT) AS r_sum,
       CAST(SUM(CASE WHEN ch = 1 THEN b ELSE 0 END) AS BIGINT) AS g_sum,
       CAST(SUM(CASE WHEN ch = 2 THEN b ELSE 0 END) AS BIGINT) AS b_sum
FROM v GROUP BY doc_id, k
"""


@register(
    "multimodal_video_demux",
    "multimodal",
    "REAL video frame sampling (the video twin of the PPM/WAV decoders): "
    f"each document carries a {_CLIP_FRAMES}-frame clip of complete P6 "
    "PPM containers back to back (frame k's pixels rotated k bytes — "
    "distinct frames, synthesized JVM-side); an Arrow-batched "
    "mapInPandas kernel DEMUXES the byte stream — parsing one full "
    f"container per step — and samples every {_FRAME_STRIDE}nd frame, "
    "emitting exact per-frame channel sums that the oracle recomputes "
    "positionally in SQL. One output row per sampled frame (bounded per "
    "item regardless of clip length — the property that keeps decoded "
    "video from exploding executor memory); swapping the PPM stream for "
    "H.264 swaps the demux step for ffmpeg.",
    oracle=_CLIP_ORACLE,
)
def multimodal_video_demux(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    d = encode_ppm_clip(_docs(spark, sf_dir))

    def demux(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ("doc_id", "frame_idx", "n_frames", "r_sum", "g_sum", "b_sum")
        for pdf in batches:
            if pdf.empty:
                continue
            out = {k: [] for k in cols}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                frames = list(demux_ppm_stream(bytes(payload)))
                for k in range(0, len(frames), _FRAME_STRIDE):
                    _, _, arr = frames[k]
                    sums = arr.sum(axis=(0, 1), dtype=np.int64)
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(k)
                    out["n_frames"].append(len(frames))
                    out["r_sum"].append(int(sums[0]))
                    out["g_sum"].append(int(sums[1]))
                    out["b_sum"].append(int(sums[2]))
            yield pd.DataFrame(out)

    return d.mapInPandas(
        demux,
        schema="doc_id long, frame_idx long, n_frames long, r_sum long, "
               "g_sum long, b_sum long",
    )


# --------------------------------------------------------------------------
# Byte-level feature extraction — a REAL (non-stub) Arrow kernel
# --------------------------------------------------------------------------

_BYTE_STATS_ORACLE = """
WITH b AS (
  SELECT doc_id, encode(text) AS blob,
         octet_length(encode(text)) AS n_bytes
  FROM documents
),
s AS (
  SELECT doc_id, n_bytes,
         list_transform(generate_series(1, n_bytes),
           i -> CAST(('0x' || substr(hex(blob), 2 * i - 1, 2)) AS INTEGER)) AS bytes
  FROM b
)
SELECT doc_id,
       CAST(n_bytes AS BIGINT)         AS n_bytes,
       CAST(list_sum(bytes) AS BIGINT) AS byte_sum,
       CAST(list_min(bytes) AS BIGINT) AS byte_min,
       CAST(list_max(bytes) AS BIGINT) AS byte_max,
       CAST((list_sum(bytes) * 10000) // n_bytes AS BIGINT) AS mean_e4
FROM s
"""


BYTE_STATS_SCHEMA = (
    "doc_id long, n_bytes long, byte_sum long, "
    "byte_min long, byte_max long, mean_e4 long"
)


def byte_features_kernel(
    batches: Iterator["pd.DataFrame"],
) -> Iterator["pd.DataFrame"]:
    """Arrow batch kernel: (doc_id, payload) -> byte-stat features."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        if pdf.empty:
            continue
        rows = []
        for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
            a = np.frombuffer(bytes(buf), dtype=np.uint8)
            if a.size == 0:
                # mirror the oracle: empty blob -> NULL stats, not a
                # reduction-on-empty crash poisoning the whole stage
                rows.append((int(doc_id), 0, None, None, None, None))
                continue
            s = int(a.sum(dtype=np.int64))
            rows.append(
                (
                    int(doc_id),
                    int(a.size),
                    s,
                    int(a.min()),
                    int(a.max()),
                    (s * 10000) // int(a.size),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_bytes", "byte_sum",
                "byte_min", "byte_max", "mean_e4",
            ],
        )


@register(
    "multimodal_byte_stats",
    "multimodal",
    "Byte-level payload features via a REAL Arrow kernel (numpy "
    "frombuffer over the binary column — no stub): per-payload byte "
    "count/sum/min/max and an exact integer-scaled mean. The oracle "
    "re-derives every byte from the blob's hex dump, so the kernel is "
    "verified byte-exactly, independent of text encoding. This is the "
    "shape a real image/audio feature extractor has — opaque bytes in, "
    "numeric features out, all math vectorized inside the Arrow batch.",
    oracle=_BYTE_STATS_ORACLE,
)
def multimodal_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At 100 TB the payload column dominates IO: this kernel reads it
    ONCE, emits fixed-width features, and never shuffles the bytes —
    the downstream join/agg works on the tiny feature table. One
    Python(Arrow) eval node, zero exchanges."""
    d = with_binary_payload(_docs(spark, sf_dir)).select("doc_id", "payload")
    return d.mapInPandas(byte_features_kernel, schema=BYTE_STATS_SCHEMA)


# --------------------------------------------------------------------------
# Perceptual block-hash near-dup over the binary payload
# --------------------------------------------------------------------------

# Block-mean hash (the aHash shape every perceptual image/audio dedup
# starts from): the payload is cut into 64 equal byte ranges; bit k = 1
# iff block k's mean >= the whole payload's mean, compared CROSS-
# MULTIPLIED in exact integers (sum_k * n >= total * n_k) so no float
# division exists anywhere. Payloads shorter than 64 bytes yield some
# empty blocks whose bit is deterministically 1 (0 >= 0) — same formula
# both engines, so cross-engine-stable. The 64-bit signature is carried
# as two 32-bit halves (h1 = bits 0..31, h2 = bits 32..63) to keep every
# value positive in BIGINT arithmetic.
_PH_BANDS = 4  # 16 bits per band over the 64-bit signature
_PH_MAX_HAMMING = 12

_PH_SIG_CTES = """b AS (
  SELECT doc_id, encode(text) AS blob, octet_length(encode(text)) AS n
  FROM documents
),
sbytes AS (
  SELECT doc_id, n,
         list_transform(generate_series(1, n),
           i -> CAST(('0x' || substr(hex(blob), 2 * i - 1, 2)) AS BIGINT)) AS bytes
  FROM b
),
tot AS (
  SELECT doc_id, n, bytes, CAST(list_sum(bytes) AS BIGINT) AS total FROM sbytes
),
bits AS (
  SELECT doc_id,
         list_transform(generate_series(0, 63),
           k -> CASE WHEN CAST(coalesce(list_sum(
                      bytes[(k * n // 64) + 1 : ((k + 1) * n // 64)]), 0)
                      AS BIGINT) * n
                     >= total * (((k + 1) * n // 64) - (k * n // 64))
                THEN CAST(1 AS BIGINT) ELSE CAST(0 AS BIGINT) END) AS bv
  FROM tot
),
sig AS (
  SELECT doc_id,
         CAST(list_sum(list_transform(generate_series(1, 32),
              j -> bv[j] * (CAST(1 AS BIGINT) << (j - 1)))) AS BIGINT) AS h1,
         CAST(list_sum(list_transform(generate_series(33, 64),
              j -> bv[j] * (CAST(1 AS BIGINT) << (j - 33)))) AS BIGINT) AS h2
  FROM bits
),
bands AS (
  SELECT doc_id, t.band,
         CASE t.band WHEN 0 THEN h1 % 65536 WHEN 1 THEN h1 // 65536
                     WHEN 2 THEN h2 % 65536 ELSE h2 // 65536 END AS bkey
  FROM sig CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS band) t
)"""

_PH_PAIRS_ORACLE = f"""
WITH {_PH_SIG_CTES},
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.bkey = b.bkey AND a.doc_id < b.doc_id
)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(x.h1, y.h1)) + bit_count(xor(x.h2, y.h2))
            AS BIGINT) AS hamming,
       (bit_count(xor(x.h1, y.h1)) + bit_count(xor(x.h2, y.h2))
        <= {_PH_MAX_HAMMING}) AS is_near
FROM cand c JOIN sig x ON x.doc_id = c.doc_a JOIN sig y ON y.doc_id = c.doc_b
"""

PH_SIG_SCHEMA = "doc_id long, h1 long, h2 long"


def blockhash_kernel(batches):
    """Arrow kernel: 64-block mean hash per payload, vectorized numpy
    (reduceat over block offsets); exact integer compare mirrors the
    oracle's hex-dump recomputation bit for bit."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        if pdf.empty:
            continue
        rows = []
        for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
            a = np.frombuffer(bytes(buf), dtype=np.uint8).astype(np.int64)
            n = int(a.size)
            total = int(a.sum())
            offsets = [(k * n) // 64 for k in range(64)]
            if n:
                sums = np.add.reduceat(a, offsets)
                # reduceat wraps on repeated offsets (empty blocks):
                # recompute those as true zero-width sums
                for k in range(64):
                    hi = ((k + 1) * n) // 64
                    if offsets[k] >= hi:
                        sums[k] = 0
            else:
                sums = np.zeros(64, dtype=np.int64)
            h1 = h2 = 0
            for k in range(64):
                nk = ((k + 1) * n) // 64 - (k * n) // 64
                bit = 1 if int(sums[k]) * n >= total * nk else 0
                if k < 32:
                    h1 |= bit << k
                else:
                    h2 |= bit << (k - 32)
            rows.append((int(doc_id), h1, h2))
        yield pd.DataFrame(rows, columns=["doc_id", "h1", "h2"])


def blockhash_signatures(d: DataFrame) -> DataFrame:
    payload = with_binary_payload(d).select("doc_id", "payload")
    return payload.mapInPandas(blockhash_kernel, schema=PH_SIG_SCHEMA)


@register(
    "multimodal_blockhash_neardup",
    "multimodal",
    "Perceptual near-dup over the BINARY payload: a 64-block mean hash "
    "(the aHash shape image/audio dedup uses) computed by a real Arrow "
    "numpy kernel — blocks sum via reduceat, bits compare block mean "
    "vs payload mean cross-multiplied in exact integers — then "
    f"Hamming-LSH banding ({_PH_BANDS} x 16-bit bands) generates "
    "candidates and popcount-of-xor verifies them, flagged at Hamming "
    f"<= {_PH_MAX_HAMMING}. The multimodal twin of the text SimHash "
    "family: payload bytes are read ONCE by the kernel and never "
    "shuffle; everything downstream joins 3-integer signatures. The "
    "oracle recomputes every block sum from the blob's hex dump, so "
    "kernel, banding and verify are checked byte-exactly end to end.",
    oracle=_PH_PAIRS_ORACLE,
)
def multimodal_blockhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    sig = _pin(blockhash_signatures(_docs(spark, sf_dir)))
    bands = sig.select(
        "doc_id",
        F.explode(
            F.array(
                F.struct(F.lit(0).alias("band"), (F.col("h1") % 65536).alias("bkey")),
                F.struct(F.lit(1).alias("band"), F.expr("h1 div 65536").alias("bkey")),
                F.struct(F.lit(2).alias("band"), (F.col("h2") % 65536).alias("bkey")),
                F.struct(F.lit(3).alias("band"), F.expr("h2 div 65536").alias("bkey")),
            )
        ).alias("bs"),
    ).select("doc_id", F.col("bs.band").alias("band"), F.col("bs.bkey").alias("bkey"))
    a = bands.select(
        F.col("doc_id").alias("doc_a"), F.col("band").alias("ba"), F.col("bkey").alias("ka")
    )
    b = bands.select(
        F.col("doc_id").alias("doc_b"), F.col("band").alias("bb"), F.col("bkey").alias("kb")
    )
    cand = (
        a.join(
            b,
            (F.col("ba") == F.col("bb"))
            & (F.col("ka") == F.col("kb"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )
    x = sig.select(F.col("doc_id").alias("doc_a"), F.col("h1").alias("x1"), F.col("h2").alias("x2"))
    y = sig.select(F.col("doc_id").alias("doc_b"), F.col("h1").alias("y1"), F.col("h2").alias("y2"))
    ham = (
        F.bit_count(F.expr("x1 ^ y1")) + F.bit_count(F.expr("x2 ^ y2"))
    ).cast("long")
    return (
        cand.join(x, "doc_a")
        .join(y, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            ham.alias("hamming"),
            (ham <= _PH_MAX_HAMMING).alias("is_near"),
        )
    )


# --------------------------------------------------------------------------
# Byte-histogram statistics (compression / corruption detector)
# --------------------------------------------------------------------------

# Uniformity statistic in EXACT integers: with n bytes over 256 bins the
# expected count per bin is n/256; cross-multiplying away the division,
#   chisq_x256 = sum over bins (256 * c_i - n)^2
# is a pure-BIGINT chi-square numerator (255 * 256 * n at perfect
# uniformity ~ encrypted/compressed payloads score LOW per byte; highly
# structured payloads score HIGH). Bounded by (256*n)^2 * 256 < 2^63 for
# n < ~23M bytes — far above any fixture payload; document the DECIMAL
# escalation for larger blobs.

_BH_ORACLE = """
WITH b AS (
  SELECT doc_id, encode(text) AS blob,
         octet_length(encode(text)) AS n
  FROM documents
),
s AS (
  SELECT doc_id, n,
         list_transform(generate_series(1, n),
           i -> CAST(('0x' || substr(hex(blob), 2 * i - 1, 2)) AS BIGINT)) AS bytes
  FROM b
),
h AS (
  SELECT doc_id, n,
         list_transform(generate_series(0, 255),
           v -> CAST(len(list_filter(bytes, x -> x = v)) AS BIGINT)) AS hist
  FROM s
)
SELECT doc_id,
       CAST(n AS BIGINT) AS n_bytes,
       CAST(len(list_filter(hist, c -> c > 0)) AS BIGINT) AS n_distinct_bytes,
       CAST(list_indexof(hist, list_max(hist)) - 1 AS BIGINT) AS mode_byte,
       CAST(list_max(hist) AS BIGINT) AS mode_count,
       CAST(list_sum(list_transform(hist,
            c -> (256 * c - n) * (256 * c - n))) AS BIGINT) AS chisq_x256
FROM h
"""


def byte_histogram_kernel(batches):
    """Arrow kernel: 256-bin byte histogram per payload via
    numpy.bincount; all emitted statistics are exact integers, so the
    result is merge-order-invariant and hash-checkable against the
    oracle's hex-dump recomputation."""
    import numpy as np
    import pandas as pd

    for pdf in batches:
        if pdf.empty:
            continue
        rows = []
        for doc_id, buf in zip(pdf["doc_id"], pdf["payload"]):
            a = np.frombuffer(bytes(buf), dtype=np.uint8)
            n = int(a.size)
            hist = np.bincount(a, minlength=256).astype(np.int64)
            mode_byte = int(hist.argmax())  # lowest byte wins ties
            diff = 256 * hist - n
            rows.append(
                (
                    int(doc_id),
                    n,
                    int((hist > 0).sum()),
                    mode_byte,
                    int(hist[mode_byte]),
                    int((diff * diff).sum()),
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id",
                "n_bytes",
                "n_distinct_bytes",
                "mode_byte",
                "mode_count",
                "chisq_x256",
            ],
        )


@register(
    "multimodal_byte_histogram",
    "multimodal",
    "Byte-histogram statistics over the binary payload via a real "
    "Arrow numpy kernel (bincount per payload): distinct-byte count, "
    "mode byte with deterministic lowest-byte tiebreak, and a "
    "cross-multiplied pure-BIGINT chi-square uniformity numerator "
    "sum((256*c - n)^2) — the compression/corruption detector "
    "(encrypted or compressed payloads sit near uniform; structured "
    "payloads score high), companion to the aHash near-dup and "
    "byte-stats kernels. Payload bytes are read once and never "
    "shuffle; output is 6 integers per payload; the oracle recomputes "
    "every bin from the blob's hex dump, so the kernel is verified "
    "byte-exactly.",
    oracle=_BH_ORACLE,
)
def multimodal_byte_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = with_binary_payload(_docs(spark, sf_dir)).select("doc_id", "payload")
    schema = (
        "doc_id long, n_bytes long, n_distinct_bytes long, "
        "mode_byte long, mode_count long, chisq_x256 long"
    )
    return d.mapInPandas(byte_histogram_kernel, schema=schema)
