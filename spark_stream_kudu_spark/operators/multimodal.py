"""Multimodal (binary) column operators.

The engine treats images/audio/video as opaque ``BinaryType`` columns
with typed metadata structs (SURVEY.md §1.2 extension types). The
testdata has no real media, so the *content* here is bytes derived from
``documents.text`` — but the Spark-side plumbing is the real thing:

- binary columns + flat metadata projection (oracle-checked)
- an Arrow-batched ``mapInPandas`` decode/feature-extract kernel with
  the exact schema/batching shape a real decoder plugs into. The
  actual codec call is STUBBED behind ``decode_image_stub`` — a
  deterministic fake (real decode needs PIL/ffmpeg, absent here); its
  deterministic outputs are still oracle-verified, so the whole UDF
  pipeline (schema, Arrow transfer, batch iteration) is tested.

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
        F.ceil(F.octet_length("payload") / F.lit(float(FRAME_BYTES)))
        .cast("long")
        .alias("n_frames"),
        "checksum",
        "content_type",
    )


def decode_image_stub(payload: bytes, checksum: str) -> tuple[int, int, float]:
    """STUB decoder — deterministic fake in place of a real codec.

    A real deployment replaces this body with e.g.::

        img = PIL.Image.open(io.BytesIO(payload))   # needs pillow
        return img.width, img.height, float(np.asarray(img).mean())

    (pillow/ffmpeg are not in this container). The fake derives
    dimensions from the checksum and a mean-byte statistic from the
    payload so outputs are deterministic and independently computable
    by the oracle.
    """
    h = bytes.fromhex(checksum)
    width = 16 + h[0] % 64
    height = 16 + h[1] % 64
    mean_byte = (sum(payload) / len(payload)) if payload else 0.0
    return width, height, mean_byte


# The corpus is ASCII, so the payload byte-sum equals the sum of
# character codes — giving the stub decoder an exact SQL twin.
_DECODE_ORACLE = """
WITH chars AS (
  SELECT doc_id, text, md5(text) AS checksum,
         unnest(generate_series(1, length(text))) AS i
  FROM documents
),
s AS (
  SELECT doc_id, any_value(checksum) AS checksum,
         sum(ord(substr(text, i, 1))) AS bsum, count(*) AS blen
  FROM chars GROUP BY doc_id
)
SELECT doc_id,
       16 + (CAST('0x' || substr(checksum, 1, 2) AS BIGINT) % 64)  AS width,
       16 + (CAST('0x' || substr(checksum, 3, 2) AS BIGINT) % 64)  AS height,
       floor((bsum * 1.0 / blen) * 10000 + 0.5) / 10000            AS mean_byte
FROM s
"""


@register(
    "multimodal_decode_stub",
    "multimodal",
    "Arrow-batched mapInPandas decode/feature-extract kernel (the real multimodal "
    "path: payload bytes -> per-item features). Codec is a clearly-marked "
    "deterministic stub; the UDF plumbing (schema, batch shape, Arrow transfer) is "
    "real and the stub's outputs are oracle-verified.",
    oracle=_DECODE_ORACLE,
)
def multimodal_decode_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pandas as pd

    d = with_binary_payload(_docs(spark, sf_dir))

    def decode(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            feats = [
                decode_image_stub(p, c)
                for p, c in zip(pdf["payload"], pdf["checksum"])
            ]
            import numpy as np

            w, h, mb = (np.array(x) for x in zip(*feats))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "width": w.astype("int64"),
                    "height": h.astype("int64"),
                    "mean_byte": np.floor(mb * 1e4 + 0.5) / 1e4,
                }
            )

    return d.mapInPandas(
        decode, schema="doc_id long, width long, height long, mean_byte double"
    )


def frame_offsets(d: DataFrame) -> DataFrame:
    """Frame-sampling plumbing: per-payload list of byte offsets, one per
    FRAME_BYTES window — the shape a video frame-sampler consumes."""
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
# Resize / thumbnail kernel (stub codec, real Arrow plumbing)
# --------------------------------------------------------------------------

RESIZE_BUCKETS = 4  # fixed "thumbnail" resolution of the stub resizer


def resize_stub(payload: bytes) -> list[float]:
    """STUB resizer — block-average the payload into RESIZE_BUCKETS cells.

    A real deployment replaces the body with e.g.::

        img = PIL.Image.open(io.BytesIO(payload)).resize((w, h))
        return np.asarray(img, dtype=float).ravel().tolist()

    The fake downsamples the byte stream itself (cell i = mean of the
    bytes whose index maps to bucket i), which a SQL oracle can compute
    exactly — so schema, batching, and Arrow transfer are all verified.
    """
    n = len(payload)
    sums = [0] * RESIZE_BUCKETS
    counts = [0] * RESIZE_BUCKETS
    for i, b in enumerate(payload):
        k = (i * RESIZE_BUCKETS) // n
        sums[k] += b
        counts[k] += 1
    return [s / c if c else 0.0 for s, c in zip(sums, counts)]


_RESIZE_ORACLE = f"""
WITH chars AS (
  SELECT doc_id, text,
         unnest(generate_series(1, length(text))) AS i
  FROM documents
),
b AS (
  SELECT doc_id, ((i - 1) * {RESIZE_BUCKETS}) // length(text) AS bucket,
         ord(substr(text, i, 1)) AS byte
  FROM chars
),
cells AS (
  SELECT doc_id, bucket,
         floor((sum(byte) * 1.0 / count(*)) * 10000 + 0.5) / 10000 AS cell
  FROM b GROUP BY doc_id, bucket
)
SELECT doc_id,
       {", ".join(f"max(CASE WHEN bucket = {k} THEN cell END) AS cell_{k}"
                  for k in range(RESIZE_BUCKETS))}
FROM cells GROUP BY doc_id
"""


@register(
    "multimodal_resize_stub",
    "multimodal",
    f"Resize/thumbnail kernel: mapInPandas block-averages each binary "
    f"payload into a fixed {RESIZE_BUCKETS}-cell signature (stub for a real "
    "image resize; ASCII corpus gives it an exact SQL twin). Same "
    "scale shape as decode: row-local, Arrow-batched, output rows are "
    "fixed-width regardless of payload size — the property that bounds "
    "memory when payloads vary from KB thumbnails to GB video.",
    oracle=_RESIZE_ORACLE,
)
def multimodal_resize_stub(spark: SparkSession, sf_dir: str) -> DataFrame:
    import numpy as np
    import pandas as pd

    d = with_binary_payload(_docs(spark, sf_dir))

    def resize(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            if pdf.empty:
                continue
            cells = np.array([resize_stub(p) for p in pdf["payload"]])
            out = {"doc_id": pdf["doc_id"]}
            for k in range(RESIZE_BUCKETS):
                out[f"cell_{k}"] = np.floor(cells[:, k] * 1e4 + 0.5) / 1e4
            yield pd.DataFrame(out)

    schema = "doc_id long, " + ", ".join(
        f"cell_{k} double" for k in range(RESIZE_BUCKETS)
    )
    return d.mapInPandas(resize, schema)


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
    sig = blockhash_signatures(_docs(spark, sf_dir)).localCheckpoint(eager=True)
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
