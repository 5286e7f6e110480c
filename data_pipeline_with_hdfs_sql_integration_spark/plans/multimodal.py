"""Multimodal column handling: image/audio/video as opaque binary
columns with typed metadata.

The container has no decode libraries (PIL/ffmpeg/librosa), but two
codec paths are REAL, built on the stdlib alone:

- AUDIO: `multimodal_wav_energy` synthesizes genuine RIFF/PCM WAV
  bytes with the stdlib `wave` writer and decodes them back with the
  stdlib reader, oracled from first principles.
- IMAGE: `multimodal_png_stats` encodes genuine PNG files (signature,
  IHDR, zlib-deflated IDAT exercising ALL FIVE scanline filters,
  CRC-32-checked chunks) and decodes them with an independent
  first-principles parser (`png_codec`) — chunk walk, CRC verify,
  inflate, Sub/Up/Average/Paeth unfiltering. `multimodal_jpeg_stats`
  does the same for BASELINE JPEG with a numpy+stdlib codec
  (`jpeg_codec`): real DCT, zigzag, canonical Huffman emitted in DHT,
  byte stuffing, and an independent decoder that rebuilds the tables
  from the stream. `multimodal_progressive_jpeg_stats` extends it to
  PROGRESSIVE JPEG (`jpeg_progressive_codec`, round 9): SOF2, a
  4-scan spectral-selection + successive-approximation ladder with
  EOBRUN end-of-band runs. `decode_image` really decodes PNG and
  baseline or progressive JPEG payloads; only formats needing
  external codecs (arithmetic-coded JPEG, WebP, color subsampling)
  remain gated behind NotImplementedError / `fake=True`. Everything Spark-side is real and tested: the
binary+metadata schema, Arrow-batched `mapInPandas` plumbing,
per-batch vectorization, and partition sizing — swap the stub for a
real codec and nothing else changes.

Scale notes: binary payloads ride in parquet pages next to their
metadata (no small-file problem); `mapInPandas` streams Arrow batches
so executor memory is bounded by batch size, not partition size
(`spark.sql.execution.arrow.maxRecordsPerBatch`); decode is
embarrassingly parallel — zero shuffle.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_pipeline_with_hdfs_sql_integration_spark.catalog import load
from data_pipeline_with_hdfs_sql_integration_spark.registry import query
from data_pipeline_with_hdfs_sql_integration_spark.session import apply_runtime_confs

#: Canonical multimodal record schema (payload + typed metadata).
MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("n_bytes", T.LongType(), True),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, checksum long, feat array<double>"
)


#: PNG signature (RFC 2083 §3.1).
PNG_SIG = b"\x89PNG\r\n\x1a\n"


def png_codec():
    """Build (encode, decode) for 8-bit grayscale PNG from stdlib parts
    (zlib + struct). Returned as NESTED functions so cloudpickle ships
    them by value into Spark workers (same convention as the mapInPandas
    closures below — no repo-on-sys.path requirement worker-side).

    encode(pixels, width, height) -> bytes: a genuine PNG any reader
    opens. Scanline filters cycle 0..4 by row (None, Sub, Up, Average,
    Paeth) so a decoder must implement the full filter suite.

    decode(payload) -> (width, height, list[int]): independent
    first-principles parser — signature check, chunk walk with CRC-32
    verification, IHDR field validation, IDAT concatenation + inflate,
    per-row unfiltering. No shared state with encode beyond the Paeth
    predictor definition (which the spec fixes)."""
    import struct
    import zlib

    def _paeth(a: int, b: int, c: int) -> int:
        p = a + b - c
        pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
        if pa <= pb and pa <= pc:
            return a
        return b if pb <= pc else c

    def _chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + tag
            + data
            + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
        )

    def encode(pixels, width: int, height: int) -> bytes:
        assert len(pixels) == width * height
        raw = bytearray()
        prior = bytes(width)
        for y in range(height):
            row = bytes(pixels[y * width : (y + 1) * width])
            f = y % 5
            raw.append(f)
            if f == 0:
                raw.extend(row)
            elif f == 1:  # Sub
                raw.extend((row[x] - (row[x - 1] if x else 0)) & 0xFF for x in range(width))
            elif f == 2:  # Up
                raw.extend((row[x] - prior[x]) & 0xFF for x in range(width))
            elif f == 3:  # Average
                raw.extend(
                    (row[x] - (((row[x - 1] if x else 0) + prior[x]) >> 1)) & 0xFF
                    for x in range(width)
                )
            else:  # Paeth
                raw.extend(
                    (row[x] - _paeth(row[x - 1] if x else 0, prior[x], prior[x - 1] if x else 0))
                    & 0xFF
                    for x in range(width)
                )
            prior = row
        ihdr = struct.pack(">IIBBBBB", width, height, 8, 0, 0, 0, 0)
        return (
            PNG_SIG
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b"")
        )

    def decode(payload: bytes):
        buf = bytes(payload)
        if buf[:8] != PNG_SIG:
            raise ValueError("not a PNG: bad signature")
        pos, width, height, idat = 8, None, None, b""
        while pos < len(buf):
            (length,) = struct.unpack(">I", buf[pos : pos + 4])
            tag = buf[pos + 4 : pos + 8]
            data = buf[pos + 8 : pos + 8 + length]
            (crc,) = struct.unpack(">I", buf[pos + 8 + length : pos + 12 + length])
            if crc != zlib.crc32(tag + data) & 0xFFFFFFFF:
                raise ValueError(f"PNG chunk {tag!r}: CRC mismatch")
            if tag == b"IHDR":
                width, height, depth, ctype, comp, filt, ilace = struct.unpack(">IIBBBBB", data)
                if (depth, ctype, comp, filt, ilace) != (8, 0, 0, 0, 0):
                    raise ValueError("decoder supports 8-bit grayscale, no interlace")
            elif tag == b"IDAT":
                idat += data
            elif tag == b"IEND":
                break
            pos += 12 + length
        raw = zlib.decompress(idat)
        if len(raw) != height * (width + 1):
            raise ValueError("IDAT length mismatch")
        pixels: list[int] = []
        prior = bytes(width)
        for y in range(height):
            line = raw[y * (width + 1) : (y + 1) * (width + 1)]
            f, flt = line[0], line[1:]
            row = bytearray(width)
            for x in range(width):
                left = row[x - 1] if x else 0
                up, upleft = prior[x], (prior[x - 1] if x else 0)
                if f == 0:
                    v = flt[x]
                elif f == 1:
                    v = flt[x] + left
                elif f == 2:
                    v = flt[x] + up
                elif f == 3:
                    v = flt[x] + ((left + up) >> 1)
                elif f == 4:
                    v = flt[x] + _paeth(left, up, upleft)
                else:
                    raise ValueError(f"bad filter byte {f}")
                row[x] = v & 0xFF
            pixels.extend(row)
            prior = bytes(row)
        return width, height, pixels

    return encode, decode


def _jpeg_is_progressive(blob: bytes) -> bool:
    """True if the stream's frame header is SOF2 (progressive). A real
    MARKER WALK, not a substring scan: segment payloads (EXIF APP1
    thumbnails, ICC profiles, a 0xFFC2 byte pair inside any length
    field) legally contain 0xFFC2 bytes, so only marker positions —
    reached by skipping each segment by its declared length — count."""
    import struct

    i = 2  # past SOI
    n = len(blob)
    while i + 3 < n:
        if blob[i] != 0xFF:
            return False  # malformed header region
        m = blob[i + 1]
        if m == 0xFF:  # fill byte
            i += 1
            continue
        if 0xC0 <= m <= 0xCF and m not in (0xC4, 0xC8, 0xCC):
            return m == 0xC2  # the SOF marker decides
        if m in (0x01,) or 0xD0 <= m <= 0xD9:
            i += 2  # standalone marker, no length
            continue
        i += 2 + struct.unpack(">H", blob[i + 2 : i + 4])[0]
    return False


def decode_image(payload: bytes, fake: bool = False) -> list[float]:
    """Codec boundary. PNG payloads decode FOR REAL via `png_codec`
    (stdlib zlib/struct), baseline JPEG via `jpeg_codec` (numpy+stdlib,
    since round 8), and PROGRESSIVE JPEG via `jpeg_progressive_codec`
    (since round 9); formats needing external codecs (arithmetic-coded
    JPEG, WebP, ...) stay gated: the deterministic fake derives a
    4-dim 'feature' from the bytes so distributed plumbing is testable
    end-to-end."""
    if payload is not None and bytes(payload[:8]) == PNG_SIG:
        w, h, px = png_codec()[1](payload)
        return [float(w), float(h), float(sum(px)), float(sum(v * v for v in px))]
    if payload is not None and bytes(payload[:2]) == b"\xff\xd8":
        blob = bytes(payload)
        codec = jpeg_progressive_codec if _jpeg_is_progressive(blob) else jpeg_codec
        w, h, px = codec()[1](blob)
        return [float(w), float(h), float(sum(px)), float(sum(v * v for v in px))]
    if not fake:
        raise NotImplementedError(
            "image decode beyond PNG/baseline-or-progressive-JPEG "
            "requires PIL (not installed); pass fake=True for the "
            "deterministic stand-in"
        )
    if payload is None or len(payload) == 0:
        return [0.0, 0.0, 0.0, 0.0]
    n = len(payload)
    return [
        float(n),
        float(payload[0]),
        float(payload[-1]),
        float(sum(payload[:64]) % 997),
    ]


def media_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derive a deterministic media table from `documents`: the utf-8
    text bytes act as the opaque payload (what a real pipeline gets from
    an object store), with metadata columns computed Spark-side."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.octet_length(F.encode("text", "utf-8")).cast("long").alias("n_bytes"),
    )


def extract_features(media: DataFrame, batch_decode_fake: bool = True) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    The closure below is deliberately self-contained (no references to
    module-level functions): cloudpickle serializes module functions of
    importable packages *by reference*, which breaks on Python workers
    that don't have the repo on sys.path. Everything the worker runs is
    defined inside this function and pickled by value.
    """
    if not batch_decode_fake:
        # Fail fast driver-side — the real codec isn't installed.
        decode_image(b"probe", fake=False)

    def _fake_decode(b) -> list[float]:
        if b is None or len(b) == 0:
            return [0.0, 0.0, 0.0, 0.0]
        return [float(len(b)), float(b[0]), float(b[-1]), float(sum(b[:64]) % 997)]

    def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": payloads.map(lambda b: 0 if b is None else len(b)),
                    "checksum": payloads.map(
                        lambda b: 0 if b is None else sum(b) % 1_000_000_007
                    ),
                    "feat": payloads.map(_fake_decode),
                }
            )

    return media.mapInPandas(_extract, schema=FEATURE_SCHEMA)


@query(
    "multimodal_features",
    oracle=None,  # binary mapInPandas pipeline — checksum math is python-side
    doc="Binary-column feature extraction: documents→binary payloads → "
    "mapInPandas (Arrow batches) → per-payload byte stats + stubbed "
    "decode features. Rows-only check; unit tests pin the checksum "
    "values (tests/test_multimodal.py).",
    tags=("multimodal",),
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    return extract_features(media_table(spark, sf_dir)).select(
        "media_id", "n_bytes", "checksum", F.element_at("feat", 1).alias("feat_len")
    )


@query(
    "multimodal_metadata_stats",
    oracle="""
        SELECT source,
               CAST(count(*) AS BIGINT) AS n_media,
               CAST(sum(octet_length(encode(text))) AS BIGINT) AS total_bytes,
               CAST(max(octet_length(encode(text))) AS BIGINT) AS max_bytes
        FROM documents
        GROUP BY source
    """,
    doc="Metadata-only aggregate over the media table: per-source byte "
    "totals computed WITHOUT touching payload contents — the scan prunes "
    "to the metadata columns (the 100 TB win: never read pixels to "
    "answer a catalog question).",
    tags=("multimodal",),
)
def multimodal_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    docs = load(spark, sf_dir, "documents")
    nb = F.octet_length(F.encode("text", "utf-8")).cast("long")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_media"),
        F.sum(nb).alias("total_bytes"),
        F.max(nb).alias("max_bytes"),
    )


FRAME_EVERY_S = 2  # sample one frame every 2 seconds


@query(
    "multimodal_frame_sample",
    oracle=f"""
        WITH v AS (
            SELECT doc_id AS media_id,
                   5 + doc_id % 55 AS duration_s,
                   24 + (doc_id % 2) * 6 AS fps
            FROM documents
        )
        SELECT media_id,
               CAST(unnest(range(0, duration_s * fps, {FRAME_EVERY_S} * fps)) AS BIGINT) AS frame_idx,
               CAST(unnest(range(0, duration_s * fps, {FRAME_EVERY_S} * fps)) * 1000 // fps AS BIGINT) AS frame_ts_ms
        FROM v
    """,
    doc="Video frame-sampling PLAN from metadata only: one frame every "
    f"{FRAME_EVERY_S}s, frame indices generated with sequence() + explode and "
    "timestamps by exact integer math — no codec touched. This is the "
    "scale-critical half of frame extraction: the planner decides WHICH "
    "frames (pure metadata, prunes to two columns), and only the chosen "
    "(media_id, frame_idx) pairs would reach the decode mapInPandas "
    "stage (multimodal_features' stub boundary). Duration/fps are "
    "synthesized deterministically from doc_id so the oracle can "
    "rebuild them.",
    tags=("multimodal", "video"),
)
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    docs = load(spark, sf_dir, "documents")
    v = docs.select(
        F.col("doc_id").alias("media_id"),
        (F.lit(5) + F.col("doc_id") % 55).alias("duration_s"),
        (F.lit(24) + (F.col("doc_id") % 2) * 6).alias("fps"),
    )
    step = F.lit(FRAME_EVERY_S) * F.col("fps")
    last = F.col("duration_s") * F.col("fps") - 1
    frames = v.select(
        "media_id",
        "fps",
        F.explode(F.sequence(F.lit(0).cast("long"), last.cast("long"), step.cast("long"))).alias(
            "frame_idx"
        ),
    )
    return frames.select(
        "media_id",
        "frame_idx",
        F.expr("frame_idx * 1000 div fps").alias("frame_ts_ms"),
    )


def box_resample(
    px: list[int], sw: int, sh: int, w: int, h: int
) -> list[int]:
    """Deterministic grayscale resample. When the source dimensions
    are integer multiples of the target's, this is an EXACT integer
    area average (round-half-up: (sum + n//2) // n) — the thumbnail
    case, closed-form checkable. Any other ratio falls back to
    nearest-neighbor (top-left rule), still fully deterministic."""
    if sw % w == 0 and sh % h == 0:
        fx, fy = sw // w, sh // h
        n = fx * fy
        out = []
        for y in range(h):
            for x in range(w):
                s = sum(
                    px[(y * fy + dy) * sw + (x * fx + dx)]
                    for dy in range(fy)
                    for dx in range(fx)
                )
                out.append((s + n // 2) // n)
        return out
    return [
        px[((y * sh) // h) * sw + ((x * sw) // w)]
        for y in range(h)
        for x in range(w)
    ]


def resize_image(payload: bytes, w: int, h: int, fake: bool = False) -> bytes:
    """Image resize — REAL (since round 8; progressive JPEG round 9)
    for PNG and JPEG
    payloads: decode with the repo codecs, area-average/nearest
    resample (`box_resample`), re-encode as PNG (lossless, so the
    result stays value-checkable). Other formats keep the
    deterministic fake behind `fake=True` (wrong pixels, right SHAPE,
    so batch plumbing and size accounting are testable)."""
    if payload:
        blob = bytes(payload)
        decoded = None
        if blob[:8] == PNG_SIG:
            decoded = png_codec()[1](blob)
        elif blob[:2] == b"\xff\xd8":
            codec = jpeg_progressive_codec if _jpeg_is_progressive(blob) else jpeg_codec
            decoded = codec()[1](blob)
        if decoded is not None:
            sw, sh, px = decoded
            return png_codec()[0](box_resample(px, sw, sh, w, h), w, h)
    if not fake:
        raise NotImplementedError(
            "resize beyond PNG/JPEG payloads requires PIL (not "
            "installed); pass fake=True for the deterministic stand-in"
        )
    if not payload:
        return bytes(w * h)
    return bytes(payload[(i * len(payload)) // (w * h)] for i in range(w * h))


def audio_frame_energy(payload: bytes, frame_len: int = 256, fake: bool = False) -> list[float]:
    """Audio frame energy — REAL (since round 8) for RIFF/PCM WAV
    payloads: the stdlib `wave` reader decodes 16-bit samples and each
    frame reports its mean absolute amplitude (the envelope feature a
    VAD/segmentation stage runs). Non-WAV formats keep the
    deterministic byte-domain fake behind `fake=True`."""
    if payload and bytes(payload[:4]) == b"RIFF":
        import io
        import struct
        import wave

        with wave.open(io.BytesIO(bytes(payload))) as wf:
            assert wf.getsampwidth() == 2, "16-bit PCM expected"
            raw = wf.readframes(wf.getnframes())
        samples = struct.unpack(f"<{len(raw) // 2}h", raw)
        return [
            round(sum(abs(s) for s in fr) / len(fr), 6)
            for fr in (
                samples[i : i + frame_len]
                for i in range(0, len(samples), frame_len)
            )
        ]
    if not fake:
        raise NotImplementedError(
            "audio decode beyond RIFF/PCM WAV requires librosa/soundfile "
            "(not installed); pass fake=True for the deterministic stand-in"
        )
    if not payload:
        return []
    frames = [payload[i : i + frame_len] for i in range(0, len(payload), frame_len)]
    return [round(sum(fr) / len(fr), 6) for fr in frames]


@query(
    "arrow_doc_byte_stats",
    oracle="""
        SELECT doc_id,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               CAST(length(text) AS BIGINT) AS n_chars
        FROM documents
    """,
    doc="mapInArrow surface: per-document byte/char counts computed "
    "directly on pyarrow RecordBatches (no pandas materialization — "
    "the zero-copy path for binary-heavy batches). Deterministic "
    "arithmetic, so unlike the codec stubs this Arrow-native stage is "
    "fully oracled. Completes the Python-boundary API matrix: "
    "pandas_udf, applyInPandas(WithState), mapInPandas, UDTF, "
    "mapInArrow.",
    tags=("multimodal", "arrow"),
)
def arrow_doc_byte_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)

    def _stats(batches):
        import pyarrow as pa
        import pyarrow.compute as pc

        for batch in batches:
            text = batch.column("text")
            yield pa.RecordBatch.from_arrays(
                [
                    batch.column("doc_id"),
                    pc.cast(pc.binary_length(pc.cast(text, pa.binary())), pa.int64()),
                    pc.cast(pc.utf8_length(text), pa.int64()),
                ],
                names=["doc_id", "n_bytes", "n_chars"],
            )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return docs.mapInArrow(_stats, schema="doc_id long, n_bytes long, n_chars long")


# ------------------------------------------------------------- real WAV path
WAV_N_SAMPLES = 256
WAV_SAMPLE_RATE = 8000
WAV_MOD = 2003
WAV_OFFSET = 1001


@query(
    "multimodal_wav_energy",
    oracle=f"""
        SELECT d.doc_id AS media_id,
               CAST({WAV_N_SAMPLES} AS BIGINT) AS n_samples,
               CAST({WAV_SAMPLE_RATE} AS BIGINT) AS sample_rate,
               CAST((SELECT sum(((d.doc_id * 31 + u.k * 17) % {WAV_MOD} - {WAV_OFFSET})
                               * ((d.doc_id * 31 + u.k * 17) % {WAV_MOD} - {WAV_OFFSET}))
                     FROM (SELECT unnest(generate_series(0, {WAV_N_SAMPLES - 1})) AS k) u
               ) AS BIGINT) AS energy
        FROM documents d
    """,
    doc="REAL audio codec path (no stub): per document, a 16-bit mono "
    f"PCM WAV is synthesized with the stdlib `wave` writer ({WAV_N_SAMPLES} "
    "deterministic integer samples), then DECODED BACK by a separate "
    "stdlib `wave` reader stage that parses the actual RIFF container "
    "(header fields + frame bytes) and computes integer energy. The "
    "oracle computes the same energy from first principles (the sample "
    "formula, never touching WAV), so a hash match proves the "
    "encode->container->decode round-trip is byte-faithful end-to-end. "
    "Both stages are Arrow-batched mapInPandas: embarrassingly "
    "parallel, zero shuffle, executor memory bounded by batch size — "
    "the shape real decode (PIL/ffmpeg) drops into unchanged.",
    tags=("multimodal", "audio"),
)
def multimodal_wav_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)

    def _synthesize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Generator stage: real WAV bytes via the stdlib writer.
        import io
        import struct
        import wave

        for b in batches:
            payloads = []
            for mid in b["doc_id"]:
                samples = [
                    (int(mid) * 31 + k * 17) % WAV_MOD - WAV_OFFSET
                    for k in range(WAV_N_SAMPLES)
                ]
                buf = io.BytesIO()
                with wave.open(buf, "wb") as w:
                    w.setnchannels(1)
                    w.setsampwidth(2)
                    w.setframerate(WAV_SAMPLE_RATE)
                    w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
                payloads.append(buf.getvalue())
            yield pd.DataFrame({"media_id": b["doc_id"], "wav": payloads})

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # Decoder stage: parse the RIFF container back with the stdlib
        # reader — independent code path from the writer above.
        import io
        import struct
        import wave

        for b in batches:
            n_samples, rate, energy = [], [], []
            for payload in b["wav"]:
                with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
                    n = w.getnframes()
                    r = w.getframerate()
                    raw = w.readframes(n)
                samples = struct.unpack(f"<{n}h", raw)
                n_samples.append(n)
                rate.append(r)
                energy.append(sum(s * s for s in samples))
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "n_samples": n_samples,
                    "sample_rate": rate,
                    "energy": energy,
                }
            )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    wavs = docs.mapInPandas(_synthesize, schema="media_id long, wav binary")
    return wavs.mapInPandas(
        _decode, schema="media_id long, n_samples long, sample_rate long, energy long"
    )


# ------------------------------------------------------------- real PNG path
PNG_W = 16
PNG_H = 12
PNG_MOD = 251


@query(
    "multimodal_png_stats",
    oracle=f"""
        WITH px AS (
            SELECT y.v AS y, x.v AS x
            FROM (SELECT unnest(generate_series(0, {PNG_H - 1})) AS v) y,
                 (SELECT unnest(generate_series(0, {PNG_W - 1})) AS v) x
        )
        SELECT d.doc_id AS media_id,
               CAST({PNG_W} AS INT) AS width,
               CAST({PNG_H} AS INT) AS height,
               CAST((SELECT sum((d.doc_id * 7 + px.y * 13 + px.x * 5) % {PNG_MOD})
                     FROM px) AS BIGINT) AS pixel_sum,
               CAST((SELECT sum(((d.doc_id * 7 + px.y * 13 + px.x * 5) % {PNG_MOD})
                              * ((d.doc_id * 7 + px.y * 13 + px.x * 5) % {PNG_MOD}))
                     FROM px) AS BIGINT) AS energy
        FROM documents d
    """,
    doc="REAL image codec path (no stub, stdlib-only): per document a "
    f"{PNG_W}x{PNG_H} 8-bit grayscale PNG is ENCODED from deterministic "
    "pixels (signature + IHDR + zlib-deflated IDAT cycling through all "
    "five scanline filters None/Sub/Up/Average/Paeth + CRC-32-checked "
    "chunks — a genuine file any PNG reader opens), then DECODED BACK "
    "by an independent mapInPandas stage that walks chunks, verifies "
    "CRCs, inflates, and unfilters from first principles (png_codec). "
    "The oracle recomputes pixel_sum/energy from the pixel formula, "
    "never touching PNG, so a hash match proves the "
    "encode->container->decode round-trip is pixel-faithful. Both "
    "stages Arrow-batched, embarrassingly parallel, zero shuffle — the "
    "shape a libjpeg decode drops into unchanged.",
    tags=("multimodal", "image"),
)
def multimodal_png_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    enc, dec = png_codec()
    w, h, mod = PNG_W, PNG_H, PNG_MOD

    def _synthesize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for mid in b["doc_id"]:
                m = int(mid)
                pixels = [
                    (m * 7 + y * 13 + x * 5) % mod for y in range(h) for x in range(w)
                ]
                payloads.append(enc(pixels, w, h))
            yield pd.DataFrame({"media_id": b["doc_id"], "png": payloads})

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            widths, heights, sums, energies = [], [], [], []
            for payload in b["png"]:
                dw, dh, px = dec(bytes(payload))
                widths.append(dw)
                heights.append(dh)
                sums.append(sum(px))
                energies.append(sum(v * v for v in px))
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "width": widths,
                    "height": heights,
                    "pixel_sum": sums,
                    "energy": energies,
                }
            )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    pngs = docs.mapInPandas(_synthesize, schema="media_id long, png binary")
    return pngs.mapInPandas(
        _decode,
        schema="media_id long, width int, height int, pixel_sum long, energy long",
    )


_RS = "((d.doc_id * 7 + ({y}) * 13 + ({x}) * 5) % " + str(251) + ")"


@query(
    "multimodal_resize_stats",
    oracle=f"""
        WITH px AS (
            SELECT y.v AS y, x.v AS x
            FROM (SELECT unnest(generate_series(0, 5)) AS v) y,
                 (SELECT unnest(generate_series(0, 7)) AS v) x
        ),
        o AS (
            SELECT d.doc_id,
                   ({_RS.format(y='2*px.y', x='2*px.x')}
                    + {_RS.format(y='2*px.y', x='2*px.x+1')}
                    + {_RS.format(y='2*px.y+1', x='2*px.x')}
                    + {_RS.format(y='2*px.y+1', x='2*px.x+1')} + 2) // 4 AS p
            FROM documents d, px
        )
        SELECT doc_id AS media_id,
               CAST(8 AS INT) AS width,
               CAST(6 AS INT) AS height,
               CAST(sum(p) AS BIGINT) AS pixel_sum,
               CAST(sum(p * p) AS BIGINT) AS energy
        FROM o GROUP BY doc_id
    """,
    doc="REAL image-resize path: the 16x12 deterministic PNG from "
    "multimodal_png_stats is resized to 8x6 by EXACT integer 2x2 area "
    "averaging (round-half-up, the box_resample/resize_image rule), "
    "re-encoded as PNG, and independently decoded back for stats — "
    "decode -> resample -> encode -> decode, all inside Arrow-batched "
    "mapInPandas stages. The oracle recomputes every pooled pixel in "
    "closed form ((4 neighbors + 2) // 4 of the pattern), so a hash "
    "match proves the whole thumbnail pipeline pixel-exact. Resize is "
    "the canonical preprocessing step for vision training data; the "
    "stage shape (zero shuffle, batch-bounded memory) is what a PIL/"
    "libjpeg-backed variant inherits unchanged.",
    tags=("multimodal", "image"),
)
def multimodal_resize_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    enc, dec = png_codec()
    sw, sh, mod = PNG_W, PNG_H, PNG_MOD
    w, h = sw // 2, sh // 2

    def _synth_resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for mid in b["doc_id"]:
                m = int(mid)
                px = [
                    (m * 7 + y * 13 + x * 5) % mod
                    for y in range(sh)
                    for x in range(sw)
                ]
                blob = enc(px, sw, sh)
                _, _, full = dec(blob)  # decode the real container back
                pooled = [
                    (
                        full[(2 * y) * sw + 2 * x]
                        + full[(2 * y) * sw + 2 * x + 1]
                        + full[(2 * y + 1) * sw + 2 * x]
                        + full[(2 * y + 1) * sw + 2 * x + 1]
                        + 2
                    )
                    // 4
                    for y in range(h)
                    for x in range(w)
                ]
                payloads.append(enc(pooled, w, h))
            yield pd.DataFrame({"media_id": b["doc_id"], "png": payloads})

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            widths, heights, sums, energies = [], [], [], []
            for payload in b["png"]:
                dw, dh, px = dec(bytes(payload))
                widths.append(dw)
                heights.append(dh)
                sums.append(sum(px))
                energies.append(sum(v * v for v in px))
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "width": widths,
                    "height": heights,
                    "pixel_sum": sums,
                    "energy": energies,
                }
            )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    small = docs.mapInPandas(_synth_resize, schema="media_id long, png binary")
    return small.mapInPandas(
        _decode,
        schema="media_id long, width int, height int, pixel_sum long, energy long",
    )


# ------------------------------------------------------------ real JPEG path
JPG_W = 16  # 2x2 grid of 8x8 MCU blocks
JPG_H = 16
JPG_MOD = 256  # flat-block gray level domain
#: DC quant step 8 makes the flat-block DC round-trip EXACT:
#: DCT DC of a flat (v-128) block is 8*(v-128); /8 quantizes without
#: loss; dequant*IDCT restores v bit-for-bit (see multimodal_jpeg_stats).
JPG_QTAB = [8] + [16] * 63  # natural (row-major) order


def jpeg_codec():
    """Build (encode, decode) for 8-bit grayscale BASELINE JPEG (JFIF)
    from numpy + stdlib — no PIL/libjpeg anywhere. Nested functions so
    cloudpickle ships them by value into Spark workers (png_codec
    convention).

    encode(pixels, width, height) -> bytes: a genuine baseline JFIF —
    SOI, APP0, DQT, SOF0, DHT (canonical Huffman tables emitted in the
    stream, so any conformant reader decodes it), SOS, entropy-coded
    MCUs with DC prediction, zigzag AC run-length/EOB coding and 0xFF
    byte stuffing, EOI. General: real 8x8 DCT over arbitrary pixels.

    decode(payload) -> (width, height, list[int]): independent
    first-principles decoder — marker walk, DQT/DHT/SOF0/SOS parsing,
    canonical Huffman reconstruction FROM THE STREAM's DHT (no shared
    tables with encode), bit reader with 0xFF00 unstuffing, DC
    prediction, de-zigzag, dequantization, float IDCT, level shift +
    clamp. Shares only the arithmetic the spec fixes.
    """
    import math
    import struct

    import numpy as np

    # 8x8 orthonormal DCT-II matrix: forward D = M @ B @ M.T,
    # inverse B = M.T @ D @ M.
    dctm = np.array(
        [
            [
                math.cos((2 * x + 1) * u * math.pi / 16)
                * (math.sqrt(0.125) if u == 0 else 0.5)
                for x in range(8)
            ]
            for u in range(8)
        ]
    )
    # Zigzag scan order as (row, col) pairs: even diagonals walk
    # bottom-left -> top-right, odd ones the reverse (ITU T.81 fig. 5).
    zz = [
        rc
        for d in range(15)
        for rc in sorted(
            ((r, d - r) for r in range(max(0, d - 7), min(8, d + 1))),
            key=(lambda p: -p[0]) if d % 2 == 0 else (lambda p: p[0]),
        )
    ]

    # Canonical Huffman tables, emitted in DHT: 12 DC categories as
    # 4-bit codes; all 162 AC symbols (EOB, ZRL, (run,size)) as 8-bit
    # codes. Legal (no all-ones code) and decodable by any reader.
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    ac_bits = [0] * 16
    ac_bits[7] = 162
    ac_vals = [0x00, 0xF0] + [
        (r << 4) | s for r in range(16) for s in range(1, 11)
    ]

    def _canonical(bits, vals):
        codes, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                codes[vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return codes

    dc_codes = _canonical(dc_bits, dc_vals)
    ac_codes = _canonical(ac_bits, ac_vals)
    qmat = np.array(JPG_QTAB, dtype=np.float64).reshape(8, 8)

    def _category(v: int) -> int:
        return abs(v).bit_length()

    def encode(pixels, width: int, height: int) -> bytes:
        assert width % 8 == 0 and height % 8 == 0
        assert len(pixels) == width * height
        img = np.asarray(pixels, dtype=np.float64).reshape(height, width)

        out = bytearray()
        bitbuf, nbits = 0, 0

        def put(code: int, length: int) -> None:
            nonlocal bitbuf, nbits
            bitbuf = (bitbuf << length) | (code & ((1 << length) - 1))
            nbits += length
            while nbits >= 8:
                nbits -= 8
                byte = (bitbuf >> nbits) & 0xFF
                out.append(byte)
                if byte == 0xFF:  # byte stuffing
                    out.append(0x00)

        def put_val(v: int, s: int) -> None:
            if s:
                put(v if v >= 0 else v + (1 << s) - 1, s)

        head = bytearray(b"\xff\xd8")  # SOI
        head += b"\xff\xe0" + struct.pack(
            ">H", 16
        ) + b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])  # APP0
        zzq = bytes(int(qmat[r, c]) for r, c in zz)
        head += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zzq  # DQT
        head += b"\xff\xc0" + struct.pack(  # SOF0: 8-bit, 1 component
            ">HBHHB", 11, 8, height, width, 1
        ) + bytes([1, 0x11, 0])
        for cls, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
            data = bytes([cls << 4]) + bytes(bits) + bytes(vals)
            head += b"\xff\xc4" + struct.pack(">H", 2 + len(data)) + data
        head += b"\xff\xda" + struct.pack(">H", 8) + bytes(
            [1, 1, 0x00, 0, 63, 0]
        )  # SOS

        pred = 0
        for by in range(height // 8):
            for bx in range(width // 8):
                block = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = dctm @ block @ dctm.T
                q = np.floor(coef / qmat + 0.5).astype(np.int64)
                zig = [int(q[r, c]) for r, c in zz]
                diff = zig[0] - pred
                pred = zig[0]
                s = _category(diff)
                put(*dc_codes[s])
                put_val(diff, s)
                k = 1
                while k < 64:
                    run = 0
                    while k < 64 and zig[k] == 0:
                        run += 1
                        k += 1
                    if k == 64:
                        put(*ac_codes[0x00])  # EOB
                        break
                    while run > 15:
                        put(*ac_codes[0xF0])  # ZRL
                        run -= 16
                    s = _category(zig[k])
                    put(*ac_codes[(run << 4) | s])
                    put_val(zig[k], s)
                    k += 1
        if nbits:
            put(0x7F, 8 - nbits)  # pad final byte with 1s
        return bytes(head) + bytes(out) + b"\xff\xd9"  # EOI

    def decode(payload: bytes):
        data = bytes(payload)
        assert data[:2] == b"\xff\xd8", "not a JPEG (no SOI)"
        i = 2
        qtabs: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
        width = height = None
        dc_sel = ac_sel = 0
        scan_at = None
        while i < len(data):
            assert data[i] == 0xFF, "marker expected"
            m = data[i + 1]
            if m == 0xD9:
                break
            seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
            seg = data[i + 4 : i + 2 + seglen]
            if m == 0xDB:  # DQT (possibly several tables)
                j = 0
                while j < len(seg):
                    tq = seg[j] & 0x0F
                    assert seg[j] >> 4 == 0, "only 8-bit quant supported"
                    qtabs[tq] = list(seg[j + 1 : j + 65])
                    j += 65
            elif m == 0xC0:  # SOF0 baseline
                height, width = struct.unpack(">HH", seg[1:5])
                assert seg[0] == 8 and seg[5] == 1, "8-bit grayscale only"
                sof_tq = seg[8]
            elif m == 0xC4:  # DHT (possibly several tables)
                j = 0
                while j < len(seg):
                    cls, tid = seg[j] >> 4, seg[j] & 0x0F
                    bits = list(seg[j + 1 : j + 17])
                    n = sum(bits)
                    vals = list(seg[j + 17 : j + 17 + n])
                    codes, code, k = {}, 0, 0
                    for ln in range(1, 17):
                        for _ in range(bits[ln - 1]):
                            codes[(code, ln)] = vals[k]
                            code += 1
                            k += 1
                        code <<= 1
                    huff[(cls, tid)] = codes
                    j += 17 + n
            elif m == 0xDA:  # SOS
                dc_sel, ac_sel = seg[2] >> 4, seg[2] & 0x0F
                scan_at = i + 2 + seglen
                break
            i += 2 + seglen
        assert width and height and scan_at is not None

        qt = np.array(qtabs[sof_tq], dtype=np.float64)
        dq = np.zeros((8, 8))
        for idx, (r, c) in enumerate(zz):
            dq[r, c] = qt[idx]
        dctab, actab = huff[(0, dc_sel)], huff[(1, ac_sel)]

        pos, bit = scan_at, 0

        def getbit() -> int:
            nonlocal pos, bit
            b = data[pos]
            v = (b >> (7 - bit)) & 1
            bit += 1
            if bit == 8:
                bit = 0
                pos += 1
                # An entropy-coded 0xFF is always followed by a
                # stuffed 0x00 — skip it.
                if b == 0xFF and pos < len(data) and data[pos] == 0x00:
                    pos += 1
            return v

        def read_symbol(tab) -> int:
            code, ln = 0, 0
            while True:
                code = (code << 1) | getbit()
                ln += 1
                assert ln <= 16, "bad Huffman stream"
                if (code, ln) in tab:
                    return tab[(code, ln)]

        def receive_extend(s: int) -> int:
            if s == 0:
                return 0
            v = 0
            for _ in range(s):
                v = (v << 1) | getbit()
            return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

        out = np.zeros((height, width), dtype=np.int64)
        pred = 0
        for by in range(height // 8):
            for bx in range(width // 8):
                zig = [0] * 64
                s = read_symbol(dctab)
                pred += receive_extend(s)
                zig[0] = pred
                k = 1
                while k < 64:
                    sym = read_symbol(actab)
                    if sym == 0x00:  # EOB
                        break
                    if sym == 0xF0:  # ZRL
                        k += 16
                        continue
                    k += sym >> 4
                    zig[k] = receive_extend(sym & 0x0F)
                    k += 1
                coef = np.zeros((8, 8))
                for idx, (r, c) in enumerate(zz):
                    coef[r, c] = zig[idx] * dq[r, c]
                block = dctm.T @ coef @ dctm + 128.0
                out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                    np.floor(block + 0.5), 0, 255
                ).astype(np.int64)
        return width, height, [int(v) for v in out.reshape(-1)]

    return encode, decode


def jpeg_progressive_codec():
    """(encode, decode) for 8-bit grayscale PROGRESSIVE JPEG (SOF2) —
    numpy + stdlib, no PIL/libjpeg (closes the round-8 'compressed
    codecs' gap for the progressive half; arithmetic coding and color
    remain out of scope). Nested functions for cloudpickle-by-value
    (png_codec convention).

    encode emits a genuine 4-scan progressive ladder exercising every
    progressive mechanism ITU T.81 defines for Huffman streams:

      scan 1  DC first pass      (Ss=0 Se=0  Ah=0 Al=1)
      scan 2  DC refinement      (Ss=0 Se=0  Ah=1 Al=0, raw bits)
      scan 3  AC first pass      (Ss=1 Se=63 Ah=0 Al=1) with EOBRUN
              end-of-band runs spanning blocks
      scan 4  AC refinement      (Ss=1 Se=63 Ah=1 Al=0): correction
              bits for history coefficients, (run,1) symbols + sign
              for newly nonzero ones (T.81 G.1.2.3)

    so spectral selection, successive approximation (DC arithmetic
    shift, AC truncate-toward-zero point transform), and EOBRUN are
    all real. Quantization is identical to jpeg_codec — progressive
    transmission reorders bits, it never re-loses — so decode output
    is BIT-IDENTICAL to the baseline codec's for the same input
    (unit-pinned in tests/test_codec_property.py).

    decode is an independent first-principles progressive decoder:
    marker walk incl. SOF2 + multiple SOS, canonical Huffman rebuilt
    from the stream's DHT, per-scan coefficient accumulation, EOBRUN,
    DC/AC refinement, then dequant + float IDCT. It accepts any
    single-component spectral-selection/SA Huffman stream, not just
    this encoder's scan script."""
    import math
    import struct

    import numpy as np

    dctm = np.array(
        [
            [
                math.cos((2 * x + 1) * u * math.pi / 16)
                * (math.sqrt(0.125) if u == 0 else 0.5)
                for x in range(8)
            ]
            for u in range(8)
        ]
    )
    zz = [
        rc
        for d in range(15)
        for rc in sorted(
            ((r, d - r) for r in range(max(0, d - 7), min(8, d + 1))),
            key=(lambda p: -p[0]) if d % 2 == 0 else (lambda p: p[0]),
        )
    ]
    dc_bits = [0, 0, 0, 12] + [0] * 12
    dc_vals = list(range(12))
    # Progressive AC alphabet adds the EOBn symbols (r<<4, r=1..14) the
    # sequential table never needs: 15 EOBn + ZRL + 160 (run,size).
    ac_bits = [0] * 16
    ac_vals = (
        [r << 4 for r in range(15)]
        + [0xF0]
        + [(r << 4) | s for r in range(16) for s in range(1, 11)]
    )
    ac_bits[7] = len(ac_vals)  # 176 codes of length 8 (< 255, legal)

    def _canonical(bits, vals):
        codes, code, k = {}, 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                codes[vals[k]] = (code, ln)
                code += 1
                k += 1
            code <<= 1
        return codes

    dc_codes = _canonical(dc_bits, dc_vals)
    ac_codes = _canonical(ac_bits, ac_vals)
    qmat = np.array(JPG_QTAB, dtype=np.float64).reshape(8, 8)

    def _category(v: int) -> int:
        return abs(v).bit_length()

    def encode(pixels, width: int, height: int) -> bytes:
        assert width % 8 == 0 and height % 8 == 0
        assert len(pixels) == width * height
        img = np.asarray(pixels, dtype=np.float64).reshape(height, width)

        # Quantized coefficient blocks in zigzag order, computed once;
        # every scan re-reads them (progressive = re-ordered bits of
        # the SAME quantized data).
        blocks = []
        for by in range(height // 8):
            for bx in range(width // 8):
                blk = img[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] - 128.0
                coef = dctm @ blk @ dctm.T
                q = np.floor(coef / qmat + 0.5).astype(np.int64)
                blocks.append([int(q[r, c]) for r, c in zz])

        head = bytearray(b"\xff\xd8")
        head += b"\xff\xe0" + struct.pack(
            ">H", 16
        ) + b"JFIF\x00" + bytes([1, 1, 0, 0, 1, 0, 1, 0, 0])
        zzq = bytes(int(qmat[r, c]) for r, c in zz)
        head += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + zzq
        head += b"\xff\xc2" + struct.pack(  # SOF2: progressive
            ">HBHHB", 11, 8, height, width, 1
        ) + bytes([1, 0x11, 0])
        for cls, bits, vals in ((0, dc_bits, dc_vals), (1, ac_bits, ac_vals)):
            data = bytes([cls << 4]) + bytes(bits) + bytes(vals)
            head += b"\xff\xc4" + struct.pack(">H", 2 + len(data)) + data
        out = bytearray(head)

        class _BitWriter:
            def __init__(self):
                self.buf, self.bits, self.n = bytearray(), 0, 0

            def put(self, code: int, length: int) -> None:
                if length == 0:
                    return
                self.bits = (self.bits << length) | (code & ((1 << length) - 1))
                self.n += length
                while self.n >= 8:
                    self.n -= 8
                    byte = (self.bits >> self.n) & 0xFF
                    self.buf.append(byte)
                    if byte == 0xFF:
                        self.buf.append(0x00)

            def done(self) -> bytes:
                if self.n:
                    self.put(0x7F, 8 - self.n)
                return bytes(self.buf)

        def put_val(w, v: int, s: int) -> None:
            if s:
                w.put(v if v >= 0 else v + (1 << s) - 1, s)

        def sos(ss: int, se: int, ah: int, al: int) -> bytes:
            return b"\xff\xda" + struct.pack(">H", 8) + bytes(
                [1, 1, 0x00, ss, se, (ah << 4) | al]
            )

        # --- scan 1: DC first pass (Al=1), sequential DC coding of the
        # point-transformed values (arithmetic shift for DC).
        out += sos(0, 0, 0, 1)
        w1 = _BitWriter()
        pred = 0
        for blk in blocks:
            v = blk[0] >> 1
            diff = v - pred
            pred = v
            s = _category(diff)
            w1.put(*dc_codes[s])
            put_val(w1, diff, s)
        out += w1.done()

        # --- scan 2: DC refinement — one raw bit (bit Al=0) per block.
        out += sos(0, 0, 1, 0)
        w2 = _BitWriter()
        for blk in blocks:
            w2.put(blk[0] & 1, 1)
        out += w2.done()

        # --- scan 3: AC first pass (Al=1) with EOBRUN coding.
        out += sos(1, 63, 0, 1)
        w3 = _BitWriter()
        eobrun = 0

        def flush_eobrun(w):
            nonlocal eobrun
            if eobrun > 0:
                n = eobrun.bit_length() - 1
                w.put(*ac_codes[n << 4])
                if n:
                    w.put(eobrun - (1 << n), n)
                eobrun = 0

        for blk in blocks:
            # AC point transform truncates toward zero (T.81 G.1.2.1).
            vals = [
                v // 2 if v >= 0 else -((-v) // 2) for v in blk[1:64]
            ]
            last = max((i for i, v in enumerate(vals) if v != 0), default=-1)
            if last < 0:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eobrun(w3)
                continue
            flush_eobrun(w3)
            run = 0
            for v in vals[: last + 1]:
                if v == 0:
                    run += 1
                    continue
                while run > 15:
                    w3.put(*ac_codes[0xF0])
                    run -= 16
                s = _category(v)
                w3.put(*ac_codes[(run << 4) | s])
                put_val(w3, v, s)
                run = 0
            if last < 62:
                eobrun += 1
                if eobrun == 0x7FFF:
                    flush_eobrun(w3)
        flush_eobrun(w3)
        out += w3.done()

        # --- scan 4: AC refinement (Ah=1, Al=0), T.81 G.1.2.3:
        # correction bits for history coefficients (|v|>>Al > 1 after
        # the previous pass), (run,1)+sign for newly nonzero (|v|==1),
        # buffered correction bits flushed after each emitted symbol,
        # EOBRUN carrying its blocks' trailing correction bits.
        out += sos(1, 63, 1, 0)
        w4 = _BitWriter()
        eobrun = 0
        be: list[int] = []  # correction bits pending behind an EOBRUN

        def flush_eobrun4():
            nonlocal eobrun
            if eobrun > 0:
                n = eobrun.bit_length() - 1
                w4.put(*ac_codes[n << 4])
                if n:
                    w4.put(eobrun - (1 << n), n)
                eobrun = 0
            for b in be:
                w4.put(b, 1)
            be.clear()

        for blk in blocks:
            ab = [abs(v) for v in blk[1:64]]
            eob = max((i for i, a in enumerate(ab) if a == 1), default=-1)
            run = 0
            br: list[int] = []  # correction bits since last symbol
            for i, a in enumerate(ab):
                if a == 0:
                    run += 1
                    continue
                # Pending ZRLs flush at EVERY nonzero coefficient —
                # history or new — before its bit is handled (jcphuff
                # order); deferring past a history coefficient would
                # strand its buffered correction bit after the ZRL
                # where the decoder reads it as stream data.
                while run > 15 and i <= eob:
                    flush_eobrun4()
                    w4.put(*ac_codes[0xF0])
                    run -= 16
                    for b in br:
                        w4.put(b, 1)
                    br.clear()
                if a > 1:
                    # History coefficient: correction bit, run intact.
                    br.append(a & 1)
                    continue
                # Newly nonzero (|v| == 1).
                flush_eobrun4()
                w4.put(*ac_codes[(run << 4) | 1])
                w4.put(1 if blk[1 + i] > 0 else 0, 1)
                for b in br:
                    w4.put(b, 1)
                br.clear()
                run = 0
            if run > 0 or br:
                eobrun += 1
                be.extend(br)
                if eobrun == 0x7FFF or len(be) > 900:
                    flush_eobrun4()
        flush_eobrun4()
        out += w4.done()

        return bytes(out) + b"\xff\xd9"

    def decode(payload: bytes):
        data = bytes(payload)
        assert data[:2] == b"\xff\xd8", "not a JPEG (no SOI)"
        i = 2
        qtabs: dict[int, list[int]] = {}
        huff: dict[tuple[int, int], dict[tuple[int, int], int]] = {}
        width = height = sof_tq = None
        coefs = None  # per-block zigzag coefficient accumulators
        eobrun = 0

        def run_scan(scan_at, ss, se, ah, al, dctab, actab):
            nonlocal eobrun
            pos, bit = scan_at, 0

            def getbit() -> int:
                nonlocal pos, bit
                b = data[pos]
                v = (b >> (7 - bit)) & 1
                bit += 1
                if bit == 8:
                    bit = 0
                    pos += 1
                    if b == 0xFF and pos < len(data) and data[pos] == 0x00:
                        pos += 1
                return v

            def read_bits(n: int) -> int:
                v = 0
                for _ in range(n):
                    v = (v << 1) | getbit()
                return v

            def read_symbol(tab) -> int:
                code, ln = 0, 0
                while True:
                    code = (code << 1) | getbit()
                    ln += 1
                    assert ln <= 16, "bad Huffman stream"
                    if (code, ln) in tab:
                        return tab[(code, ln)]

            def receive_extend(s: int) -> int:
                if s == 0:
                    return 0
                v = read_bits(s)
                return v if v >= (1 << (s - 1)) else v - (1 << s) + 1

            pred = 0
            eobrun = 0
            for blk in coefs:
                if ss == 0:  # DC scan (Se must be 0 per T.81)
                    if ah == 0:
                        s = read_symbol(dctab)
                        pred += receive_extend(s)
                        blk[0] = pred << al
                    else:  # DC refinement: one raw bit
                        if getbit():
                            blk[0] |= 1 << al
                    continue
                if ah == 0:  # AC first pass over [ss..se]
                    if eobrun > 0:
                        eobrun -= 1
                        continue
                    k = ss
                    while k <= se:
                        sym = read_symbol(actab)
                        r, s = sym >> 4, sym & 0x0F
                        if s == 0:
                            if r == 15:
                                k += 16
                                continue
                            eobrun = (1 << r) + (read_bits(r) if r else 0) - 1
                            break
                        k += r
                        blk[k] = receive_extend(s) << al
                        k += 1
                    continue
                # AC refinement (jdphuff-style).
                p1, m1 = 1 << al, -(1 << al)

                def correct(kk: int) -> None:
                    if getbit() and (abs(blk[kk]) & p1) == 0:
                        blk[kk] += p1 if blk[kk] > 0 else m1

                k = ss
                if eobrun == 0:
                    while k <= se:
                        sym = read_symbol(actab)
                        r, s = sym >> 4, sym & 0x0F
                        val = 0
                        if s:
                            assert s == 1, "refinement size must be 1"
                            val = p1 if getbit() else m1
                        else:
                            if r != 15:
                                eobrun = (1 << r) + (read_bits(r) if r else 0)
                                break
                            # r == 15: ZRL — skip 16 zero-history slots
                        while k <= se:
                            if blk[k] != 0:
                                correct(k)
                            else:
                                if r == 0:
                                    break
                                r -= 1
                            k += 1
                        if val:
                            blk[k] = val
                        k += 1
                if eobrun > 0:
                    while k <= se:
                        if blk[k] != 0:
                            correct(k)
                        k += 1
                    eobrun -= 1
            # Scan ends mid-byte; resume the marker walk at the next
            # byte boundary. A partially-read final byte of 0xFF (the
            # 1-bit padding can produce it) carries a stuffed 0x00 —
            # step over both, or the walk would mistake the stuffing
            # for a marker byte.
            if bit == 0:
                return pos
            if data[pos] == 0xFF and pos + 1 < len(data) and data[pos + 1] == 0x00:
                return pos + 2
            return pos + 1

        while i < len(data):
            assert data[i] == 0xFF, "marker expected"
            m = data[i + 1]
            if m == 0xD9:
                break
            seglen = struct.unpack(">H", data[i + 2 : i + 4])[0]
            seg = data[i + 4 : i + 2 + seglen]
            if m == 0xDB:
                j = 0
                while j < len(seg):
                    tq = seg[j] & 0x0F
                    assert seg[j] >> 4 == 0, "only 8-bit quant supported"
                    qtabs[tq] = list(seg[j + 1 : j + 65])
                    j += 65
            elif m == 0xC2:  # SOF2 progressive
                height, width = struct.unpack(">HH", seg[1:5])
                assert seg[0] == 8 and seg[5] == 1, "8-bit grayscale only"
                sof_tq = seg[8]
                nblk = (height // 8) * (width // 8)
                coefs = [[0] * 64 for _ in range(nblk)]
            elif m == 0xC0:
                raise AssertionError("baseline SOF0 — use jpeg_codec")
            elif m == 0xC4:
                j = 0
                while j < len(seg):
                    cls, tid = seg[j] >> 4, seg[j] & 0x0F
                    bits = list(seg[j + 1 : j + 17])
                    n = sum(bits)
                    vals = list(seg[j + 17 : j + 17 + n])
                    codes, code, k = {}, 0, 0
                    for ln in range(1, 17):
                        for _ in range(bits[ln - 1]):
                            codes[(code, ln)] = vals[k]
                            code += 1
                            k += 1
                        code <<= 1
                    huff[(cls, tid)] = codes
                    j += 17 + n
            elif m == 0xDA:  # SOS: one scan of the ladder
                assert coefs is not None, "SOS before SOF2"
                ns = seg[0]
                assert ns == 1, "one component only"
                td, ta = seg[2] >> 4, seg[2] & 0x0F
                ss, se, ahal = seg[1 + 2 * ns], seg[2 + 2 * ns], seg[3 + 2 * ns]
                ah, al = ahal >> 4, ahal & 0x0F
                i = run_scan(
                    i + 2 + seglen,
                    ss,
                    se,
                    ah,
                    al,
                    huff.get((0, td)),
                    huff.get((1, ta)),
                )
                continue
            i += 2 + seglen
        assert width and height and coefs is not None

        qt = np.array(qtabs[sof_tq], dtype=np.float64)
        dq = np.zeros((8, 8))
        for idx, (r, c) in enumerate(zz):
            dq[r, c] = qt[idx]
        out = np.zeros((height, width), dtype=np.int64)
        bxn = width // 8
        for n, zig in enumerate(coefs):
            coef = np.zeros((8, 8))
            for idx, (r, c) in enumerate(zz):
                coef[r, c] = zig[idx] * dq[r, c]
            block = dctm.T @ coef @ dctm + 128.0
            by, bx = divmod(n, bxn)
            out[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8] = np.clip(
                np.floor(block + 0.5), 0, 255
            ).astype(np.int64)
        return width, height, [int(v) for v in out.reshape(-1)]

    return encode, decode


@query(
    "multimodal_jpeg_stats",
    oracle=f"""
        WITH blk AS (
            SELECT by.v AS by, bx.v AS bx
            FROM (SELECT unnest(generate_series(0, {JPG_H // 8 - 1})) AS v) by,
                 (SELECT unnest(generate_series(0, {JPG_W // 8 - 1})) AS v) bx
        )
        SELECT d.doc_id AS media_id,
               CAST({JPG_W} AS INT) AS width,
               CAST({JPG_H} AS INT) AS height,
               CAST((SELECT sum(64 * ((d.doc_id * 7 + blk.by * 13 + blk.bx * 5)
                                      % {JPG_MOD}))
                     FROM blk) AS BIGINT) AS pixel_sum,
               CAST((SELECT sum(64 * ((d.doc_id * 7 + blk.by * 13 + blk.bx * 5)
                                      % {JPG_MOD})
                              * ((d.doc_id * 7 + blk.by * 13 + blk.bx * 5)
                                 % {JPG_MOD}))
                     FROM blk) AS BIGINT) AS energy
        FROM documents d
    """,
    doc="REAL baseline-JPEG codec path (numpy+stdlib, no PIL/libjpeg): "
    f"per document a {JPG_W}x{JPG_H} 8-bit grayscale baseline JFIF is "
    "ENCODED from deterministic FLAT 8x8 blocks (genuine DCT, zigzag "
    "run-length Huffman entropy coding with canonical tables emitted "
    "in DHT, byte stuffing — a file any JPEG reader opens), then "
    "DECODED BACK by an independent mapInPandas stage that rebuilds "
    "the Huffman tables from the stream, undoes DC prediction, "
    "dequantizes and runs the float IDCT (jpeg_codec). Flat blocks "
    "make the lossy codec EXACT here: the DCT of a flat block is "
    "DC-only and the DC quant step of 8 divides it losslessly, so "
    "the oracle recomputes decoded pixel_sum/energy in closed form "
    "and a hash match proves the encode->entropy->decode round-trip "
    "bit-faithful (the general lossy path is pinned separately in "
    "tests). Both stages Arrow-batched, embarrassingly parallel, "
    "zero shuffle — the PNG/WAV/Y4M pattern.",
    tags=("multimodal", "image"),
)
def multimodal_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    enc, dec = jpeg_codec()
    w, h, mod = JPG_W, JPG_H, JPG_MOD

    def _synthesize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for mid in b["doc_id"]:
                m = int(mid)
                pixels = [
                    (m * 7 + (y // 8) * 13 + (x // 8) * 5) % mod
                    for y in range(h)
                    for x in range(w)
                ]
                payloads.append(enc(pixels, w, h))
            yield pd.DataFrame({"media_id": b["doc_id"], "jpg": payloads})

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            widths, heights, sums, energies = [], [], [], []
            for payload in b["jpg"]:
                dw, dh, px = dec(bytes(payload))
                widths.append(dw)
                heights.append(dh)
                sums.append(sum(px))
                energies.append(sum(v * v for v in px))
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "width": widths,
                    "height": heights,
                    "pixel_sum": sums,
                    "energy": energies,
                }
            )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    jpgs = docs.mapInPandas(_synthesize, schema="media_id long, jpg binary")
    return jpgs.mapInPandas(
        _decode,
        schema="media_id long, width int, height int, pixel_sum long, energy long",
    )


#: Progressive fixture: distinct per-block gray formula from the
#: baseline query's so the two codecs never share payload bytes.
JPGP_MULS = (11, 3, 17)


@query(
    "multimodal_progressive_jpeg_stats",
    oracle=f"""
        WITH blk AS (
            SELECT by.v AS by, bx.v AS bx
            FROM (SELECT unnest(generate_series(0, {JPG_H // 8 - 1})) AS v) by,
                 (SELECT unnest(generate_series(0, {JPG_W // 8 - 1})) AS v) bx
        )
        SELECT d.doc_id AS media_id,
               CAST({JPG_W} AS INT) AS width,
               CAST({JPG_H} AS INT) AS height,
               CAST(4 AS INT) AS n_scans,
               CAST((SELECT sum(64 * ((d.doc_id * {JPGP_MULS[0]}
                                       + blk.by * {JPGP_MULS[1]}
                                       + blk.bx * {JPGP_MULS[2]}) % {JPG_MOD}))
                     FROM blk) AS BIGINT) AS pixel_sum,
               CAST((SELECT sum(64 * ((d.doc_id * {JPGP_MULS[0]}
                                       + blk.by * {JPGP_MULS[1]}
                                       + blk.bx * {JPGP_MULS[2]}) % {JPG_MOD})
                              * ((d.doc_id * {JPGP_MULS[0]}
                                  + blk.by * {JPGP_MULS[1]}
                                  + blk.bx * {JPGP_MULS[2]}) % {JPG_MOD}))
                     FROM blk) AS BIGINT) AS energy
        FROM documents d
    """,
    doc="REAL PROGRESSIVE-JPEG codec path (SOF2; numpy+stdlib, round "
    f"9): per document a {JPG_W}x{JPG_H} grayscale progressive JFIF "
    "is ENCODED as a genuine 4-scan ladder — DC first pass + DC "
    "refinement (successive approximation), AC first pass + AC "
    "refinement over the 1..63 band with EOBRUN end-of-band runs "
    "spanning blocks — then DECODED by an independent mapInPandas "
    "stage that walks SOF2/multi-SOS markers, rebuilds the canonical "
    "Huffman tables (incl. the EOBn alphabet) from the stream, "
    "accumulates coefficients across scans and applies refinement "
    "bits (jpeg_progressive_codec). Flat blocks make the lossy "
    "pipeline EXACT (DC-only, quant step divides losslessly), so the "
    "oracle recomputes pixel_sum/energy in closed form; the flat AC "
    "band also forces a maximal EOBRUN covering every block — the "
    "progressive-only mechanism is on the hash-oracled path, not "
    "just in units. n_scans pins the SOS count parsed from the "
    "emitted stream. The general path is pinned bit-identical to the "
    "baseline codec in tests/test_codec_property.py (progressive "
    "transmission reorders bits; it never re-loses). Arrow-batched, "
    "embarrassingly parallel, zero shuffle.",
    tags=("multimodal", "image"),
)
def multimodal_progressive_jpeg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    enc, dec = jpeg_progressive_codec()
    w, h, mod = JPG_W, JPG_H, JPG_MOD
    ma, mb, mc = JPGP_MULS

    def _synthesize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for mid in b["doc_id"]:
                m = int(mid)
                pixels = [
                    (m * ma + (y // 8) * mb + (x // 8) * mc) % mod
                    for y in range(h)
                    for x in range(w)
                ]
                payloads.append(enc(pixels, w, h))
            yield pd.DataFrame({"media_id": b["doc_id"], "jpg": payloads})

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            widths, heights, scans, sums, energies = [], [], [], [], []
            for payload in b["jpg"]:
                blob = bytes(payload)
                dw, dh, px = dec(blob)
                widths.append(dw)
                heights.append(dh)
                scans.append(blob.count(b"\xff\xda"))
                sums.append(sum(px))
                energies.append(sum(v * v for v in px))
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "width": widths,
                    "height": heights,
                    "n_scans": scans,
                    "pixel_sum": sums,
                    "energy": energies,
                }
            )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    jpgs = docs.mapInPandas(_synthesize, schema="media_id long, jpg binary")
    return jpgs.mapInPandas(
        _decode,
        schema="media_id long, width int, height int, n_scans int,"
        " pixel_sum long, energy long",
    )


# ------------------------------------------------------------- real Y4M path
Y4M_W = 8
Y4M_H = 6
Y4M_FPS = 25
Y4M_MOD = 251
Y4M_SAMPLE_STRIDE = 2  # decode-side frame sampling: every 2nd frame


@query(
    "multimodal_y4m_frames",
    oracle=f"""
        WITH v AS (
            SELECT doc_id, 3 + doc_id % 4 AS n_frames FROM documents
        ),
        px AS (
            SELECT d.doc_id, f.v AS f,
                   sum((d.doc_id * 11 + f.v * 7 + y.v * 3 + x.v) % {Y4M_MOD}) AS fsum
            FROM v d,
                 (SELECT unnest(generate_series(0, 6)) AS v) f,
                 (SELECT unnest(generate_series(0, {Y4M_H - 1})) AS v) y,
                 (SELECT unnest(generate_series(0, {Y4M_W - 1})) AS v) x
            WHERE f.v < d.n_frames
            GROUP BY d.doc_id, f.v
        )
        SELECT v.doc_id AS media_id,
               CAST({Y4M_W} AS INT) AS width,
               CAST({Y4M_H} AS INT) AS height,
               CAST(v.n_frames AS BIGINT) AS n_frames,
               CAST((SELECT sum(fsum) FROM px WHERE px.doc_id = v.doc_id)
                    AS BIGINT) AS luma_sum,
               CAST((SELECT sum(fsum) FROM px
                     WHERE px.doc_id = v.doc_id AND px.f % {Y4M_SAMPLE_STRIDE} = 0)
                    AS BIGINT) AS sampled_luma_sum
        FROM v
    """,
    doc="REAL video container path (no stub, stdlib-only): per "
    f"document a {Y4M_W}x{Y4M_H} monochrome YUV4MPEG2 (.y4m) stream — "
    "the uncompressed interchange format ffmpeg/mpv read directly — "
    "is ENCODED from deterministic luma planes (proper "
    "'YUV4MPEG2 W.. H.. F..:1 Ip A1:1 Cmono' stream header and "
    "per-frame FRAME markers), then DECODED BACK by an independent "
    "mapInPandas stage that parses the header fields, walks the "
    "frame markers, and computes total and stride-sampled luma sums "
    "— frame sampling running ON DECODED BYTES, completing "
    "multimodal_frame_sample's metadata-only plan with a real "
    "container walk. The oracle recomputes every sum from the pixel "
    "formula (never touching Y4M), so a hash match proves the "
    "encode->container->decode round-trip byte-faithful. What stays "
    "gated behind NotImplementedError is only COMPRESSED codecs "
    "(H.264 etc., needs ffmpeg); the container/framing/sampling "
    "plumbing — the Spark-side engineering — is all real. Both "
    "stages Arrow-batched mapInPandas, embarrassingly parallel, zero "
    "shuffle.",
    tags=("multimodal", "video"),
)
def multimodal_y4m_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    apply_runtime_confs(spark)
    w, h, fps, mod, stride = Y4M_W, Y4M_H, Y4M_FPS, Y4M_MOD, Y4M_SAMPLE_STRIDE

    def _synthesize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            payloads = []
            for mid in b["doc_id"]:
                m = int(mid)
                n_frames = 3 + m % 4
                out = bytearray()
                out += f"YUV4MPEG2 W{w} H{h} F{fps}:1 Ip A1:1 Cmono\n".encode()
                for f in range(n_frames):
                    out += b"FRAME\n"
                    out += bytes(
                        (m * 11 + f * 7 + y * 3 + x) % mod
                        for y in range(h)
                        for x in range(w)
                    )
                payloads.append(bytes(out))
            yield pd.DataFrame({"media_id": b["doc_id"], "y4m": payloads})

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            width, height, n_frames, luma, sampled = [], [], [], [], []
            for payload in b["y4m"]:
                data = bytes(payload)
                nl = data.index(b"\n")
                header = data[:nl].decode()
                fields = header.split()
                assert fields[0] == "YUV4MPEG2", header
                params = {f[0]: f[1:] for f in fields[1:]}
                fw, fh = int(params["W"]), int(params["H"])
                assert params["C"] == "mono", params
                frame_bytes = fw * fh
                pos = nl + 1
                nf = 0
                total = 0
                samp = 0
                while pos < len(data):
                    fnl = data.index(b"\n", pos)
                    assert data[pos:fnl].split(b" ")[0] == b"FRAME"
                    frame = data[fnl + 1 : fnl + 1 + frame_bytes]
                    assert len(frame) == frame_bytes
                    s = sum(frame)
                    total += s
                    if nf % stride == 0:
                        samp += s
                    nf += 1
                    pos = fnl + 1 + frame_bytes
                width.append(fw)
                height.append(fh)
                n_frames.append(nf)
                luma.append(total)
                sampled.append(samp)
            yield pd.DataFrame(
                {
                    "media_id": b["media_id"],
                    "width": width,
                    "height": height,
                    "n_frames": n_frames,
                    "luma_sum": luma,
                    "sampled_luma_sum": sampled,
                }
            )

    docs = load(spark, sf_dir, "documents").select("doc_id")
    vids = docs.mapInPandas(_synthesize, schema="media_id long, y4m binary")
    return vids.mapInPandas(
        _decode,
        schema="media_id long, width int, height int, n_frames long, "
        "luma_sum long, sampled_luma_sum long",
    )
