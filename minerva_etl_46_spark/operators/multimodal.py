"""Multimodal column plumbing (SURVEY.md §2.11 X5, BASELINE-mandated).

Design: media payloads are opaque ``binary`` columns + a typed metadata
struct; decode / feature-extract / resize / frame-sample run as
Arrow-batched pandas transforms over ``mapInPandas`` so each executor
processes whole record batches (the shape a real image/audio codec needs).

The heavy image/audio libs are NOT in this container, so the default
codec is stubbed (deterministic byte-level fake) behind ``decode_stub``
— the Spark-side plumbing (schema, batch iteration, partitioning) is
real and tested. The swap-point is PROVEN with a real decoder:
``wav_decode`` parses RIFF/WAVE PCM with the stdlib ``wave`` module and
runs through the identical Arrow path against synthesized fixtures with
known sample values (tests/test_multimodal.py). Swap in
PIL/soundfile/pyav the same way for the heavy formats.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: canonical multimodal record schema: payload + typed metadata
MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("meta", T.StructType([
        T.StructField("kind", T.StringType(), True),      # image|audio|video|text
        T.StructField("mime", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("width", T.IntegerType(), True),    # image/video
        T.StructField("height", T.IntegerType(), True),
        T.StructField("sample_rate", T.IntegerType(), True),  # audio
    ]), True),
])

FEATURES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("n_bytes", T.LongType(), True),
    T.StructField("n_frames", T.LongType(), True),
    T.StructField("feat_mean", T.DoubleType(), True),
])


def decode_stub(payload: bytes) -> dict:
    """Deterministic fake decode. A real build replaces this with the
    codec (PIL.Image.open / soundfile.read / pyav demux).

    Raises NotImplementedError for kinds a codec would reject — the
    pipeline's error handling is real even though the codec is fake."""
    if payload is None:
        raise NotImplementedError("real codec required for empty payload")
    frame_size = 256
    n = len(payload)
    return {
        "n_bytes": n,
        "n_frames": n // frame_size + 1,
        "feat_mean": (sum(payload) / n) if n else 0.0,
    }


def wav_decode(payload: bytes) -> dict:
    """REAL codec path — RIFF/WAVE PCM via the stdlib ``wave`` module
    (no external media libs needed, so this one runs even in this
    container): parse the header, read the PCM frames, return frame
    count and mean |amplitude|. Proves the ``decode=`` swap-point with
    an actual decoder — the same callable shape PIL/soundfile/pyav
    plug into for the heavy formats (tests/test_multimodal.py runs it
    through the full Arrow/mapInPandas path against synthesized WAVs
    with known sample values)."""
    import io
    import struct
    import wave

    if payload is None:
        raise NotImplementedError("empty payload")
    try:
        with wave.open(io.BytesIO(bytes(payload))) as w:
            n_frames = w.getnframes()
            sampwidth = w.getsampwidth()
            n_channels = w.getnchannels()
            raw = w.readframes(n_frames)
    except (wave.Error, EOFError, RuntimeError) as exc:
        # hostile/truncated headers surface from the wave module as
        # wave.Error, a bare EOFError, or — for a lying fmt-chunk SIZE
        # field (e.g. 0x7fffffff at bytes 16-19) — a message-less
        # RuntimeError from the stdlib chunk helper (r14 ADVICE);
        # normalize all three to ValueError — same class as bmp_decode's
        # corrupt-bytes path, so callers catch one thing
        raise ValueError(f"undecodable WAV: {exc}") from exc
    if len(raw) != n_frames * sampwidth * n_channels:
        # a data-chunk size field that LIES about the payload (declares
        # more frames than bytes present) previously returned the
        # declared n_frames with a feature computed over the bytes that
        # actually exist — confidently wrong with no error. Same loud-
        # failure rule as bmp_decode's truncation check.
        raise ValueError(
            f"truncated WAV: header declares {n_frames} frames "
            f"({n_frames * sampwidth * n_channels} bytes), "
            f"{len(raw)} present")
    if sampwidth == 2:
        vals = struct.unpack(f"<{len(raw) // 2}h", raw)
        feat = (sum(abs(v) for v in vals) / len(vals)) if vals else 0.0
    elif sampwidth == 1:  # 8-bit PCM is unsigned, centered at 128
        feat = (sum(abs(b - 128) for b in raw) / len(raw)) if raw else 0.0
    else:
        raise NotImplementedError(f"sample width {sampwidth} needs soundfile")
    return {"n_bytes": len(payload), "n_frames": n_frames,
            "feat_mean": float(feat)}


def bmp_decode(payload: bytes) -> dict:
    """REAL codec path for the IMAGE leg — uncompressed 24-bit BMP
    (BITMAPINFOHEADER, BI_RGB) parsed with ``struct`` alone: width ×
    height from the DIB header, mean pixel intensity over the padded
    scanlines. Same callable shape as ``wav_decode``/``decode_stub`` —
    PIL slots into the identical seam for the compressed formats."""
    import struct

    if payload is None or len(payload) < 54 or payload[:2] != b"BM":
        raise NotImplementedError("not an uncompressed BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    width, height = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError("only 24-bit BI_RGB without PIL")
    height = abs(height)
    row_bytes = (width * 3 + 3) // 4 * 4
    if data_off < 54:
        # a pixel offset pointing INSIDE the header would silently
        # compute the feature over header bytes (r13 hostile-bytes gate)
        raise ValueError(f"BMP pixel data offset {data_off} inside the "
                         "54-byte header")
    if width < 0:
        # checked BEFORE the zero short-circuit: negative width + lying
        # zero height previously returned a success row instead of
        # raising like every other negative-width header (r14 ADVICE)
        raise ValueError(f"negative BMP width {width}")
    if width == 0 or height == 0:
        # short-circuit BEFORE the row loop: width=0 makes row_bytes=0,
        # which defeats the truncation bound below, and a lying
        # height=2^31 would then spin the loop two billion times on a
        # 60-byte payload (hostile-bytes hang, r13)
        return {"n_bytes": len(payload), "n_frames": 0, "feat_mean": 0.0}
    if data_off + height * row_bytes > len(payload):
        # a truncated pixel array previously yielded EMPTY slices and a
        # confidently wrong feat_mean with no error (r10 review) — fail
        # loudly like wav_decode's wave-module errors; ValueError (not
        # NotImplementedError) because the format IS supported, the
        # bytes are corrupt
        raise ValueError(
            f"truncated BMP: header declares {height}x{width} 24-bit "
            f"pixels at offset {data_off} "
            f"({data_off + height * row_bytes} bytes needed, "
            f"{len(payload)} present)")
    total = 0
    for r in range(height):
        row = payload[data_off + r * row_bytes:
                      data_off + r * row_bytes + width * 3]
        total += sum(row)
    n_px = width * height
    return {"n_bytes": len(payload), "n_frames": n_px,
            "feat_mean": (total / (n_px * 3)) if n_px else 0.0}


def wrap_as_media(df: DataFrame, id_col: str, text_col: str, kind: str = "text") -> DataFrame:
    """Lift any table into the multimodal record shape (payload = utf-8
    bytes here; parquet binary column in a real corpus)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(kind).alias("kind"),
            F.lit("text/plain").alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def extract_features(media: DataFrame, batch_hint: int | None = None,
                     decode=decode_stub) -> DataFrame:
    """Arrow-batched feature extraction over mapInPandas: the executor-side
    loop a real decoder would run. The extraction itself is row-local, but
    a small round-robin repartition (``spread``) precedes it so CPU-bound
    decode parallelizes even from few input partitions — one deliberate
    shuffle of opaque bytes. At 100 TB the input is already many partitions
    and that repartition is a rounding error next to decode cost;
    pre-partitioned inputs keep batches local.

    ``decode`` is the codec swap-in point: pass any picklable callable
    ``bytes -> {"n_bytes": int, "n_frames": int, "feat_mean": float}``
    and it runs inside the executor's Arrow batches — e.g.::

        def pil_decode(payload):
            img = PIL.Image.open(io.BytesIO(payload))
            arr = np.asarray(img)
            return {"n_bytes": len(payload), "n_frames": 1,
                    "feat_mean": float(arr.mean())}

        extract_features(media, decode=pil_decode)

    No Spark-side change is needed: schema, batching, and partitioning are
    codec-independent (this container has no media libs, so the default
    stays the deterministic stub)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # a NULL payload is MISSING DATA, not an undecodable format:
            # emit a null-feature row (one row per media id, like every
            # per-record stat here) instead of letting the codec raise
            # and kill the whole job on one absent blob (r11
            # adversarial-docs parity; the oracle's left join mirrors
            # this). Undecodable NON-null payloads still raise — that is
            # the codec contract.
            feats = [decode(p) if p is not None
                     else {"n_bytes": None, "n_frames": None,
                           "feat_mean": None}
                     for p in pdf["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", pdf["media_id"].values)
            yield out[["media_id", "n_bytes", "n_frames", "feat_mean"]]

    from minerva_etl_46_spark.operators.dedup import spread

    # decode is the expensive stage: spread small inputs across all cores
    return spread(media).mapInPandas(run, schema=FEATURES_SCHEMA)


FRAMES_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_idx", T.LongType(), False),
    T.StructField("frame_bytes", T.LongType(), True),
    T.StructField("frame_sum", T.LongType(), True),
])


def sample_frames(media: DataFrame, frame_size: int = 256,
                  every_k: int = 4) -> DataFrame:
    """Frame sampling: split each payload into fixed-size frames and keep
    every k-th (the video-keyframe shape). Real chunk iteration over
    Arrow batches; a codec would decode each kept frame where frame_sum
    stands in. Output rows ∝ payload bytes / (frame_size * k) — the
    executor-side fan-out a frame pipeline needs, no driver involvement."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                for idx in range(0, len(payload) // frame_size + 1, every_k):
                    chunk = payload[idx * frame_size:(idx + 1) * frame_size]
                    if not chunk:
                        continue
                    rows.append({
                        "media_id": mid, "frame_idx": idx,
                        "frame_bytes": len(chunk), "frame_sum": sum(chunk),
                    })
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_bytes", "frame_sum"]
            )

    from minerva_etl_46_spark.operators.dedup import spread

    return spread(media).mapInPandas(run, schema=FRAMES_SCHEMA)


def resize_stub(payload: bytes, target: int = 64) -> bytes:
    """Deterministic fake resize: byte-stride downsample to ~target bytes.
    A real build swaps in PIL's Image.resize; the signature and the
    batch plumbing (see sample_frames) are what the pipeline depends on."""
    if payload is None:
        raise NotImplementedError("real codec required")
    stride = max(1, len(payload) // target)
    return payload[::stride][:target]


def resize_media(media: DataFrame, target: int = 64,
                 resize=resize_stub) -> DataFrame:
    """X5 'resize' verb as a DataFrame op: payload replaced in place, meta
    n_bytes updated, schema preserved — so resized media flows back into
    the same MEDIA_SCHEMA pipeline (extract_features / sample_frames).
    ``resize`` is injectable exactly like extract_features' ``decode``
    (pass a PIL-backed callable in a real deployment); the default stub
    keeps the Arrow plumbing testable without media libs. The per-row
    transform is narrow, but a small round-robin repartition (``spread``)
    precedes it so CPU-bound decode work parallelizes even when the input
    arrives in few partitions — one cheap shuffle of opaque bytes, bought
    deliberately."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pdf.copy()
            resized = [resize(p, target) if p is not None else None
                       for p in pdf["payload"]]
            out["payload"] = resized
            out["meta"] = [
                None if m is None else
                {**m, "n_bytes": None if p is None else len(p)}
                for m, p in zip(pdf["meta"], resized)
            ]
            yield out

    from minerva_etl_46_spark.operators.dedup import spread

    return spread(media).mapInPandas(run, schema=MEDIA_SCHEMA)


PHASH_BITS = 60  # signed-bigint-safe (2^59 < 2^63); 6 bands x 10 bits

PHASH_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("phash", T.LongType(), True),
])


def phash_stub(payload: bytes, bits: int = PHASH_BITS) -> int:
    """Deterministic fake perceptual hash — the codec-free stand-in for
    pHash/aHash over decoded pixels: bytes fold into ``bits`` round-robin
    chunks and bit c is set iff chunk c's sum is above the per-chunk
    mean (integer compare ``chunk_sum*bits > total`` — no division, so
    exactly replayable in SQL). Appending/perturbing a few bytes flips
    few bits, so near-identical payloads land at small hamming distance
    — the property the near-dup pipeline needs. A real build swaps in an
    image pHash (DCT of the decoded luma); signature and banding are
    codec-independent."""
    if payload is None:
        raise NotImplementedError("real codec required for empty payload")
    import numpy as np

    arr = np.frombuffer(payload, dtype=np.uint8)
    if arr.size == 0:
        return 0
    sums = np.bincount(
        np.arange(arr.size) % bits, weights=arr, minlength=bits
    ).astype(np.int64)
    total = int(sums.sum())
    h = 0
    for c in range(bits):
        if int(sums[c]) * bits > total:
            h |= 1 << c
    return h


def perceptual_hash(media: DataFrame, hasher=phash_stub) -> DataFrame:
    """X5: per-media perceptual hash over the same Arrow-batched
    mapInPandas plumbing as extract_features; ``hasher`` is the codec
    swap-in point (pass a PIL/DCT pHash in a real deployment)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"].values,
                "phash": [hasher(p) for p in pdf["payload"]],
            })

    from minerva_etl_46_spark.operators.dedup import spread

    return spread(media).mapInPandas(run, schema=PHASH_SCHEMA)


def phash_near_dup_pairs(hashes: DataFrame, max_hamming: int = 10,
                         n_bands: int = 6,
                         band_bits: int | None = None) -> DataFrame:
    """Banded hamming near-dup over perceptual hashes: split each hash
    into ``n_bands`` contiguous bit bands and equi-join on
    (band_idx, band_value) — pairs differing in every band are never
    generated, so the cross-product never materializes (pigeonhole: any
    pair with hamming < n_bands is guaranteed a clean band; beyond that
    recall is probabilistic, same contract as the MinHash-LSH path).
    Exact ``bit_count(xor)`` verifies candidates. Output:
    (a_id, b_id, hamming), deduped by construction via one distinct on
    the pair key.

    ``band_bits`` defaults to PHASH_BITS // n_bands — DERIVED, so tuning
    n_bands alone keeps the bands inside the hash (r10 review: a fixed
    default with n_bands=7 shifted band 6 past the top bit, a constant
    all-zero band that equi-joined the entire corpus — the exact cross
    product the banding exists to avoid). An explicit out-of-range pair
    raises."""
    if band_bits is None:
        band_bits = PHASH_BITS // n_bands
    if band_bits < 1 or n_bands * band_bits > PHASH_BITS:
        raise ValueError(
            f"n_bands={n_bands} x band_bits={band_bits} does not fit the "
            f"{PHASH_BITS}-bit hash — bands past the top bit are constant "
            "zero and cross-join the corpus")
    bands = hashes.select(
        F.col("media_id"),
        F.col("phash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(k).alias("band_idx"),
                    F.shiftright("phash", k * band_bits)
                    .bitwiseAND((1 << band_bits) - 1).alias("band_val"),
                ) for k in range(n_bands)
            ])
        ).alias("band"),
    ).select("media_id", "phash", "band.band_idx", "band.band_val")
    # r15: bands feeds BOTH self-join sides. r14 cut the lineage with a
    # localCheckpoint, which pins the band rows to executor storage and
    # is not fault-tolerant (ADVICE r14). Repartitioning on the JOIN KEY
    # instead makes the two sides byte-identical Exchange subtrees —
    # ReuseExchange runs the upstream perceptual-hash mapInPandas (the
    # expensive Python decode pass) exactly once as the map side of the
    # one shared shuffle, with zero storage pinned and full
    # recomputability (guide §2.4; canonically identical MapInPandas
    # nodes of the same function ARE reuse-equal — it is pruning-
    # divergent subtrees that defeat reuse, not Python opacity).
    bands = bands.repartition("band_idx", "band_val")
    a = bands.select(F.col("media_id").alias("a_id"),
                     F.col("phash").alias("a_hash"),
                     "band_idx", "band_val")
    b = bands.select(F.col("media_id").alias("b_id"),
                     F.col("phash").alias("b_hash"),
                     "band_idx", "band_val")
    cand = (
        a.join(b, ["band_idx", "band_val"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "a_hash", "b_hash")
        .distinct()
    )
    ham = F.bit_count(F.col("a_hash").bitwiseXOR(F.col("b_hash")))
    return (
        cand.select("a_id", "b_id", ham.cast("long").alias("hamming"))
        .filter(F.col("hamming") <= max_hamming)
    )
