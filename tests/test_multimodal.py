"""Multimodal plumbing units (X5): resize verb keeps the MEDIA_SCHEMA
contract so resized media composes with the rest of the pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from minerva_etl_46_spark.operators.multimodal import (
    extract_features,
    resize_media,
    wrap_as_media,
)

SF = "/root/testdata/sf0.001"


def _media(spark, n=100):
    docs = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .filter(F.col("doc_id") < n)
    )
    return wrap_as_media(docs, "doc_id", "text")


def test_resize_preserves_schema_and_updates_meta(spark):
    media = _media(spark).localCheckpoint(eager=True)
    out = resize_media(media, target=64)
    # simpleString ignores nullability flags (mapInPandas marks all fields
    # nullable) — the structural contract is what downstream ops consume
    assert out.schema.simpleString() == media.schema.simpleString(), \
        "resize must preserve MEDIA_SCHEMA"
    rows = out.select(
        "media_id",
        F.length("payload").alias("n"),
        F.col("meta.n_bytes").alias("meta_n"),
        F.col("meta.kind").alias("kind"),
    ).collect()
    assert len(rows) == media.count()
    for r in rows:
        assert r["n"] <= 64, f"payload not shrunk: {r['n']}"
        assert r["meta_n"] == r["n"], "meta.n_bytes not updated to resized size"
        assert r["kind"] == "text", "non-size meta fields must survive"


def test_resize_composes_with_feature_extraction(spark):
    media = _media(spark).localCheckpoint(eager=True)
    feats = extract_features(resize_media(media, target=64)).collect()
    assert len(feats) == media.count()
    assert all(f["n_bytes"] <= 64 for f in feats)


def test_phash_banding_finds_every_pair_below_band_count(spark):
    """Pigeonhole guarantee of phash_near_dup_pairs: with 6 bands, any
    pair at hamming < 6 shares a clean band and MUST be emitted; the
    exact verify must report the planted distance."""
    import random

    from pyspark.sql import functions as F

    from minerva_etl_46_spark.operators.multimodal import (
        PHASH_BITS,
        phash_near_dup_pairs,
    )

    rng = random.Random(42)
    rows = []
    planted = {}
    for i in range(50):
        base = rng.getrandbits(PHASH_BITS)
        d = rng.randrange(0, 6)  # hamming < n_bands
        flipped = base
        for bit in rng.sample(range(PHASH_BITS), d):
            flipped ^= 1 << bit
        rows += [(2 * i, base), (2 * i + 1, flipped)]
        planted[(2 * i, 2 * i + 1)] = d
    hashes = spark.createDataFrame(rows, schema="media_id long, phash long")
    got = {
        (r.a_id, r.b_id): r.hamming
        for r in phash_near_dup_pairs(hashes, max_hamming=5).collect()
    }
    for pair, d in planted.items():
        assert got.get(pair) == d, (pair, d, got.get(pair))


def test_real_wav_codec_through_arrow_path(spark):
    """The decode swap-point with a REAL codec: synthesize PCM WAVs with
    KNOWN sample values, ship them as binary payloads through the full
    wrap→Arrow-batch→mapInPandas path, and verify frame counts and mean
    |amplitude| exactly. Proves binary payloads survive Arrow transport
    byte-for-byte and that any picklable `bytes -> features` codec slots
    in with zero Spark-side changes (PIL/soundfile do the same)."""
    import io
    import struct
    import wave

    from minerva_etl_46_spark.operators.multimodal import (
        extract_features,
        wav_decode,
    )

    def make_wav(samples: list[int]) -> bytes:
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(1)
            w.setsampwidth(2)
            w.setframerate(8000)
            w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
        return buf.getvalue()

    fixtures = {
        1: [0, 1000, -1000, 500],        # mean |amp| = 625.0
        2: [100] * 50,                   # mean |amp| = 100.0
        3: [-32768, 32767],              # mean |amp| = 32767.5
    }
    rows = [(mid, make_wav(s)) for mid, s in fixtures.items()]
    media = spark.createDataFrame(rows, "media_id long, payload binary").select(
        "media_id", "payload",
        F.lit(None).cast(
            "struct<kind:string,mime:string,n_bytes:bigint,"
            "width:int,height:int,sample_rate:int>").alias("meta"),
    )
    got = {r.media_id: r for r in
           extract_features(media, decode=wav_decode).collect()}
    for mid, samples in fixtures.items():
        r = got[mid]
        assert r.n_frames == len(samples)
        assert r.feat_mean == sum(abs(v) for v in samples) / len(samples)
        assert r.n_bytes == len(rows[mid - 1][1])


def test_real_bmp_codec_through_arrow_path(spark):
    """Image-leg twin of the WAV test: hand-packed 24-bit BI_RGB BMPs
    with known pixel values decode through the same mapInPandas path
    to exact dimensions and mean intensity."""
    import struct

    from minerva_etl_46_spark.operators.multimodal import (
        bmp_decode,
        extract_features,
    )

    def make_bmp(width: int, height: int, rgb: tuple[int, int, int]) -> bytes:
        row_bytes = (width * 3 + 3) // 4 * 4
        img = bytearray()
        for _ in range(height):
            row = bytes(rgb[::-1]) * width  # BMP stores BGR
            img += row + b"\x00" * (row_bytes - len(row))
        header = struct.pack("<2sIHHI", b"BM", 54 + len(img), 0, 0, 54)
        dib = struct.pack("<IiiHHIIiiII", 40, width, height, 1, 24,
                          0, len(img), 2835, 2835, 0, 0)
        return header + dib + bytes(img)

    fixtures = {
        1: (4, 3, (10, 20, 30)),    # mean intensity = 20.0
        2: (5, 2, (255, 255, 255)), # 255.0
        3: (1, 1, (0, 0, 90)),      # 30.0
    }
    rows = [(mid, make_bmp(*args)) for mid, args in fixtures.items()]
    media = spark.createDataFrame(rows, "media_id long, payload binary").select(
        "media_id", "payload",
        F.lit(None).cast(
            "struct<kind:string,mime:string,n_bytes:bigint,"
            "width:int,height:int,sample_rate:int>").alias("meta"),
    )
    got = {r.media_id: r for r in
           extract_features(media, decode=bmp_decode).collect()}
    for mid, (w, h, rgb) in fixtures.items():
        r = got[mid]
        assert r.n_frames == w * h
        assert r.feat_mean == sum(rgb) / 3
