"""Hostile-bytes gate for the binary media decoders (VERDICT r12 item 3):
truncated headers, lying RIFF/BMP length fields, zero- and one-byte
payloads, declared sample-width lies — the sources/avro.py r10 hardening
discipline (zero-width caps, bomb guards) applied to wav_decode and
bmp_decode. Contract: a decoder either returns an honest row or raises
cleanly (NotImplementedError for formats it doesn't speak, ValueError for
corrupt bytes in a format it does) — it never hangs and never returns a
confidently-wrong row computed over bytes that aren't what the header
claims."""

from __future__ import annotations

import io
import struct
import wave

import pytest

from minerva_etl_46_spark.operators.multimodal import bmp_decode, wav_decode


def _wav(n_frames=8, sampwidth=2, n_channels=1, framerate=8000):
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(n_channels)
        w.setsampwidth(sampwidth)
        w.setframerate(framerate)
        if sampwidth == 2:
            w.writeframes(struct.pack(f"<{n_frames}h",
                                      *range(0, n_frames * 100, 100)))
        else:
            w.writeframes(bytes(range(128, 128 + n_frames)))
    return buf.getvalue()


def _bmp(width=2, height=2, data_off=54, declared_height=None,
         declared_off=None, bpp=24, compression=0):
    row_bytes = (width * 3 + 3) // 4 * 4
    pixels = bytes(range(40, 40 + height * row_bytes))
    header = (b"BM" + struct.pack("<IHHI", 54 + len(pixels), 0, 0,
                                  data_off if declared_off is None
                                  else declared_off)
              + struct.pack("<IiiHHII", 40, width,
                            declared_height if declared_height is not None
                            else height,
                            1, bpp, compression, len(pixels))
              + b"\x00" * 16)
    assert len(header) == 54
    return header + pixels


# --- wav_decode -----------------------------------------------------------

def test_wav_valid_payload_still_decodes():
    out = wav_decode(_wav(n_frames=8))
    assert out["n_frames"] == 8
    assert out["feat_mean"] == pytest.approx(
        sum(range(0, 800, 100)) / 8)


@pytest.mark.parametrize("payload", [
    b"",                          # zero-byte
    b"\x00",                      # one-byte
    b"RIFF",                      # truncated mid-magic
    b"RIFF\xff\xff\xff\xffWAVE",  # magic only, no fmt chunk
    b"not a riff file at all" * 3,
    _wav()[:20],                  # truncated inside the fmt chunk
])
def test_wav_hostile_header_raises_cleanly(payload):
    with pytest.raises(ValueError):
        wav_decode(payload)


def test_wav_lying_data_chunk_size_raises_not_garbage():
    """Inflate the RIFF and data-chunk size fields without adding bytes:
    the header now declares 4x the frames that exist. The old decoder
    returned the DECLARED n_frames with a feature over the real bytes —
    confidently wrong; it must raise instead."""
    good = bytearray(_wav(n_frames=8, sampwidth=2))
    data_size = struct.unpack_from("<I", good, 40)[0]
    struct.pack_into("<I", good, 4, len(good) - 8 + data_size * 3)
    struct.pack_into("<I", good, 40, data_size * 4)
    with pytest.raises(ValueError, match="truncated WAV"):
        wav_decode(bytes(good))


def test_wav_lying_fmt_chunk_size_raises_valueerror_not_runtimeerror():
    """A fmt-chunk SIZE field of 0x7fffffff (bytes 16-19) makes the
    stdlib chunk helper raise a bare message-less RuntimeError, which
    previously escaped un-normalized — breaking the 'callers catch one
    thing' contract for hostile headers (r14 ADVICE)."""
    good = bytearray(_wav(n_frames=8, sampwidth=2))
    struct.pack_into("<I", good, 16, 0x7FFFFFFF)
    with pytest.raises(ValueError, match="undecodable WAV"):
        wav_decode(bytes(good))


def test_wav_truncated_pcm_payload_raises():
    good = _wav(n_frames=8)
    with pytest.raises(ValueError):
        wav_decode(good[:-5])  # header intact, data chunk short


def test_wav_unsupported_sample_width_stays_notimplemented():
    """Width-3 PCM is a FORMAT gap (soundfile territory), not corrupt
    bytes — the codec-contract class must stay NotImplementedError."""
    good = bytearray(_wav(n_frames=8, sampwidth=2))  # 16 data bytes
    # lie the fmt chunk into 24-bit: block-align (32) = 3, bits (34) = 24,
    # and declare a 15-byte data chunk (5 width-3 frames) with exactly 15
    # bytes present, so ONLY the width is wrong — the truncation check
    # must not mask the format gap
    struct.pack_into("<H", good, 32, 3)
    struct.pack_into("<H", good, 34, 24)
    struct.pack_into("<I", good, 40, 15)
    with pytest.raises(NotImplementedError, match="sample width"):
        wav_decode(bytes(good[:44 + 15]))


def test_wav_none_payload_stays_notimplemented():
    with pytest.raises(NotImplementedError):
        wav_decode(None)


# --- bmp_decode -----------------------------------------------------------

def test_bmp_valid_payload_still_decodes():
    out = bmp_decode(_bmp(width=2, height=2))
    assert out["n_frames"] == 4
    assert 0.0 < out["feat_mean"] < 255.0


@pytest.mark.parametrize("payload", [
    b"",                      # zero-byte
    b"B",                     # one-byte
    _bmp()[:53],              # one short of the minimum header
    b"XX" + _bmp()[2:],       # wrong magic
])
def test_bmp_not_a_bmp_raises_notimplemented(payload):
    with pytest.raises(NotImplementedError):
        bmp_decode(payload)


def test_bmp_lying_height_field_raises():
    # header declares 10_000 rows; payload carries 2
    with pytest.raises(ValueError, match="truncated BMP"):
        bmp_decode(_bmp(width=2, height=2, declared_height=10_000))


def test_bmp_data_offset_inside_header_raises():
    # a pixel offset of 0 would read the header bytes as pixels
    with pytest.raises(ValueError, match="offset"):
        bmp_decode(_bmp(width=2, height=2, declared_off=0))


def test_bmp_zero_width_huge_height_returns_fast_not_hangs():
    """width=0 makes row_bytes=0, which defeats the truncation bound —
    a lying height of 2^31-1 then spun the row loop two billion times on
    a 54-byte payload. Must short-circuit to an honest 0-pixel row."""
    out = bmp_decode(_bmp(width=0, height=0,
                          declared_height=2**31 - 1))
    assert out["n_frames"] == 0
    assert out["feat_mean"] == 0.0


def test_bmp_negative_width_raises():
    hdr = bytearray(_bmp(width=2, height=2))
    struct.pack_into("<i", hdr, 18, -2)
    with pytest.raises(ValueError):
        bmp_decode(bytes(hdr))


def test_bmp_negative_width_zero_height_still_raises():
    """Negative width + lying ZERO height previously slipped past the
    width<0 check because the zero short-circuit ran first and returned
    a success row (n_frames=0) — the negative-width contract must win
    (r14 ADVICE)."""
    hdr = bytearray(_bmp(width=2, height=2))
    struct.pack_into("<ii", hdr, 18, -2, 0)
    with pytest.raises(ValueError, match="negative BMP width"):
        bmp_decode(bytes(hdr))


@pytest.mark.parametrize("bpp,compression", [(8, 0), (32, 0), (24, 1)])
def test_bmp_unsupported_variants_stay_notimplemented(bpp, compression):
    with pytest.raises(NotImplementedError):
        bmp_decode(_bmp(width=2, height=2, bpp=bpp,
                        compression=compression))


# --- the Arrow/mapInPandas path fails loudly, not row-silently ------------

def test_hostile_payload_fails_the_spark_job_loudly(spark):
    """End-to-end: a corrupt payload inside a media frame must abort the
    extract_features job (Arrow batch → wav_decode raise → task failure),
    never emit a garbage feature row."""
    from pyspark.errors import PythonException

    from minerva_etl_46_spark.operators.multimodal import extract_features

    rows = [(1, _wav(n_frames=4)), (2, _wav(n_frames=8)[:-3])]
    media = spark.createDataFrame(
        rows, schema="media_id long, payload binary") \
        .selectExpr("media_id", "payload",
                    "'audio' as kind", "octet_length(payload) as n_bytes")
    with pytest.raises(PythonException, match="truncated WAV|ValueError"):
        extract_features(media, decode=wav_decode).collect()
