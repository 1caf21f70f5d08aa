"""Property tests for the vendored media codecs (operators/codecs.py):
encode/decode roundtrips over randomized dimensions, payloads, and
sample streams — the pure-Python layer under the multimodal decode
stage, so no SparkSession needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from golang_cassandra_kafka_feed_spark.operators.codecs import (
    decode_bmp,
    decode_png,
    decode_wav,
    encode_bmp,
    encode_png,
    encode_wav,
)


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    data=st.data(),
)
def test_bmp_roundtrip_property(w, h, data):
    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * h * 3,
                max_size=w * h * 3,
            )
        )
    )
    raw = encode_bmp(w, h, rgb)
    # encoded size = headers + padded rows
    assert len(raw) == 54 + ((w * 3 + 3) & ~3) * h
    assert decode_bmp(raw) == (w, h, rgb)


@settings(max_examples=200, deadline=None)
@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767),
        min_size=0,
        max_size=64,
    ),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
    channels=st.integers(min_value=1, max_value=2),
)
def test_wav_roundtrip_property(samples, rate, channels):
    raw = encode_wav(samples, sample_rate=rate, n_channels=channels)
    assert decode_wav(raw) == (rate, channels, samples)


@settings(max_examples=100, deadline=None)
@given(junk=st.binary(min_size=0, max_size=64))
def test_decoders_reject_junk_without_crashing(junk):
    """Arbitrary bytes either raise MediaFormatError or decode to a
    structurally valid result — never an unhandled struct/index error."""
    from golang_cassandra_kafka_feed_spark.operators.codecs import (
        MediaFormatError,
    )

    for dec in (decode_bmp, decode_png, decode_wav):
        try:
            out = dec(junk)
        except MediaFormatError:
            continue
        assert isinstance(out, tuple) and len(out) == 3


@settings(max_examples=150, deadline=None)
@given(
    body=st.binary(min_size=0, max_size=40),
    size=st.integers(min_value=0, max_value=0xFFFFFFFF),
)
def test_wav_semi_valid_riff_prefixes_fail_cleanly(body, size):
    """RIFF/WAVE framing with arbitrary claimed chunk sizes and
    truncated bodies must raise MediaFormatError, never a raw
    struct.error (chunk sizes are attacker/corruption-controlled)."""
    import struct as _s

    from golang_cassandra_kafka_feed_spark.operators.codecs import (
        MediaFormatError,
    )

    raw = (
        b"RIFF" + _s.pack("<I", min(size, 0xFFFFFFFF)) + b"WAVE"
        + b"fmt " + _s.pack("<I", size) + body
    )
    try:
        out = decode_wav(raw)
    except MediaFormatError:
        return
    assert isinstance(out, tuple) and len(out) == 3


@settings(max_examples=200, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=12),
    h=st.integers(min_value=1, max_value=12),
    ftype=st.integers(min_value=0, max_value=4),
    data=st.data(),
)
def test_png_roundtrip_property_all_filters(w, h, ftype, data):
    """encode(filter f) -> decode is the identity for EVERY spec filter
    type (None/Sub/Up/Average/Paeth): real encoders choose filters per
    scanline, so the decoder must invert all five."""
    rgb = bytes(
        data.draw(
            st.lists(
                st.integers(0, 255),
                min_size=w * h * 3,
                max_size=w * h * 3,
            )
        )
    )
    raw = encode_png(w, h, rgb, filter_type=ftype)
    assert decode_png(raw) == (w, h, rgb)


@settings(max_examples=100, deadline=None)
@given(
    w=st.integers(min_value=1, max_value=6),
    h=st.integers(min_value=1, max_value=6),
    flip_at=st.integers(min_value=8, max_value=200),
)
def test_png_corruption_raises_format_error(w, h, flip_at):
    """Flipping any byte past the signature either raises
    MediaFormatError (CRC / zlib / filter / header check) or — only
    when the flip lands in a length field that still frames validly —
    never crashes with an unhandled error."""
    from golang_cassandra_kafka_feed_spark.operators.codecs import (
        MediaFormatError,
    )

    raw = bytearray(encode_png(w, h, bytes(w * h * 3)))
    if flip_at >= len(raw):
        flip_at = len(raw) - 1
    raw[flip_at] ^= 0xFF
    try:
        out = decode_png(bytes(raw))
    except MediaFormatError:
        return
    assert isinstance(out, tuple) and len(out) == 3


def test_png_negative_paths_exact():
    """Spec features we deliberately do not support fail loudly with
    the reason, and structural damage is named."""
    import struct as _s
    import zlib as _z

    import pytest

    from golang_cassandra_kafka_feed_spark.operators.codecs import (
        MediaFormatError,
    )

    good = encode_png(2, 2, bytes(12))

    def rechunk(ihdr_body: bytes) -> bytes:
        sig = good[:8]
        chunk = (
            _s.pack(">I", len(ihdr_body))
            + b"IHDR"
            + ihdr_body
            + _s.pack(">I", _z.crc32(b"IHDR" + ihdr_body))
        )
        rest = good[8 + 8 + 13 + 4 :]
        return sig + chunk + rest

    # interlaced
    bad = rechunk(_s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 1))
    with pytest.raises(MediaFormatError, match="interlaced"):
        decode_png(bad)
    # RGBA color type
    bad = rechunk(_s.pack(">IIBBBBB", 2, 2, 8, 6, 0, 0, 0))
    with pytest.raises(MediaFormatError, match="truecolor"):
        decode_png(bad)
    # 16-bit depth
    bad = rechunk(_s.pack(">IIBBBBB", 2, 2, 16, 2, 0, 0, 0))
    with pytest.raises(MediaFormatError, match="truecolor"):
        decode_png(bad)
    # bad CRC on IHDR
    bad = bytearray(good)
    bad[8 + 8 + 13 + 3] ^= 0xFF  # last CRC byte of IHDR
    with pytest.raises(MediaFormatError, match="CRC"):
        decode_png(bytes(bad))
    # truncated mid-chunk
    with pytest.raises(MediaFormatError):
        decode_png(good[:-6])
    # not a PNG at all
    with pytest.raises(MediaFormatError, match="signature"):
        decode_png(b"GIF89a")


def test_png_decompression_bombs_rejected():
    """Untrusted corpus bytes: a crafted header must be rejected BEFORE
    allocation, and an IDAT stream inflating past the header's claimed
    size must stop at the bound (DEFLATE expands >1000:1)."""
    import struct as _s
    import zlib as _z

    import pytest

    from golang_cassandra_kafka_feed_spark.operators.codecs import (
        _PNG_SIG,
        MediaFormatError,
        _png_chunk,
    )

    # absurd claimed dimensions, tiny actual stream
    ihdr = _s.pack(">IIBBBBB", 100_000, 100_000, 8, 2, 0, 0, 0)
    bomb = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(b"\x00" * 10))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(MediaFormatError, match="decode limit"):
        decode_png(bomb)

    # small claimed dimensions, oversize actual stream
    ihdr = _s.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0)
    bomb = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", _z.compress(b"\x00" * 1000))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(MediaFormatError, match="expected exactly"):
        decode_png(bomb)


def test_png_duplicate_ihdr_rejected():
    """A second IHDR must not silently redefine the geometry after
    IDAT data has accumulated (round-6 advice)."""
    import struct as _s

    import pytest

    from golang_cassandra_kafka_feed_spark.operators.codecs import (
        MediaFormatError,
        _png_chunk,
    )

    good = encode_png(2, 2, bytes(12))
    sig, rest = good[:8], good[8:]
    second = _png_chunk(b"IHDR", _s.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 0))
    # splice the second IHDR right after the first chunk
    first_len = 8 + 13 + 4
    doctored = sig + rest[:first_len] + second + rest[first_len:]
    with pytest.raises(MediaFormatError, match="duplicate IHDR"):
        decode_png(doctored)


def test_png_trailing_garbage_after_zlib_stream_rejected():
    """Bytes inside IDAT after the DEFLATE stream end mean a malformed
    file; it must raise, not decode (round-6 advice)."""
    import struct as _s
    import zlib as _z

    import pytest

    from golang_cassandra_kafka_feed_spark.operators.codecs import (
        _PNG_SIG,
        MediaFormatError,
        _png_chunk,
    )

    # valid 1x1 stream (1 filter byte + 3 RGB bytes) + trailing junk
    scan = _z.compress(bytes(4))
    ihdr = _s.pack(">IIBBBBB", 1, 1, 8, 2, 0, 0, 0)
    doctored = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", scan + b"JUNK")
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(MediaFormatError, match="trailing bytes"):
        decode_png(doctored)


# -- JPEG / MP3 header parsers (header-only metadata) ------------------------


@given(
    w=st.integers(1, 0xFFFF),
    h=st.integers(1, 0xFFFF),
    ncomp=st.sampled_from([1, 3, 4]),
    prog=st.booleans(),
)
@settings(max_examples=60, deadline=None)
def test_jpeg_header_roundtrip_property(w, h, ncomp, prog):
    from golang_cassandra_kafka_feed_spark.operators.codecs import (
        encode_jpeg_header,
        jpeg_header,
    )

    assert jpeg_header(encode_jpeg_header(w, h, ncomp, prog)) == (
        w, h, ncomp, prog,
    )


@given(
    rate=st.sampled_from(
        [44100, 48000, 32000, 22050, 24000, 16000, 11025, 12000, 8000]
    ),
    ch=st.sampled_from([1, 2]),
    kbps=st.sampled_from([32, 64, 128, 160]),
    id3_pad=st.integers(0, 64),
)
@settings(max_examples=60, deadline=None)
def test_mp3_header_roundtrip_property(rate, ch, kbps, id3_pad):
    """Roundtrip through the frame-header builder, with and without a
    leading ID3v2 tag of arbitrary (syncsafe) size."""
    from golang_cassandra_kafka_feed_spark.operators.codecs import (
        encode_mp3_frame,
        mp3_frame_header,
    )

    frame = encode_mp3_frame(rate, ch, kbps)
    assert mp3_frame_header(frame) == (rate, ch, kbps)
    tagged = (
        b"ID3" + bytes([4, 0, 0]) + bytes([0, 0, 0, id3_pad])
        + b"\x00" * id3_pad + frame
    )
    assert mp3_frame_header(tagged) == (rate, ch, kbps)


@given(junk=st.binary(min_size=0, max_size=64))
@settings(max_examples=120, deadline=None)
def test_header_parsers_reject_junk_without_crashing(junk):
    """Malformed bytes raise MediaFormatError (never IndexError /
    struct.error) — untrusted-crawl-payload hygiene."""
    import pytest

    from golang_cassandra_kafka_feed_spark.operators.codecs import (
        MediaFormatError,
        jpeg_header,
        mp3_frame_header,
    )

    for parser, magic in ((jpeg_header, b"\xff\xd8"), (mp3_frame_header, b"")):
        for raw in (junk, magic + junk):
            try:
                parser(raw)
            except MediaFormatError:
                pass
            except Exception as e:  # pragma: no cover
                pytest.fail(f"{parser.__name__} leaked {type(e).__name__}: {e}")


def test_jpeg_header_walks_past_other_segments():
    """SOF found after DQT/DHT/COM segments; SOS-before-SOF and
    truncated streams reject loudly."""
    import pytest

    from golang_cassandra_kafka_feed_spark.operators.codecs import (
        MediaFormatError,
        encode_jpeg_header,
        jpeg_header,
    )

    full = encode_jpeg_header(300, 200)
    soi, rest = full[:2], full[2:]
    dqt = b"\xff\xdb" + (3).to_bytes(2, "big") + b"\x00"
    com = b"\xff\xfe" + (9).to_bytes(2, "big") + b"crawled"
    assert jpeg_header(soi + dqt + com + rest)[:2] == (300, 200)

    sos_first = soi + b"\xff\xda" + (3).to_bytes(2, "big") + b"\x00"
    with pytest.raises(MediaFormatError, match="SOS before SOF"):
        jpeg_header(sos_first)
    with pytest.raises(MediaFormatError, match="no SOF"):
        jpeg_header(soi + com + b"\xff\xd9")


def test_mp3_id3v24_footer_flag_skipped():
    """An ID3v2.4 tag with the footer flag (byte 5, bit 0x10) carries a
    10-byte trailer NOT counted in the syncsafe size; the sync walk
    must skip it (review-found, round 8 — a spec-valid file used to
    reject)."""
    from golang_cassandra_kafka_feed_spark.operators.codecs import (
        encode_mp3_frame,
        mp3_frame_header,
    )

    frame = encode_mp3_frame(44100, 2, 128)
    body = b"\x00" * 20
    footer = b"3DI" + bytes([4, 0, 0x10]) + bytes(4)
    tagged = (
        b"ID3" + bytes([4, 0, 0x10]) + bytes([0, 0, 0, len(body)])
        + body + footer + frame
    )
    assert mp3_frame_header(tagged) == (44100, 2, 128)
