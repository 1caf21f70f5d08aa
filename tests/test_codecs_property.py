"""Property tests for the vendored media codecs (operators/codecs.py):
encode/decode roundtrips over randomized dimensions, payloads, and
sample streams — the pure-Python layer under the multimodal decode
stage, so no SparkSession needed."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from golang_cassandra_kafka_feed_spark.operators.codecs import (
    decode_bmp,
    decode_wav,
    encode_bmp,
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

    for dec in (decode_bmp, decode_wav):
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
