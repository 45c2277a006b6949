"""Multimodal plumbing: binary payload columns, metadata, mapInPandas
decode/featurize/frame-sample with the deterministic fake decoder."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from flink_sql_ai_meetingcoach_azure_spark.operators.multimodal import (
    attach_media_metadata,
    decode_and_featurize,
    sample_video_frames,
)


def _media(spark):
    rows = [
        ("m1", bytearray(b"payload-bytes-one")),
        ("m2", bytearray(b"payload-bytes-two")),
        ("m3", bytearray(b"payload-bytes-one")),  # same content as m1
    ]
    return spark.createDataFrame(rows, "media_id string, payload binary")


def test_metadata(spark):
    out = attach_media_metadata(_media(spark)).collect()
    by_id = {r["media_id"]: r for r in out}
    assert by_id["m1"]["n_bytes"] == len(b"payload-bytes-one")
    assert by_id["m1"]["content_md5"] == by_id["m3"]["content_md5"]
    assert by_id["m1"]["content_md5"] != by_id["m2"]["content_md5"]
    assert by_id["m1"]["modality"] == "image"


def test_decode_featurize_deterministic(spark):
    out = decode_and_featurize(_media(spark), height=32, width=32).collect()
    by_id = {r["media_id"]: r for r in out}
    assert len(out) == 3
    for r in out:
        assert (r["height"], r["width"]) == (32, 32)
        assert len(r["feature"]) == 64
        assert len(r["channel_means"]) == 3
        assert 0 <= r["mean_intensity"] <= 255
    # identical payload -> identical tensor -> identical features
    assert by_id["m1"]["feature"] == by_id["m3"]["feature"]
    assert by_id["m1"]["feature"] != by_id["m2"]["feature"]


def test_real_decoder_raises(spark):
    with pytest.raises(Exception, match="NotImplementedError|real image"):
        decode_and_featurize(_media(spark), decoder="real").collect()


def test_frame_sampling(spark):
    out = sample_video_frames(_media(spark).filter("media_id='m1'"), n_frames=4).collect()
    assert len(out) == 4
    assert [r["frame_idx"] for r in out] == [0, 1, 2, 3]
    # frames differ from each other
    assert len({r["frame_md5"] for r in out}) == 4


def test_metadata_predicate_before_decode(spark):
    """Metadata-only filters run JVM-side before the decode stage — the
    pattern that lets Catalyst prune work at the scan."""
    df = attach_media_metadata(_media(spark))
    small = df.filter(F.col("n_bytes") > 0).filter(F.col("modality") == "image")
    out = decode_and_featurize(small).collect()
    assert len(out) == 3


def test_parse_jpeg_header_segment_walk(spark):
    """JPEG SOF parsing is a segment WALK, not a byte search: the decoy
    'FFC0' inside the APP1 payload must not be mistaken for the frame
    header; truncated/SOS-only/non-JPEG payloads survive as
    is_jpeg=false + NULLs."""
    from flink_sql_ai_meetingcoach_azure_spark.operators.multimodal import (
        parse_jpeg_header,
    )

    app0 = "FFE000104A46494600010100000100010000"
    decoy = "FFE10008FFC0DEADBEEF"  # payload contains a fake SOF marker
    sof = "FFC00011" + "08" + "0140" + "00F0" + "03011100021101031101"
    good = bytes.fromhex("FFD8" + app0 + decoy + sof)
    no_decoy = bytes.fromhex("FFD8" + app0 + sof)
    truncated = bytes.fromhex("FFD8" + app0 + decoy + "FFC00011" + "08")
    sos_first = bytes.fromhex("FFD8" + "FFDA0008FFC0DEADBEEF")  # SOS, no SOF
    rows = [
        (1, good), (2, no_decoy), (3, truncated), (4, sos_first),
        (5, b"plain text"), (6, None),
    ]
    df = spark.createDataFrame(rows, "id int, payload binary")
    got = {r.id: (r.is_jpeg, r.width, r.height, r.precision, r.n_components)
           for r in parse_jpeg_header(df).collect()}
    assert got[1] == (True, 0x00F0, 0x0140, 8, 3)   # walk skipped the decoy
    assert got[2] == (True, 0x00F0, 0x0140, 8, 3)
    assert got[3][0] is False                        # SOF found but truncated
    assert got[4][0] is False                        # SOS payload decoy ignored
    assert got[5] == (False, None, None, None, None)
    assert got[6] == (False, None, None, None, None)


def test_parse_wav_header_riff_chunk_walk(spark):
    """WAV metadata comes from a little-endian RIFF chunk walk: the
    decoy 'fmt ' bytes inside a LIST chunk payload must not be mistaken
    for the fmt chunk; odd-sized chunk bodies hop with the RIFF even
    pad; non-RIFF/truncated payloads survive as is_wav=false + NULLs."""
    import struct

    from flink_sql_ai_meetingcoach_azure_spark.operators.multimodal import (
        parse_wav_header,
    )

    def fmt_chunk(ch, rate, bits):
        body = struct.pack("<HHIIHH", 1, ch, rate, rate * ch * bits // 8,
                           ch * bits // 8, bits)
        return b"fmt " + struct.pack("<I", len(body)) + body

    def riff(*chunks):
        body = b"WAVE" + b"".join(chunks)
        return b"RIFF" + struct.pack("<I", len(body)) + body

    decoy = b"LIST" + struct.pack("<I", 6) + b"fmt \xaa\xbb"
    odd_chunk = b"JUNK" + struct.pack("<I", 3) + b"abc\x00"  # padded to even
    rows = [
        (1, riff(decoy, fmt_chunk(2, 44100, 16))),
        (2, riff(fmt_chunk(1, 8000, 8))),
        (3, riff(odd_chunk, fmt_chunk(2, 48000, 24))),
        (4, riff(decoy)),          # no fmt chunk at all
        (5, b"RIFFxxxxAVI LIST"),  # RIFF but not WAVE
        (6, b"plain text"),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id int, payload binary")
    got = {r.id: (r.is_wav, r.audio_format, r.channels, r.sample_rate,
                  r.bits_per_sample)
           for r in parse_wav_header(df).collect()}
    assert got[1] == (True, 1, 2, 44100, 16)   # walked past the decoy
    assert got[2] == (True, 1, 1, 8000, 8)
    assert got[3] == (True, 1, 2, 48000, 24)   # odd-size pad respected
    assert got[4][0] is False
    assert got[5][0] is False
    assert got[6] == (False, None, None, None, None)
    assert got[7] == (False, None, None, None, None)
