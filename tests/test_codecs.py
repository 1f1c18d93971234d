"""Pure-stdlib PNG/WAV codecs: round-trip and header parsing."""

import numpy as np
import pytest

from name_matching_spark.functions import codecs


def test_png_roundtrip_exact():
    rng = np.random.default_rng(5)
    for h, w in [(1, 1), (4, 7), (16, 16)]:
        img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        payload = codecs.png_encode(img)
        assert payload[:8] == b"\x89PNG\r\n\x1a\n"
        back = codecs.png_decode(payload)
        assert np.array_equal(back, img)
        hdr = codecs.png_header(payload)
        assert (hdr["width"], hdr["height"]) == (w, h)
        assert hdr["bit_depth"] == 8 and hdr["color_type"] == 2


def test_png_unfilter_all_types():
    # hand-build a 2x2 image with each filter type and check the spec math
    import struct
    import zlib

    img = np.array([[[10, 20, 30], [40, 50, 60]],
                    [[70, 80, 90], [100, 110, 120]]], dtype=np.uint8)
    # Sub filter on row 0: line = cur - left; Up filter on row 1: cur - prev
    row0 = img[0].astype(np.int32).reshape(-1)
    sub = row0.copy()
    sub[3:] = (row0[3:] - row0[:-3]) % 256
    row1 = img[1].astype(np.int32).reshape(-1)
    up = (row1 - row0) % 256
    raw = b"\x01" + bytes(sub.astype(np.uint8)) + b"\x02" + bytes(up.astype(np.uint8))

    def chunk(tag, body):
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    payload = (b"\x89PNG\r\n\x1a\n"
               + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
               + chunk(b"IDAT", zlib.compress(raw))
               + chunk(b"IEND", b""))
    assert np.array_equal(codecs.png_decode(payload), img)


def test_wav_roundtrip():
    rng = np.random.default_rng(6)
    pcm = (rng.uniform(-1, 1, size=800) * 20000).astype(np.int16)
    payload = codecs.wav_encode(pcm, rate=8000)
    rate, back = codecs.wav_decode(payload)
    assert rate == 8000
    assert np.allclose(back * 32768.0, pcm.astype(np.float32))


def test_avi_roundtrip_exact():
    rng = np.random.default_rng(7)
    for n, h, w in [(1, 4, 4), (3, 5, 7), (6, 8, 3)]:  # w=3,7: stride padding
        frames = rng.integers(0, 256, size=(n, h, w, 3), dtype=np.uint8)
        payload = codecs.avi_encode(frames, fps=10)
        assert payload[:4] == b"RIFF" and payload[8:12] == b"AVI "
        fps, back = codecs.avi_decode(payload)
        assert fps == 10.0
        assert np.array_equal(back, frames)


def test_avi_rejects_compressed():
    # flip biCompression in strf to a nonzero FourCC: must raise, not
    # silently misparse (compressed codecs are declared out of scope)
    frames = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    payload = bytearray(codecs.avi_encode(frames))
    i = payload.index(b"strf")
    payload[i + 8 + 16 : i + 8 + 20] = b"MJPG"
    with pytest.raises(ValueError):
        codecs.avi_decode(bytes(payload))


def test_avi_truncated_structures_raise_valueerror():
    """Malformed headers must surface as ValueError (the multimodal
    operator's null-feature catch), never struct.error (batch abort)."""
    import struct

    # strf chunk whose body is too short for the BITMAPINFOHEADER unpack
    short_strf = (
        b"RIFF" + struct.pack("<I", 16) + b"AVI " + b"strf" + struct.pack("<I", 4) + b"\x00" * 4
    )
    with pytest.raises(ValueError):
        codecs.avi_decode(short_strf)
    # strh 'vids' chunk too short for the scale/rate unpack
    short_strh = (
        b"RIFF" + struct.pack("<I", 20) + b"AVI " + b"strh" + struct.pack("<I", 8) + b"vids" + b"\x00" * 4
    )
    with pytest.raises(ValueError):
        codecs.avi_decode(short_strh)


def test_avi_zero_height_rejected():
    # biHeight=0 must raise at decode, not ZeroDivisionError in the
    # feature aspect-ratio math downstream
    frames = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    payload = bytearray(codecs.avi_encode(frames))
    i = payload.index(b"strf")
    payload[i + 8 + 8 : i + 8 + 12] = (0).to_bytes(4, "little")  # biHeight
    with pytest.raises(ValueError):
        codecs.avi_decode(bytes(payload))


def test_avi_huge_declared_dims_rejected_before_allocation():
    # header claims 50000x50000 while the frame chunk is tiny: must raise
    # ValueError at frame validation, not MemoryError at the 7.5 GB
    # np.zeros (MemoryError escapes the operator's null-feature catch)
    frames = np.zeros((1, 2, 2, 3), dtype=np.uint8)
    payload = bytearray(codecs.avi_encode(frames))
    i = payload.index(b"strf")
    payload[i + 8 + 4 : i + 8 + 8] = (50000).to_bytes(4, "little")  # biWidth
    payload[i + 8 + 8 : i + 8 + 12] = (50000).to_bytes(4, "little")  # biHeight
    with pytest.raises(ValueError):
        codecs.avi_decode(bytes(payload))


def test_codec_rejects_garbage():
    with pytest.raises(ValueError):
        codecs.png_decode(b"not a png at all")
    with pytest.raises(ValueError):
        codecs.wav_decode(b"RIFFxxxxJUNK")
    with pytest.raises(ValueError):
        codecs.avi_decode(b"RIFFxxxxJUNK")
