"""Pure-stdlib media codecs: PNG (RGB8), WAV (PCM16), AVI (raw RGB24).

No media libraries ship in this environment, but these container formats
are simple published specs (PNG: RFC 2083 / ISO 15948; WAV + AVI:
Microsoft RIFF), so the multimodal operators decode them for real with
``zlib`` + ``struct`` + numpy — header parse, inflate, scanline
unfiltering (all five PNG filter types), PCM sample extraction, and AVI
``movi`` frame-chunk walking with bottom-up padded BGR DIB rows.  Video
is supported for the uncompressed (BI_RGB 24-bit 'DIB ') subset;
compressed codecs (H.264, MJPEG, ...) are out of scope — a decode
attempt raises ``ValueError`` and the operator layer turns that into a
null feature, never a batch abort.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


# ---------------------------------------------------------------------------
# PNG (8-bit RGB, color type 2)
# ---------------------------------------------------------------------------


def png_encode(rgb: np.ndarray) -> bytes:
    """Minimal spec-correct PNG writer for (h, w, 3) uint8 arrays:
    IHDR + one zlib IDAT (filter 0 per scanline) + IEND, with CRCs."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, c = rgb.shape
    assert c == 3, "RGB only"

    def chunk(tag: bytes, body: bytes) -> bytes:
        crc = zlib.crc32(tag + body) & 0xFFFFFFFF
        return struct.pack(">I", len(body)) + tag + body + struct.pack(">I", crc)

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + rgb[y].tobytes() for y in range(h))
    return (
        _PNG_SIG
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _unfilter(raw: bytes, w: int, h: int, bpp: int = 3) -> np.ndarray:
    """Reverse PNG scanline filtering (types 0-4 per the spec)."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    pos = 0
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        ftype = raw[pos]
        pos += 1
        line = np.frombuffer(raw[pos : pos + stride], dtype=np.uint8).astype(np.int32)
        pos += stride
        cur = np.zeros(stride, dtype=np.int32)
        if ftype == 0:  # None
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        else:  # Sub / Average / Paeth need the running left pixel
            for i in range(stride):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev[i]
                c = prev[i - bpp] if i >= bpp else 0
                if ftype == 1:  # Sub
                    pred = a
                elif ftype == 3:  # Average
                    pred = (a + b) // 2
                elif ftype == 4:  # Paeth
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                else:
                    raise ValueError(f"unknown PNG filter {ftype}")
                cur[i] = (line[i] + pred) & 0xFF
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(h, w, bpp)


def png_decode(payload: bytes) -> np.ndarray:
    """(h, w, 3) uint8 from an 8-bit RGB PNG (the fixture/writer subset)."""
    if payload is None or payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = len(_PNG_SIG)
    w = h = None
    idat = b""
    while pos + 8 <= len(payload):
        length, tag = struct.unpack(">I4s", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + tag + body + crc
        if tag == b"IHDR":
            w, h, bit_depth, color_type = struct.unpack(">IIBB", body[:10])
            if bit_depth != 8 or color_type != 2:
                raise ValueError("only 8-bit RGB PNGs supported")
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    return _unfilter(zlib.decompress(idat), w, h)


def png_header(payload: bytes) -> dict:
    """width/height/bit_depth/color_type from IHDR without inflating."""
    if payload is None or payload[: len(_PNG_SIG)] != _PNG_SIG:
        raise ValueError("not a PNG")
    length, tag = struct.unpack(">I4s", payload[8:16])
    if tag != b"IHDR":
        raise ValueError("IHDR not first chunk")
    w, h, bit_depth, color_type = struct.unpack(">IIBB", payload[16:26])
    return {"width": w, "height": h, "bit_depth": bit_depth, "color_type": color_type}


# ---------------------------------------------------------------------------
# WAV (RIFF / PCM16 mono or interleaved)
# ---------------------------------------------------------------------------


def wav_encode(samples: np.ndarray, rate: int = 8000) -> bytes:
    """PCM16 mono RIFF/WAVE writer."""
    pcm = np.asarray(samples, dtype=np.int16).tobytes()
    fmt = struct.pack("<HHIIHH", 1, 1, rate, rate * 2, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_decode(payload: bytes) -> tuple[int, np.ndarray]:
    """(sample_rate, float32 samples in [-1, 1]) from a PCM16 RIFF/WAVE."""
    if payload is None or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a WAV")
    pos = 12
    rate = None
    data = None
    while pos + 8 <= len(payload):
        tag, length = struct.unpack("<4sI", payload[pos : pos + 8])
        body = payload[pos + 8 : pos + 8 + length]
        pos += 8 + length + (length & 1)  # chunks are word-aligned
        if tag == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack("<HHIIHH", body[:16])
            if audio_fmt != 1 or bits != 16:
                raise ValueError("only PCM16 supported")
        elif tag == b"data":
            data = body
    if rate is None or data is None:
        raise ValueError("missing fmt/data chunk")
    samples = np.frombuffer(data, dtype=np.int16).astype(np.float32) / 32768.0
    return rate, samples


# ---------------------------------------------------------------------------
# AVI (RIFF, uncompressed BI_RGB 24-bit 'DIB ' frames)
# ---------------------------------------------------------------------------


def _dib_row_stride(w: int) -> int:
    return (w * 3 + 3) & ~3  # DIB rows pad to 4-byte boundaries


def avi_encode(frames: np.ndarray, fps: int = 10) -> bytes:
    """Minimal spec-correct AVI writer for (n, h, w, 3) uint8 RGB frames:
    RIFF 'AVI ' + hdrl (avih, strl: strh 'vids'/'DIB ' + strf
    BITMAPINFOHEADER) + movi ('00db' uncompressed bottom-up BGR DIB
    frames) + idx1."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    assert c == 3, "RGB only"
    stride = _dib_row_stride(w)
    frame_bytes = []
    for f in frames:
        dib = np.zeros((h, stride), dtype=np.uint8)
        dib[:, : w * 3] = f[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up, BGR
        frame_bytes.append(dib.tobytes())
    frame_size = h * stride

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(kind: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", kind + body)

    avih = struct.pack(
        "<14I",
        int(1_000_000 // fps), frame_size * fps, 0, 0x10,  # AVIF_HASINDEX
        n, 0, 1, frame_size, w, h, 0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"DIB ", 0, 0, 0, 0, 1, fps, 0, n, frame_size, 0, 0,
        0, 0, w, h,
    )
    strf = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, frame_size, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00db", fb) for fb in frame_bytes)
    movi = lst(b"movi", movi_body)
    idx, off = b"", 4
    for fb in frame_bytes:
        idx += struct.pack("<4sIII", b"00db", 0x10, off, len(fb))
        off += 8 + len(fb) + (len(fb) & 1)
    body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode(payload: bytes) -> tuple[float, np.ndarray]:
    """(fps, (n, h, w, 3) uint8 RGB frames) from an uncompressed 24-bit
    BI_RGB AVI.  Compressed streams raise ValueError (out of scope)."""
    if payload is None or payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not an AVI")
    w = h = None
    fps = 0.0
    frames: list[bytes] = []

    def walk(buf: bytes) -> None:
        nonlocal w, h, fps
        pos = 0
        while pos + 8 <= len(buf):
            tag, length = struct.unpack("<4sI", buf[pos : pos + 8])
            body = buf[pos + 8 : pos + 8 + length]
            pos += 8 + length + (length & 1)
            if tag == b"LIST":
                walk(body[4:])
            elif tag == b"strh" and body[:4] == b"vids":
                scale, rate = struct.unpack("<II", body[20:28])
                fps = rate / scale if scale else 0.0
            elif tag == b"strf" and w is None:
                _, bw, bh, _, bits, compression = struct.unpack("<IiiHHI", body[:20])
                if bits != 24 or compression != 0:
                    raise ValueError("only uncompressed 24-bit AVI supported")
                if bw <= 0 or bh == 0:
                    raise ValueError("invalid frame dimensions")
                w, h = bw, abs(bh)
            elif tag[2:4] in (b"db", b"dc") and length > 0:
                frames.append(body)

    # Malformed/truncated headers surface from struct.unpack as
    # struct.error, which is NOT a ValueError — normalize so the
    # multimodal operator's null-feature fallback (which catches
    # ValueError) holds for every corrupt payload, never a batch abort.
    try:
        walk(payload[12:])
    except struct.error as exc:
        raise ValueError(f"truncated AVI structure: {exc}") from None
    if w is None or not frames:
        raise ValueError("missing stream format or frames")
    stride = _dib_row_stride(w)
    # Validate every frame against the header-declared geometry BEFORE
    # allocating: a corrupt header claiming huge bw/bh with tiny chunks
    # must raise ValueError here, not MemoryError at np.zeros (which would
    # escape the multimodal operator's null-feature catch).
    for fb in frames:
        if len(fb) < h * stride:
            raise ValueError("truncated frame")
    out = np.zeros((len(frames), h, w, 3), dtype=np.uint8)
    for i, fb in enumerate(frames):
        dib = np.frombuffer(fb[: h * stride], dtype=np.uint8).reshape(h, stride)
        out[i] = dib[:, : w * 3].reshape(h, w, 3)[::-1, :, ::-1]  # top-down, RGB
    return fps, out
