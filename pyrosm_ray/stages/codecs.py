"""Pure-stdlib media codecs: REAL decode for PNG / BMP / PPM / WAV.

The container has no PIL/ffmpeg/soundfile, but these container formats are
fully decodable with ``zlib`` + ``wave`` + numpy from their public specs
(PNG: RFC 2083 / W3C PNG spec; BMP: BITMAPINFOHEADER layout; PPM: netpbm
P6; WAV: RIFF PCM). :mod:`pyrosm_ray.stages.multimodal` sniffs payload
magic and routes these formats through the real decoders — the
deterministic fakes remain only for formats that genuinely need an
external codec (JPEG, MP3, video).

Scope (honestly bounded): PNG 8-bit gray/gray+alpha/RGB/RGBA,
non-interlaced, all five filter types; BMP 24-bit uncompressed; PPM P6
maxval 255; WAV integer PCM 8/16/24/32-bit, any channel count. Everything
else raises ``ValueError`` naming the unsupported feature so the caller's
fallback (or error surface) is explicit.

Encoders for the same subsets are provided as the test/fixture inverse
(and to emit thumbnails); decode(encode(x)) == x is property-tested.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

PNG_SIG = b"\x89PNG\r\n\x1a\n"


def sniff_media(payload: bytes) -> str | None:
    """Container format from magic bytes: png/bmp/ppm/wav or None."""
    if payload[:8] == PNG_SIG:
        return "png"
    if payload[:2] == b"BM":
        return "bmp"
    if payload[:2] == b"P6":
        return "ppm"
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        return "wav"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------

_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type -> samples/pixel


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (H, W, C) uint8. 8-bit, non-interlaced; filters 0-4."""
    if payload[:8] != PNG_SIG:
        raise ValueError("not a PNG signature")
    pos = 8
    width = height = None
    color_type = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos:pos + 4])
        ctype = payload[pos + 4:pos + 8]
        data = payload[pos + 8:pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = \
                struct.unpack(">IIBBBBB", data)
            if bit_depth != 8:
                raise ValueError(f"unsupported PNG bit depth {bit_depth}")
            if color_type not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color_type}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None:
        raise ValueError("PNG missing IHDR")
    ch = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * ch
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG data length mismatch")
    lines = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    out = np.empty((height, stride), dtype=np.uint8)
    bpp = ch  # bytes per pixel (8-bit depth)
    for y in range(height):
        ftype = int(lines[y, 0])
        cur = lines[y, 1:].astype(np.int32)
        up = out[y - 1].astype(np.int32) if y else np.zeros(stride, np.int32)
        if ftype == 0:                                   # None
            rec = cur
        elif ftype == 2:                                 # Up
            rec = cur + up
        elif ftype == 1:                                 # Sub (left-recursive)
            rec = cur.reshape(width, bpp)
            np.cumsum(rec, axis=0, out=rec)              # mod-256 via int32+mask
            rec = rec.reshape(stride)
        else:                                            # Average / Paeth
            rec = np.empty(stride, np.int32)
            for x in range(stride):
                a = rec[x - bpp] & 0xFF if x >= bpp else 0
                b = up[x]
                if ftype == 3:                           # Average
                    rec[x] = cur[x] + ((a + b) >> 1)
                else:                                    # Paeth
                    c = (out[y - 1, x - bpp] if (y and x >= bpp) else 0)
                    p = a + b - c
                    pa_, pb_, pc_ = abs(p - a), abs(p - b), abs(p - c)
                    pred = a if (pa_ <= pb_ and pa_ <= pc_) else \
                        (b if pb_ <= pc_ else c)
                    rec[x] = cur[x] + pred
        out[y] = (rec & 0xFF).astype(np.uint8)
    return out.reshape(height, width, ch)


def encode_png(img: np.ndarray) -> bytes:
    """(H, W[, C]) uint8 -> PNG bytes (filter 0, one IDAT)."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, ch = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    lines = np.concatenate(
        [np.zeros((h, 1), np.uint8), img.reshape(h, w * ch)], axis=1)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data +
                struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_SIG + chunk(b"IHDR", ihdr) +
            chunk(b"IDAT", zlib.compress(lines.tobytes(), 6)) +
            chunk(b"IEND", b""))


# ---------------------------------------------------------------------------
# BMP (24-bit uncompressed, BITMAPINFOHEADER)
# ---------------------------------------------------------------------------

def decode_bmp(payload: bytes) -> np.ndarray:
    """BMP -> (H, W, 3) uint8 RGB. 24bpp uncompressed only."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP signature")
    (data_off,) = struct.unpack("<I", payload[10:14])
    w, h_signed = struct.unpack("<ii", payload[18:26])
    _planes, bpp = struct.unpack("<HH", payload[26:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, comp={compression})")
    h = abs(h_signed)
    row = (w * 3 + 3) & ~3  # rows padded to 4 bytes
    body = np.frombuffer(payload, np.uint8,
                         count=row * h, offset=data_off).reshape(h, row)
    img = body[:, :w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:  # bottom-up storage
        img = img[::-1]
    return np.ascontiguousarray(img)


def encode_bmp(img: np.ndarray) -> bytes:
    """(H, W, 3) uint8 RGB -> 24bpp bottom-up BMP bytes."""
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    row = (w * 3 + 3) & ~3
    body = np.zeros((h, row), np.uint8)
    body[:, :w * 3] = img[::-1, :, ::-1].reshape(h, w * 3)
    data = body.tobytes()
    header = (b"BM" + struct.pack("<IHHI", 54 + len(data), 0, 0, 54) +
              struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(data),
                          2835, 2835, 0, 0))
    return header + data


# ---------------------------------------------------------------------------
# PPM (netpbm P6)
# ---------------------------------------------------------------------------

def decode_ppm(payload: bytes) -> np.ndarray:
    """PPM P6 -> (H, W, 3) uint8. maxval must be 255."""
    if payload[:2] != b"P6":
        raise ValueError("not a P6 PPM")
    # header: P6 <w> <h> <maxval><single whitespace>, '#' comments allowed
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos:pos + 1].isspace():
            pos += 1
        if payload[pos:pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    return np.frombuffer(payload, np.uint8, count=h * w * 3,
                         offset=pos).reshape(h, w, 3).copy()


def encode_ppm(img: np.ndarray) -> bytes:
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


# ---------------------------------------------------------------------------
# WAV (RIFF integer PCM)
# ---------------------------------------------------------------------------

def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV -> (float32 mono waveform in [-1, 1], sample rate).

    Integer PCM 8/16/24/32-bit via the stdlib ``wave`` reader; multi-channel
    is mean-mixed to mono (the pyrosm-side contract of
    AudioFeatureExtractor)."""
    with wave.open(io.BytesIO(payload), "rb") as f:
        n_ch, sampwidth, rate = f.getnchannels(), f.getsampwidth(), \
            f.getframerate()
        frames = f.readframes(f.getnframes())
    if sampwidth == 1:  # unsigned 8-bit
        x = (np.frombuffer(frames, np.uint8).astype(np.float32) - 128.0) \
            / 128.0
    elif sampwidth == 2:
        x = np.frombuffer(frames, "<i2").astype(np.float32) / 32768.0
    elif sampwidth == 3:  # 24-bit: widen to int32
        b = np.frombuffer(frames, np.uint8).reshape(-1, 3)
        i32 = (b[:, 0].astype(np.int32) | (b[:, 1].astype(np.int32) << 8) |
               (b[:, 2].astype(np.int32) << 16))
        i32 = np.where(i32 >= 1 << 23, i32 - (1 << 24), i32)
        x = i32.astype(np.float32) / float(1 << 23)
    elif sampwidth == 4:
        x = np.frombuffer(frames, "<i4").astype(np.float32) / float(1 << 31)
    else:
        raise ValueError(f"unsupported WAV sample width {sampwidth}")
    if n_ch > 1:
        x = x.reshape(-1, n_ch).mean(axis=1)
    return x, rate


def encode_wav_pcm16(wavf: np.ndarray, rate: int = 16_000) -> bytes:
    """float32 mono in [-1, 1] -> 16-bit PCM WAV bytes."""
    pcm = np.clip(np.asarray(wavf, np.float64) * 32768.0,
                  -32768, 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return buf.getvalue()


def decode_image(payload: bytes) -> np.ndarray:
    """Dispatch PNG/BMP/PPM by magic; raises ValueError on other formats."""
    kind = sniff_media(payload)
    if kind == "png":
        return decode_png(payload)
    if kind == "bmp":
        return decode_bmp(payload)
    if kind == "ppm":
        return decode_ppm(payload)
    raise ValueError("unrecognized image container (png/bmp/ppm supported)")
