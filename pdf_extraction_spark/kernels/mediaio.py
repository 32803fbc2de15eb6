"""Pure-stdlib media codecs for the multimodal column plumbing.

The sandbox ships no PIL/torchaudio, but real decoding is still
possible for formats the standard library (plus numpy) can handle:

- **P6 PPM** images (binary RGB, the interchange format every image
  tool can write),
- **24-bit uncompressed BMP** images (BI_RGB, bottom-up, the Windows
  default), and
- **PCM WAV** audio via the stdlib ``wave`` module.

Encoders exist alongside the decoders so test fixtures and the oracle
generator can build *genuinely decodable* payloads deterministically —
the oracle for ``media_features_real`` recomputes features from these
same pure-Python kernels with no Spark involved.

These functions run inside Arrow batches (multimodal.extract_media_
features); per-row decode inside the batch is inherent to media work,
not an anti-pattern — the batch boundary is where vectorization lives.
"""

import io
import struct
import wave

import numpy as np


# --------------------------------------------------------------------------
# P6 PPM (binary RGB)
# --------------------------------------------------------------------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 → binary P6 payload."""
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype(np.uint8).tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    """Binary P6 → (h, w, 3) uint8. Supports comment lines and any
    whitespace between header tokens (the spec's token grammar)."""
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    pos = 2
    fields = []
    while len(fields) < 3:
        # skip whitespace and '#' comment lines between tokens
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace byte after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    need = w * h * 3
    raster = payload[pos : pos + need]
    if len(raster) < need:
        raise ValueError("truncated PPM raster")
    return np.frombuffer(raster, dtype=np.uint8).reshape(h, w, 3)


# --------------------------------------------------------------------------
# 24-bit uncompressed BMP (BI_RGB)
# --------------------------------------------------------------------------

def encode_bmp(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit bottom-up BI_RGB BMP payload."""
    h, w, _ = img.shape
    row_size = (w * 3 + 3) & ~3  # rows pad to 4 bytes
    pixel_bytes = row_size * h
    header = struct.pack("<2sIHHI", b"BM", 54 + pixel_bytes, 0, 0, 54)
    info = struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, pixel_bytes, 2835, 2835, 0, 0)
    rows = []
    for y in range(h - 1, -1, -1):  # bottom-up
        bgr = img[y, :, ::-1].astype(np.uint8).tobytes()
        rows.append(bgr + b"\x00" * (row_size - w * 3))
    return header + info + b"".join(rows)


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → (h, w, 3) uint8 RGB. Handles bottom-up
    and top-down (negative height) rows and 4-byte row padding."""
    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP payload")
    data_offset = struct.unpack_from("<I", payload, 10)[0]
    header_size = struct.unpack_from("<I", payload, 14)[0]
    if header_size < 40:
        raise ValueError("BITMAPCOREHEADER BMPs unsupported")
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    h = abs(h_signed)
    top_down = h_signed < 0
    row_size = (w * 3 + 3) & ~3
    out = np.empty((h, w, 3), dtype=np.uint8)
    for i in range(h):
        row_off = data_offset + i * row_size
        # bounded slice — an open-ended payload[row_off:] would copy the
        # whole remaining file once per row (O(height × file_size))
        row = payload[row_off : row_off + w * 3]
        if len(row) < w * 3:
            raise ValueError("truncated BMP raster")
        y = i if top_down else h - 1 - i
        out[y] = np.frombuffer(row, dtype=np.uint8).reshape(w, 3)[:, ::-1]  # BGR→RGB
    return out


# --------------------------------------------------------------------------
# PCM WAV (stdlib wave)
# --------------------------------------------------------------------------

_WAV_DTYPES = {1: np.uint8, 2: np.int16, 4: np.int32}


def encode_wav(samples: np.ndarray, framerate: int = 8000) -> bytes:
    """1-D int16 samples → mono 16-bit PCM WAV payload."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as wv:
        wv.setnchannels(1)
        wv.setsampwidth(2)
        wv.setframerate(framerate)
        wv.writeframes(samples.astype("<i2").tobytes())
    return buf.getvalue()


def decode_wav(payload: bytes) -> np.ndarray:
    """PCM WAV → (n_frames, n_channels) integer sample array."""
    with wave.open(io.BytesIO(payload), "rb") as wv:
        n_ch = wv.getnchannels()
        width = wv.getsampwidth()
        frames = wv.readframes(wv.getnframes())
    dtype = _WAV_DTYPES.get(width)
    if dtype is None:
        raise ValueError(f"unsupported WAV sample width {width}")
    return np.frombuffer(frames, dtype=dtype).reshape(-1, n_ch)


# --------------------------------------------------------------------------
# shared feature pooling (Spark UDF ≡ oracle fixture, bit-identical)
# --------------------------------------------------------------------------

def pooled_features(arr: np.ndarray, feat_dim: int = 16):
    """Decoded array → (mean_intensity, feature_vec): flatten to float64
    and mean-pool ``feat_dim`` contiguous chunks. One implementation for
    the Spark batch UDF and the pure-Python oracle recompute."""
    flat = arr.astype(np.float64).ravel()
    pooled = [
        float(chunk.mean()) if len(chunk) else 0.0
        for chunk in np.array_split(flat, feat_dim)
    ]
    return (float(flat.mean()) if flat.size else 0.0, pooled)


# --------------------------------------------------------------------------
# deterministic real-payload synthesis (fixtures + oracle share this)
# --------------------------------------------------------------------------

def synth_real_payload(i: int):
    """Row i → (media_type, payload, (width, height, duration_ms, codec))
    with a GENUINELY DECODABLE payload: PPM / BMP images alternate,
    every third row is a sine-wave WAV."""
    import random

    rng = random.Random(90210 + i)
    if i % 3 == 2:
        n = 64 + 8 * (i % 11)
        freq = 100.0 + 37.0 * i
        t = np.arange(n, dtype=np.float64)
        samples = (3000.0 * np.sin(2.0 * np.pi * freq * t / 8000.0)).astype(np.int16)
        payload = encode_wav(samples, 8000)
        return ("audio", payload, (0, 0, int(n * 1000 / 8000), "pcm_s16le"))
    w, h = 4 + (i % 6), 3 + (i % 5)
    img = np.array(
        [rng.randrange(256) for _ in range(w * h * 3)], dtype=np.uint8
    ).reshape(h, w, 3)
    if i % 2 == 0:
        return ("image", encode_ppm(img), (w, h, 0, "ppm"))
    return ("image", encode_bmp(img), (w, h, 0, "bmp"))
