"""Real media codecs for the multimodal pipeline — stdlib-only.

The container has no PIL/ffmpeg/soundfile, but PNG and WAV are decodable
with nothing beyond ``zlib``/``struct``/``wave`` + numpy, so those two
codecs get REAL decoders (parity target: reference ingests PNG tiles and
WAV clips through its media path; see reference api/main.py upload
handling). PIL, when installed, extends coverage to JPEG &co via the same
dispatch — gated exactly like ``iceberg_available()`` gates Iceberg jars.

Decoders run inside Arrow-batched ``mapInPandas`` workers
(multimodal.extract_features): per-item Python cost is the codec itself;
batching amortizes interpreter overhead, matching the UDF guidance in
SURVEY §3.
"""

from __future__ import annotations

import io
import struct
import wave
import zlib

import numpy as np

_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# channels per PNG color type (palette unsupported — raise, don't guess)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def pil_available() -> bool:
    """True when Pillow is importable (optional fast/coverage path)."""
    try:
        import PIL.Image  # noqa: F401

        return True
    except Exception:
        return False


def media_decode_available(codec: str) -> bool:
    """Which codecs the *real* (non-stub) kernel can decode here."""
    codec = codec.lower()
    if codec in ("png", "wav"):
        return True
    if codec in ("jpg", "jpeg", "bmp", "gif", "webp"):
        return pil_available()
    return False


# ---------------------------------------------------------------------------
# PNG — RFC 2083 critical chunks, 8-bit depth, color types 0/2/4/6
# ---------------------------------------------------------------------------


def decode_png(buf: bytes) -> np.ndarray:
    """Decode a PNG byte string → uint8 array of shape (h, w, channels).

    Full critical-chunk path: IHDR parse → IDAT concat → zlib inflate →
    per-scanline filter reversal (None/Sub/Up/Average/Paeth). 8-bit,
    non-interlaced, non-palette images — the subset the pipeline writes.
    """
    if buf[:8] != _PNG_MAGIC:
        raise ValueError("not a PNG stream")
    pos, width, height, channels, idat = 8, 0, 0, 0, []
    while pos < len(buf):
        (length,) = struct.unpack(">I", buf[pos : pos + 4])
        ctype = buf[pos + 4 : pos + 8]
        data = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length  # len + type + data + crc
        if ctype == b"IHDR":
            width, height, depth, color, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if depth != 8:
                raise ValueError(f"unsupported PNG bit depth {depth}")
            if interlace:
                raise ValueError("interlaced PNG unsupported")
            if color not in _PNG_CHANNELS:
                raise ValueError(f"unsupported PNG color type {color}")
            channels = _PNG_CHANNELS[color]
        elif ctype == b"IDAT":
            idat.append(data)
        elif ctype == b"IEND":
            break
    raw = zlib.decompress(b"".join(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG data length mismatch")
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        row = raw[y * (stride + 1) : (y + 1) * (stride + 1)]
        out[y] = _unfilter_scanline(row[0], row[1:], prev, channels)
        prev = out[y]
    return out.reshape(height, width, channels)


def _unfilter_scanline(
    ftype: int, line: bytes, prev: np.ndarray, bpp: int
) -> np.ndarray:
    cur = np.frombuffer(line, dtype=np.uint8).astype(np.int32)
    up = prev.astype(np.int32)
    if ftype == 0:  # None
        return cur.astype(np.uint8)
    if ftype == 2:  # Up
        return ((cur + up) & 0xFF).astype(np.uint8)
    # Sub/Average/Paeth need the already-reconstructed left neighbour —
    # sequential in x, vectorized across channels via the bpp stride.
    out = np.zeros(len(cur), dtype=np.int32)
    for x in range(len(cur)):
        left = out[x - bpp] if x >= bpp else 0
        if ftype == 1:  # Sub
            out[x] = (cur[x] + left) & 0xFF
        elif ftype == 3:  # Average
            out[x] = (cur[x] + (left + up[x]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            ul = up[x - bpp] if x >= bpp else 0
            p = left + up[x] - ul
            pa, pb, pc = abs(p - left), abs(p - up[x]), abs(p - ul)
            pred = left if pa <= pb and pa <= pc else (up[x] if pb <= pc else ul)
            out[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter {ftype}")
    return out.astype(np.uint8)


def encode_png(arr: np.ndarray) -> bytes:
    """Encode (h, w[, channels]) uint8 → PNG bytes (filter 0, one IDAT)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, ch = arr.shape
    color = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color, 0, 0, 0)
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data))
            + ctype
            + data
            + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF)
        )

    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


# ---------------------------------------------------------------------------
# WAV — PCM 16-bit via the stdlib wave module
# ---------------------------------------------------------------------------


def decode_wav(buf: bytes) -> tuple[np.ndarray, int]:
    """Decode WAV bytes → (float64 samples in [-1, 1] shaped (n, channels),
    sample_rate). 16-bit PCM only (what encode_wav writes)."""
    with wave.open(io.BytesIO(buf), "rb") as f:
        if f.getsampwidth() != 2:
            raise ValueError("only 16-bit PCM WAV supported")
        rate = f.getframerate()
        nch = f.getnchannels()
        frames = f.readframes(f.getnframes())
    samples = np.frombuffer(frames, dtype="<i2").astype(np.float64) / 32768.0
    return samples.reshape(-1, nch), rate


def encode_wav(samples: np.ndarray, rate: int = 16000) -> bytes:
    """Encode float samples in [-1, 1] (n,) or (n, ch) → 16-bit PCM WAV."""
    arr = np.asarray(samples, dtype=np.float64)
    if arr.ndim == 1:
        arr = arr[:, None]
    pcm = np.clip(np.round(arr * 32767.0), -32768, 32767).astype("<i2")
    bio = io.BytesIO()
    with wave.open(bio, "wb") as f:
        f.setnchannels(arr.shape[1])
        f.setsampwidth(2)
        f.setframerate(rate)
        f.writeframes(pcm.tobytes())
    return bio.getvalue()


# ---------------------------------------------------------------------------
# feature kernels — decoded media → fixed 8-d feature vector
# ---------------------------------------------------------------------------


def image_features(img: np.ndarray) -> np.ndarray:
    """(h, w, ch) uint8 → 8-d: [h, w, ch, mean, std, p25, p75, edge-energy].

    Edge energy = mean |horizontal first difference| of the luma plane —
    a real spatial statistic a byte histogram cannot fake.
    """
    f = img.astype(np.float64)
    luma = f.mean(axis=2)
    dx = np.abs(np.diff(luma, axis=1)).mean() if img.shape[1] > 1 else 0.0
    return np.array(
        [
            img.shape[0],
            img.shape[1],
            img.shape[2],
            f.mean(),
            f.std(),
            np.percentile(f, 25),
            np.percentile(f, 75),
            dx,
        ]
    )


def audio_features(samples: np.ndarray, rate: int) -> np.ndarray:
    """(n, ch) float → 8-d: [duration_s, rate, ch, rms, peak, zcr,
    lowband_ratio, dc_offset]. Zero-crossing rate and the coarse 2-bin
    spectral split come from the actual waveform."""
    mono = samples.mean(axis=1)
    n = len(mono)
    zcr = float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    spec = np.abs(np.fft.rfft(mono)) if n else np.array([0.0])
    half = max(1, len(spec) // 2)
    total = spec.sum()
    low_ratio = float(spec[:half].sum() / total) if total > 0 else 0.0
    return np.array(
        [
            n / rate if rate else 0.0,
            rate,
            samples.shape[1],
            float(np.sqrt(np.mean(mono**2))) if n else 0.0,
            float(np.abs(mono).max()) if n else 0.0,
            zcr,
            low_ratio,
            float(mono.mean()) if n else 0.0,
        ]
    )


def decode_image(buf: bytes, codec: str) -> np.ndarray:
    """Decode one image payload by codec → uint8 (h, w[, c]) array:
    stdlib PNG path, Pillow for jpeg/bmp/gif/webp when installed."""
    codec = codec.lower()
    if codec == "png":
        return decode_png(buf)
    if codec in ("jpg", "jpeg", "bmp", "gif", "webp") and pil_available():
        import PIL.Image

        return np.asarray(PIL.Image.open(io.BytesIO(buf)).convert("RGB"))
    raise NotImplementedError(
        f"no image decoder for codec {codec!r} in this environment "
        "(png is stdlib; jpeg &co need Pillow)"
    )


def decode_features(buf: bytes, codec: str) -> np.ndarray:
    """Decode one payload by codec and return its 8-d feature vector."""
    codec = codec.lower()
    if codec == "wav":
        return audio_features(*decode_wav(buf))
    if codec in ("png", "jpg", "jpeg", "bmp", "gif", "webp"):
        return image_features(decode_image(buf, codec))
    raise NotImplementedError(
        f"no decoder for codec {codec!r} in this environment "
        "(png/wav are stdlib; jpeg &co need Pillow)"
    )
