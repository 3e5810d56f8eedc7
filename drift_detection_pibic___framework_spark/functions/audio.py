"""Pure-numpy audio codecs + SNR for the per-row invariant check.

The engine validates an Iceberg table of audio clips ``(clip_id, bytes, sr_hz,
dur_ms, codec, transcript)``.  The per-row invariant (BASELINE.json input_hint)
is: decoded-PCM allclose (SNR >= 30 dB) + transcript equality against a pristine
reference copy.  The reference framework never touches audio (it streams
financial series, /root/reference/preprocessamento/SeriesProcessor.py:11-24);
audio decode is part of the north_rule payload, implemented here from the
public ITU-T G.711 spec (mu-law / A-law) and plain little-endian PCM16.

All functions are vectorized numpy (no per-row Python loops inside a clip) so
they can run inside Arrow-batched pandas UDFs (input_hint: "no per-row Python").
"""

from __future__ import annotations

import numpy as np

SUPPORTED_CODECS = ("pcm_s16le", "mulaw", "alaw")

_MULAW_BIAS = 0x84  # 132
_MULAW_CLIP = 32635


# ---------------------------------------------------------------------------
# float <-> int16
# ---------------------------------------------------------------------------

def float_to_int16(x: np.ndarray) -> np.ndarray:
    """[-1, 1] float -> int16 with symmetric scaling (clipped)."""
    y = np.clip(x, -1.0, 1.0)
    return np.round(y * 32767.0).astype(np.int16)


def int16_to_float(x: np.ndarray) -> np.ndarray:
    return x.astype(np.float64) / 32767.0


# ---------------------------------------------------------------------------
# PCM s16le
# ---------------------------------------------------------------------------

def pcm_s16le_encode(pcm: np.ndarray) -> bytes:
    """int16 array -> little-endian bytes."""
    return np.ascontiguousarray(pcm.astype("<i2")).tobytes()


def pcm_s16le_decode(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype="<i2").astype(np.int16)


# ---------------------------------------------------------------------------
# ITU-T G.711 mu-law
# ---------------------------------------------------------------------------

def mulaw_encode(pcm: np.ndarray) -> bytes:
    """int16 -> G.711 mu-law bytes (vectorized)."""
    x = pcm.astype(np.int32)
    sign = np.where(x < 0, 0x80, 0x00).astype(np.int32)
    mag = np.minimum(np.abs(x), _MULAW_CLIP) + _MULAW_BIAS
    # exponent = position of MSB above bit 7 (mag >= 132 so log2 >= 7)
    exp = (np.floor(np.log2(mag)).astype(np.int32) - 7)
    mant = (mag >> (exp + 3)) & 0x0F
    byte = ~(sign | (exp << 4) | mant) & 0xFF
    return byte.astype(np.uint8).tobytes()


def mulaw_decode(buf: bytes) -> np.ndarray:
    """G.711 mu-law bytes -> int16 (vectorized)."""
    b = (~np.frombuffer(buf, dtype=np.uint8).astype(np.int32)) & 0xFF
    sign = b & 0x80
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = (((mant << 3) + _MULAW_BIAS) << exp) - _MULAW_BIAS
    out = np.where(sign != 0, -mag, mag)
    return out.astype(np.int16)


# ---------------------------------------------------------------------------
# ITU-T G.711 A-law
# ---------------------------------------------------------------------------

def alaw_encode(pcm: np.ndarray) -> bytes:
    """int16 -> G.711 A-law bytes (vectorized)."""
    x = pcm.astype(np.int32)
    sign = np.where(x >= 0, 0x80, 0x00).astype(np.int32)
    mag = np.minimum(np.abs(x), 32767)
    small = mag < 256
    # exponent 1..7 for mag >= 256
    exp = np.zeros_like(mag)
    nz = mag > 0
    exp[nz] = np.maximum(np.floor(np.log2(mag[nz])).astype(np.int32) - 7, 0)
    mant = np.where(small, mag >> 4, (mag >> (exp + 3)) & 0x0F)
    byte = (sign | (exp << 4) | mant) ^ 0x55
    return (byte & 0xFF).astype(np.uint8).tobytes()


def alaw_decode(buf: bytes) -> np.ndarray:
    """G.711 A-law bytes -> int16 (vectorized)."""
    b = np.frombuffer(buf, dtype=np.uint8).astype(np.int32) ^ 0x55
    sign = b & 0x80
    exp = (b >> 4) & 0x07
    mant = b & 0x0F
    mag = np.where(
        exp == 0,
        (mant << 4) + 8,
        ((mant << 4) + 0x108) << (exp - 1),
    )
    out = np.where(sign != 0, mag, -mag)
    return out.astype(np.int16)


# ---------------------------------------------------------------------------
# dispatch + SNR
# ---------------------------------------------------------------------------

_ENCODERS = {
    "pcm_s16le": pcm_s16le_encode,
    "mulaw": mulaw_encode,
    "alaw": alaw_encode,
}
_DECODERS = {
    "pcm_s16le": pcm_s16le_decode,
    "mulaw": mulaw_decode,
    "alaw": alaw_decode,
}


def encode(pcm: np.ndarray, codec: str) -> bytes:
    """Encode an int16 PCM array per codec; unknown codecs fall back to s16le
    (the fixture's injected ``opus`` rows carry s16le payloads — the
    *referential* check flags the codec, not the payload)."""
    return _ENCODERS.get(codec, pcm_s16le_encode)(pcm)


def decode(buf: bytes, codec: str) -> np.ndarray:
    """Decode bytes to int16 PCM per codec (unknown codecs -> s16le)."""
    return _DECODERS.get(codec, pcm_s16le_decode)(buf)


def snr_db(ref: np.ndarray, test: np.ndarray) -> float:
    """10*log10(sum(ref^2) / sum((ref-test)^2)) over float signals.

    Identical signals -> +inf. Mismatched lengths -> -inf (treated as a hard
    violation by the invariant check).
    """
    if ref.shape != test.shape:
        return float("-inf")
    noise = np.sum((ref.astype(np.float64) - test.astype(np.float64)) ** 2)
    if noise == 0.0:
        return float("inf")
    sig = np.sum(ref.astype(np.float64) ** 2)
    if sig == 0.0:
        return float("-inf")
    return float(10.0 * np.log10(sig / noise))
