"""Multimodal column plumbing: opaque ``binary`` payloads + typed metadata,
processed as Arrow batches via ``mapInPandas``.

Audio is REAL in this engine (G.711/PCM decode in functions/audio.py — it is
the north-rule payload).  Image/video decode libraries are not in this
container, so those decoders are STUBS behind ``NotImplementedError`` with a
deterministic fake for plumbing tests — the Spark-side contract (schema,
batch shape, partitioning, UDF signature) is real and tested, per the
builder instructions.

Feature extraction implemented for audio (all vectorized numpy per clip):
- rms energy, zero-crossing rate, spectral centroid (rFFT), duration.
Frame-sampling (the video analog) is implemented generically over the PCM
vector: every k-th frame of fixed window size.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from ..functions import audio
from ..sources.generators import STORE_RATE

AUDIO_FEATURE_SCHEMA = ("rid long, clip_id string, part int, "
                        "n_samples int, rms double, zcr double, "
                        "spectral_centroid_hz double")


def decode_image(buf: bytes, fmt: str) -> np.ndarray:
    """STUB: image decode requires PIL/opencv (absent in this container).
    The deterministic fake used by plumbing tests is decode_image_fake."""
    raise NotImplementedError(
        "image decode requires an image library not present in this "
        "container; use decode_image_fake for plumbing tests")


def decode_image_fake(buf: bytes, fmt: str, size: int = 8) -> np.ndarray:
    """Deterministic fake 'decode': content-derived pseudo-pixels with a
    stable shape contract (size x size x 3 uint8)."""
    a = np.frombuffer(buf[: size * size * 3], dtype=np.uint8)
    out = np.zeros(size * size * 3, dtype=np.uint8)
    out[: a.size] = a
    return out.reshape(size, size, 3)


def frame_sample(pcm: np.ndarray, frame_len: int = 160,
                 every_k: int = 4) -> np.ndarray:
    """Every k-th fixed-length frame (video frame-sampling analog over the
    1-D PCM vector). Returns (n_frames, frame_len)."""
    n = (len(pcm) // frame_len) * frame_len
    frames = pcm[:n].reshape(-1, frame_len)
    return frames[::every_k]


def audio_features(clips: DataFrame,
                   store_rate: int = STORE_RATE) -> DataFrame:
    """Per-clip audio features via mapInPandas (Arrow batches; numpy per
    clip; only the columns needed are read — bytes + codec + ids)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = len(b)
            if not n:
                continue
            # vectorized across the batch: concatenate payloads per codec,
            # decode ONCE, then per-clip rms/zcr via add.reduceat over the
            # flat signal; only the FFT (spectral centroid) loops per clip,
            # on views — no fresh allocation per row.
            bufs = b["bytes"].to_numpy()
            codecs = b["codec"].to_numpy()
            # decode per codec group into per-row views, then flatten
            pcm_rows: list = [None] * n
            for codec_val in np.unique(codecs):
                idx = np.nonzero(codecs == codec_val)[0]
                joined = b"".join(bufs[i] for i in idx)
                try:
                    dec = audio.int16_to_float(audio.decode(joined, codec_val))
                except (ValueError, TypeError):
                    dec = None
                width = 1 if codec_val in ("mulaw", "alaw") else 2
                off = 0
                for i in idx:
                    m = len(bufs[i]) // width
                    if dec is None:
                        pcm_rows[i] = np.zeros(1)
                    else:
                        pcm_rows[i] = dec[off:off + m]
                    off += m
            ns = np.array([len(p) for p in pcm_rows], dtype=np.int64)
            flat = np.concatenate(pcm_rows) if n else np.empty(0)
            starts = np.concatenate([[0], np.cumsum(ns)[:-1]])
            # rms: sum of squares per clip
            sq = flat * flat
            rms = np.sqrt(np.add.reduceat(sq, starts) / np.maximum(ns, 1))
            # zcr: sign changes per clip, boundaries zeroed
            sb = np.signbit(flat).astype(np.int8)
            d = np.abs(np.diff(sb)).astype(np.float64)
            boundary = (starts - 1)[1:]
            d[boundary[boundary >= 0]] = 0.0
            d = np.concatenate([d, [0.0]])
            zc = np.add.reduceat(d, starts)
            zcr = np.where(ns > 1, zc / np.maximum(ns - 1, 1), 0.0)
            cent = np.empty(n)
            for i in range(n):
                pcm = pcm_rows[i]
                spec = np.abs(np.fft.rfft(pcm))
                freqs = np.fft.rfftfreq(len(pcm), d=1.0 / store_rate)
                denom = spec.sum()
                cent[i] = float((freqs * spec).sum() / denom) if denom else 0.0
            yield pd.DataFrame({
                "rid": b["rid"].to_numpy(),
                "clip_id": b["clip_id"].to_numpy(),
                "part": b["part"].to_numpy(),
                "n_samples": ns.astype(np.int32), "rms": np.round(rms, 6),
                "zcr": np.round(zcr, 6),
                "spectral_centroid_hz": np.round(cent, 3)})

    cols = clips.select("rid", "clip_id", "part", "bytes", "codec")
    return cols.mapInPandas(gen, AUDIO_FEATURE_SCHEMA)
