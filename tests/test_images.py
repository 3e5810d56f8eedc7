"""Image/video decode + feature operators (operators/images.py): the
round-5 un-stubbing of uncompressed-format decode.

Covers: PPM/PGM/BMP round-trips (including non-multiple-of-4 BMP widths
and top-down BMPs), PNM header comments, loud failures on malformed /
compressed payloads, exact area-resize semantics, dHash brightness
invariance, Y4M encode/decode + frame sampling, and the Spark-side
mapInPandas operators (features / near-dups / thumbnails / video stats)
over a deterministic synthetic binary-column table with fail-closed
handling of broken rows.
"""

import numpy as np
import pytest
from pyspark.sql import Row, functions as F

from drift_detection_pibic___framework_spark.operators import (
    images as I, multimodal)


def _rng(seed=42):
    return np.random.default_rng(seed)


# -------------------------------------------------------------------------
# codecs: round-trips + loud failures
# -------------------------------------------------------------------------

def test_ppm_roundtrip():
    a = _rng().integers(0, 256, size=(13, 7, 3), dtype=np.uint8)
    assert np.array_equal(I.decode_pnm(I.encode_ppm(a)), a)


def test_pgm_roundtrip():
    a = _rng(1).integers(0, 256, size=(9, 17), dtype=np.uint8)
    assert np.array_equal(I.decode_pnm(I.encode_pgm(a)), a)


@pytest.mark.parametrize("w", [5, 6, 7, 8])   # all stride paddings
def test_bmp_roundtrip_all_paddings(w):
    a = _rng(w).integers(0, 256, size=(4, w, 3), dtype=np.uint8)
    assert np.array_equal(I.decode_bmp(I.encode_bmp(a)), a)


def test_bmp_top_down_variant():
    """Negative biHeight = top-down row order: the raster's FIRST stored
    row is the image's TOP row, so decode must skip the bottom-up flip.
    encode_bmp(a[::-1]) stores file rows in a's original order; marking
    that payload top-down must therefore decode back to a itself."""
    a = _rng(3).integers(0, 256, size=(4, 6, 3), dtype=np.uint8)
    buf = bytearray(I.encode_bmp(a[::-1]))
    import struct
    struct.pack_into("<i", buf, 22, -4)       # mark as top-down
    assert np.array_equal(I.decode_bmp(bytes(buf)), a)


def test_pnm_header_comments():
    """The PNM spec allows # comments anywhere in the header."""
    a = _rng(5).integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    buf = b"P6\n# a comment\n4 3\n# another\n255\n" + a.tobytes()
    assert np.array_equal(I.decode_pnm(buf), a)


@pytest.mark.parametrize("bad", [
    b"P7\n1 1\n255\n\x00\x00\x00",            # wrong magic
    b"P6\n4 3\n65535\n" + b"\x00" * 72,       # 16-bit maxval
    b"P6\n4 3\n255\n\x00\x00",                # short raster
    b"P6\n4",                                 # truncated header
    b"P6\n0 1\n255\n",                        # zero width (ADVICE r5)
    b"P6\n-1 3\n255\n" + b"\x00" * 27,        # negative width (ADVICE r5)
    b"P5\n3 0\n255\n",                        # zero height
])
def test_pnm_malformed_is_loud(bad):
    with pytest.raises(ValueError):
        I.decode_pnm(bad)


def test_bmp_compressed_or_paletted_is_loud():
    a = _rng(6).integers(0, 256, size=(2, 2, 3), dtype=np.uint8)
    buf = bytearray(I.encode_bmp(a))
    import struct
    struct.pack_into("<I", buf, 30, 1)        # biCompression = BI_RLE8
    with pytest.raises(ValueError, match="BI_RGB"):
        I.decode_bmp(bytes(buf))
    struct.pack_into("<I", buf, 30, 0)
    struct.pack_into("<H", buf, 28, 8)        # 8 bpp (paletted)
    with pytest.raises(ValueError, match="24-bit"):
        I.decode_bmp(bytes(buf))


def test_compressed_formats_stay_stubbed():
    """multimodal.decode_image: REAL for ppm/pgm/bmp, NotImplementedError
    for compressed codecs — the stub narrowed, not silently faked."""
    with pytest.raises(NotImplementedError):
        multimodal.decode_image(b"\x89PNG...", "png")
    a = _rng(7).integers(0, 256, size=(5, 5, 3), dtype=np.uint8)
    assert np.array_equal(multimodal.decode_image(I.encode_ppm(a), "ppm"),
                          a)


# -------------------------------------------------------------------------
# resize + dHash kernels
# -------------------------------------------------------------------------

def test_resize_area_exact_block_mean():
    """Integer downsample factor -> each output pixel is the exact mean
    of its block."""
    a = np.arange(64, dtype=np.float64).reshape(8, 8)
    got = I.resize_area(a, 4, 4)
    want = a.reshape(4, 2, 4, 2).mean(axis=(1, 3))
    assert np.allclose(got, want, atol=0)


def test_resize_area_ragged_and_upsample():
    a = np.arange(50, dtype=np.float64).reshape(10, 5)
    r = I.resize_area(a, 4, 4)                # ragged boxes
    assert r.shape == (4, 4)
    assert abs(r.mean() - a.mean()) < 3       # box means preserve scale
    u = I.resize_area(a, 20, 10)              # upsample: nearest boxes
    assert u.shape == (20, 10)
    assert set(np.unique(u)) <= set(np.unique(a))


def test_dhash_brightness_invariance_and_sensitivity():
    """dHash rides gradient SIGNS: a uniform brightness shift keeps the
    hash identical; flipping the image does not."""
    a = _rng(8).integers(30, 200, size=(32, 32, 3), dtype=np.uint8)
    h0 = I.dhash64(a)
    assert I.dhash64(np.clip(a.astype(np.int32) + 40, 0,
                             255).astype(np.uint8)) == h0
    assert I.dhash64(a[:, ::-1]) != h0
    assert -(1 << 63) <= h0 < (1 << 63)       # Spark LongType range


def test_dhash_near_dup_within_radius():
    """Light per-pixel noise moves the hash only a few bits."""
    a = _rng(9).integers(40, 210, size=(64, 64, 3), dtype=np.uint8)
    noisy = np.clip(a.astype(np.int32)
                    + _rng(10).integers(-4, 5, size=a.shape),
                    0, 255).astype(np.uint8)
    d = bin((I.dhash64(a) ^ I.dhash64(noisy)) & ((1 << 64) - 1)).count("1")
    assert d <= 6, d


# -------------------------------------------------------------------------
# Y4M
# -------------------------------------------------------------------------

def test_y4m_roundtrip_and_sampling():
    frames = _rng(11).integers(0, 256, size=(10, 6, 8), dtype=np.uint8)
    buf = I.encode_y4m(frames)
    got, w, h = I.decode_y4m(buf)
    assert (w, h) == (8, 6) and np.array_equal(got, frames)
    n, ww, hh, mean, motion = I.video_frame_stats_reference(buf, every_k=3)
    sampled = frames[::3].astype(np.float64)
    assert (n, ww, hh) == (10, 8, 6)
    assert mean == round(float(sampled.mean()), 4)
    assert motion == round(float(np.mean(np.abs(np.diff(sampled,
                                                        axis=0)))), 4)


def test_y4m_malformed_is_loud():
    with pytest.raises(ValueError):
        I.decode_y4m(b"RIFF....")
    frames = np.zeros((2, 4, 4), dtype=np.uint8)
    buf = I.encode_y4m(frames)
    with pytest.raises(ValueError, match="truncated"):
        I.decode_y4m(buf[:-5])
    with pytest.raises(ValueError, match="colorspace"):
        I.decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C444\nFRAME\n" + b"\x00" * 48)


# -------------------------------------------------------------------------
# Spark operators over a synthetic binary-column table
# -------------------------------------------------------------------------

@pytest.fixture(scope="module")
def images_df(spark):
    """60 deterministic images (ppm/pgm/bmp round-robin) + one injected
    near-dup pair + two broken rows (truncated payload, compressed fmt)."""
    rng = _rng(42)
    rows = []
    base = None
    for i in range(60):
        a = rng.integers(0, 256, size=(16, 16, 3), dtype=np.uint8)
        fmt = ("ppm", "pgm", "bmp")[i % 3]
        if fmt == "pgm":
            buf = I.encode_pgm(a[:, :, 0])
        elif fmt == "bmp":
            buf = I.encode_bmp(a)
        else:
            buf = I.encode_ppm(a)
        if i == 0:
            base = a
        rows.append(Row(img_id=f"img{i:03d}", bytes=bytearray(buf),
                        fmt=fmt))
    noisy = np.clip(base.astype(np.int32)
                    + rng.integers(-3, 4, size=base.shape),
                    0, 255).astype(np.uint8)
    rows.append(Row(img_id="img_dup", bytes=bytearray(I.encode_ppm(noisy)),
                    fmt="ppm"))
    rows.append(Row(img_id="img_trunc", bytes=bytearray(b"P6\n16 16\n255\n"),
                    fmt="ppm"))
    rows.append(Row(img_id="img_png", bytes=bytearray(b"\x89PNG\r\n"),
                    fmt="png"))
    return spark.createDataFrame(rows).repartition(4).cache()


def test_image_features_match_reference(spark, images_df):
    got = I.image_features(images_df).toPandas().set_index("img_id")
    assert len(got) == 63
    pdf = images_df.toPandas()
    for _, r in pdf.iterrows():
        g = got.loc[r["img_id"]]
        if r["img_id"] in ("img_trunc", "img_png"):
            assert not g["decode_ok"] and g["width"] == 0
            continue
        a = I.decode_any(bytes(r["bytes"]), r["fmt"])
        w, h, c, m, s = I.image_features_reference(a)
        assert bool(g["decode_ok"])
        assert (g["width"], g["height"], g["channels"]) == (w, h, c)
        assert abs(g["mean_luma"] - m) < 1e-9
        assert abs(g["std_luma"] - s) < 1e-9
        assert g["dhash"] == I.dhash64(a)


def test_image_near_duplicates_finds_injected_pair(spark, images_df):
    """The injected noisy twin pairs with img000 within radius; broken
    rows (dhash 0) never pair with each other."""
    pairs = {(r.img_a, r.img_b)
             for r in I.image_near_duplicates(images_df,
                                              max_hamming=8).collect()}
    assert ("img000", "img_dup") in pairs or ("img_dup", "img000") in pairs
    flat = {x for p in pairs for x in p}
    assert "img_trunc" not in flat and "img_png" not in flat


def test_image_thumbnails_shape_and_nulls(spark, images_df):
    t = I.image_thumbnails(images_df, size=8).toPandas().set_index(
        "img_id")
    assert len(t) == 63
    assert t.loc["img_trunc"]["thumb"] is None
    assert t.loc["img_png"]["thumb"] is None
    tb = bytes(t.loc["img000"]["thumb"])
    a = I.decode_pnm(tb)
    assert a.shape == (8, 8)
    # thumbnail pixels are the rounded area means of the original
    src = I.decode_any(bytes(images_df.filter("img_id = 'img000'")
                             .first()["bytes"]), "ppm")
    want = np.clip(np.round(I.resize_area(I.to_luma(src), 8, 8)),
                   0, 255).astype(np.uint8)
    assert np.array_equal(a, want)


def test_video_fingerprint_invariance_and_near_dups(spark):
    """The temporal fingerprint survives re-encoding transforms that
    preserve temporal structure (uniform brightness shift, per-pixel
    noise) and the Spark near-dup join surfaces exactly the injected
    twins; flat/short videos (vfp=0) never pair."""
    rng = _rng(21)
    base = rng.integers(60, 200, size=(24, 8, 8), dtype=np.uint8)
    ramp = (np.sin(np.arange(24) * 0.7) * 40)[:, None, None]
    base = np.clip(base.astype(np.float64) * 0.3 + 110 + ramp,
                   0, 255).astype(np.uint8)
    h0 = I.video_fingerprint_reference(I.encode_y4m(base))
    brighter = np.clip(base.astype(np.int32) + 30, 0, 255).astype(np.uint8)
    assert I.video_fingerprint_reference(I.encode_y4m(brighter)) == h0
    noisy = np.clip(base.astype(np.int32)
                    + rng.integers(-2, 3, size=base.shape),
                    0, 255).astype(np.uint8)
    hn = I.video_fingerprint_reference(I.encode_y4m(noisy))
    assert bin((h0 ^ hn) & ((1 << 64) - 1)).count("1") <= 6
    assert I.video_fingerprint_reference(
        I.encode_y4m(base[:1])) == 0                     # no temporal signal

    rows = [Row(vid_id="orig", bytes=bytearray(I.encode_y4m(base))),
            Row(vid_id="re_up", bytes=bytearray(I.encode_y4m(noisy))),
            Row(vid_id="short", bytes=bytearray(I.encode_y4m(base[:1]))),
            Row(vid_id="flat", bytes=bytearray(I.encode_y4m(
                np.full((6, 8, 8), 99, dtype=np.uint8)))),
            Row(vid_id="flat2", bytes=bytearray(I.encode_y4m(
                np.full((9, 8, 8), 42, dtype=np.uint8)))),
            Row(vid_id="bad", bytes=bytearray(b"nope"))]
    for i in range(6):      # unrelated videos must NOT pair
        rows.append(Row(vid_id=f"other{i}", bytes=bytearray(I.encode_y4m(
            _rng(100 + i).integers(0, 256, size=(20, 8, 8),
                                   dtype=np.uint8)))))
    df = spark.createDataFrame(rows).repartition(3)
    pairs = {(r.vid_a, r.vid_b)
             for r in I.video_near_duplicates(df, max_hamming=6).collect()}
    assert pairs and all({"orig", "re_up"} == set(p) for p in pairs)


def test_synth_videos_schedule_and_registry_query(spark):
    """The deterministic Y4M fixture honors its injection schedule (10
    truncated rows at n=400 divert; ramped id%3==0 rows separate from
    static noise on sampled motion) and the rows-only registry query
    returns a stable class histogram."""
    from drift_detection_pibic___framework_spark import queries as Q
    rows = Q.QUERIES["vid_frame_stats"](spark, "unused").collect()
    bad = [r for r in rows if not r.decode_ok]
    assert len(bad) == 1 and bad[0].n == 10       # 400 // 40 truncated
    ramped = sum(r.n for r in rows if r.ramped)
    static = sum(r.n for r in rows if r.decode_ok and not r.ramped)
    n_ramp = len([i for i in range(400) if i % 3 == 0 and i % 40 != 11])
    assert ramped == n_ramp and ramped + static + 10 == 400
    assert all(r.avg_motion < 60 for r in rows if r.ramped)
    assert all(r.avg_motion > 60 for r in rows
               if r.decode_ok and not r.ramped)


def test_video_frame_stats_spark_matches_reference(spark):
    rng = _rng(7)
    rows = []
    for i in range(8):
        frames = rng.integers(0, 256, size=(6 + i, 8, 8), dtype=np.uint8)
        rows.append(Row(vid_id=f"v{i}", bytes=bytearray(
            I.encode_y4m(frames))))
    rows.append(Row(vid_id="v_bad", bytes=bytearray(b"nope")))
    df = spark.createDataFrame(rows).repartition(3)
    got = I.video_frame_stats(df, every_k=2).toPandas().set_index("vid_id")
    assert len(got) == 9
    assert not got.loc["v_bad"]["decode_ok"]
    pdf = df.toPandas()
    for _, r in pdf.iterrows():
        if r["vid_id"] == "v_bad":
            continue
        n, w, h, m, mo = I.video_frame_stats_reference(bytes(r["bytes"]),
                                                       every_k=2)
        g = got.loc[r["vid_id"]]
        assert (g["n_frames"], g["width"], g["height"]) == (n, w, h)
        assert abs(g["mean_luma"] - m) < 1e-9
        assert abs(g["motion"] - mo) < 1e-9
        assert bool(g["decode_ok"])
