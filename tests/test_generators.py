"""Fixture generator determinism + FIXTURES.md shape conformance."""

import numpy as np

from drift_detection_pibic___framework_spark.functions import audio
from drift_detection_pibic___framework_spark.sources import generators as G


def test_partition_generation_deterministic():
    a, ar = G.generate_clips_partition(4, 200)
    b, br = G.generate_clips_partition(4, 200)
    assert a.equals(b) and ar.equals(br)


def test_schema_and_id_format():
    t, _ = G.generate_clips_partition(0, 50)
    assert t.schema.equals(G.CLIPS_SCHEMA)
    ids = t.column("clip_id").to_pylist()
    assert ids[0] == "clip-0000-00000000"
    assert len(set(ids)) == 50  # p0 has no dup injection


def test_length_consistency_rule():
    """len(decoded_pcm) == round(dur_ms * STORE_RATE / 1000) for valid rows."""
    t, _ = G.generate_clips_partition(1, 100)
    d = t.to_pydict()
    for buf, dur, codec in zip(d["bytes"], d["dur_ms"], d["codec"]):
        dec = audio.decode(buf, codec)
        assert len(dec) == round(dur * G.STORE_RATE / 1000)


def test_ref_copy_is_pristine_and_snr_exact():
    t, r = G.generate_clips_partition(10, 300)  # p10: null transcripts injected
    tt, rt = t.column("transcript").to_pylist(), r.column("transcript").to_pylist()
    nulls = [i for i, x in enumerate(tt) if x is None]
    assert nulls, "p10 must have injected nulls"
    for i in nulls:
        assert rt[i] is not None
    # bytes are NOT corrupted in the default fixture -> SNR vs ref is +inf
    tb, rb = t.column("bytes").to_pylist(), r.column("bytes").to_pylist()
    cods = t.column("codec").to_pylist()
    for i in range(0, 300, 50):
        a = audio.decode(tb[i], cods[i])
        b = audio.decode(rb[i], cods[i])
        assert audio.snr_db(b, a) == float("inf")


def test_drift_stream_change_points():
    pdf = G.generate_drift_streams().to_pandas()
    ab = pdf[pdf.stream_id == "abrupt_mean"].sort_values("seq")["value"].to_numpy()
    assert abs(ab[:1000].mean()) < 0.02
    assert abs(ab[1000:].mean() - 0.5) < 0.02
    nd = pdf[pdf.stream_id == "no_drift"]["value"].to_numpy()
    assert abs(nd.mean()) < 0.02 and nd.std() < 0.1
    vs = pdf[pdf.stream_id == "variance_shift"].sort_values("seq")["value"].to_numpy()
    assert vs[1000:].std() / vs[:1000].std() > 3.0


def test_codec_hot_key_skew():
    t, _ = G.generate_clips_partition(0, 2000)
    codecs = t.column("codec").to_pylist()
    frac = codecs.count("pcm_s16le") / len(codecs)
    assert 0.75 < frac < 0.85  # the 80% hot key (salting target)


def test_fixture_mtimes_are_part_ordered(tmp_path):
    """Streaming consumers batch files by MODIFICATION TIME, so the
    fixture contract includes mtimes strictly increasing in part order —
    even though partitions are written by parallel workers that finish
    in arbitrary order (ensure_fixtures normalizes them; without it,
    epoch-keyed assertions are order-of-generation flaky)."""
    import os

    d = G.ensure_fixtures("sf0.001")
    for sub in ("clips", "clips_ref"):
        pd_ = os.path.join(d, sub)
        files = sorted(f for f in os.listdir(pd_)
                       if f.startswith("part-") and f.endswith(".parquet"))
        mt = [os.path.getmtime(os.path.join(pd_, f)) for f in files]
        assert all(a < b for a, b in zip(mt, mt[1:])), (sub, mt)
    # idempotent: a second call must not move any mtime
    before = {f: os.path.getmtime(os.path.join(d, "clips", f))
              for f in os.listdir(os.path.join(d, "clips"))}
    G.ensure_fixtures("sf0.001")
    after = {f: os.path.getmtime(os.path.join(d, "clips", f))
             for f in os.listdir(os.path.join(d, "clips"))}
    assert before == after
