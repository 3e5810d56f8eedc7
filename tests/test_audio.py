"""G.711 / PCM codec units: roundtrip SNR, vector shapes, dispatch."""

import numpy as np
import pytest

from drift_detection_pibic___framework_spark.functions import audio


def _sig(n=2000, f=440.0, rate=2000):
    rng = np.random.default_rng(7)
    return 0.3 * np.sin(2 * np.pi * f * np.arange(n) / rate) + rng.normal(0, 0.01, n)


@pytest.mark.parametrize("codec", audio.SUPPORTED_CODECS)
def test_roundtrip_snr(codec):
    pcm = audio.float_to_int16(_sig())
    dec = audio.decode(audio.encode(pcm, codec), codec)
    assert len(dec) == len(pcm)
    # G.711 companding yields ~35-38 dB on speech-band signals; s16le is exact
    assert audio.snr_db(pcm, dec) >= 30.0


def test_pcm_s16le_exact():
    pcm = audio.float_to_int16(_sig())
    assert np.array_equal(audio.decode(audio.encode(pcm, "pcm_s16le"), "pcm_s16le"), pcm)


@pytest.mark.parametrize("codec", ["mulaw", "alaw"])
def test_g711_full_range_monotone(codec):
    """Companding must roundtrip the full int16 range within segment error
    and preserve sign."""
    x = np.linspace(-32768, 32767, 4097).astype(np.int16)
    dec = audio.decode(audio.encode(x, codec), codec)
    big = np.abs(x.astype(np.int32)) > 64
    err = np.abs(dec.astype(np.int32) - x.astype(np.int32))[big]
    mag = np.abs(x.astype(np.int32))[big]
    # error bounded by half the segment quantization step (16-level mantissa
    # => <= ~6.25% per log segment; linear low segment => abs step <= 16)
    assert np.all((err / mag < 0.07) | (err <= 16))
    assert np.all(np.sign(dec[big]) == np.sign(x[big]))


def test_snr_edge_cases():
    a = audio.float_to_int16(_sig())
    assert audio.snr_db(a, a) == float("inf")
    assert audio.snr_db(a, a[:-1]) == float("-inf")
    assert audio.snr_db(np.zeros(5, np.int16), np.ones(5, np.int16)) == float("-inf")


def test_unknown_codec_falls_back_to_s16le():
    pcm = audio.float_to_int16(_sig(100))
    assert audio.decode(audio.encode(pcm, "opus"), "opus").tolist() == pcm.tolist()
