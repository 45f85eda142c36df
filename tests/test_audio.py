"""Audio modality stage: real RIFF/PCM16 decode + exact-integer features."""

import numpy as np
import pyarrow as pa
import pytest

from layout_analysis_ray.functions.wav import encode_wav_pcm16, parse_wav
from layout_analysis_ray.stages.audio import (
    AUDIO_SCHEMA,
    AudioFeaturizer,
    audio_features_exact,
    encode_wav_payloads,
    media_audio_features,
)


def test_wav_roundtrip_identity():
    rng = np.random.default_rng(7)
    samples = rng.integers(-32768, 32767, size=1023, dtype=np.int16)
    rate, decoded = parse_wav(encode_wav_pcm16(samples, 44_100))
    assert rate == 44_100
    np.testing.assert_array_equal(decoded, samples)
    # odd byte count exercises the RIFF word-alignment pad path
    rate2, decoded2 = parse_wav(encode_wav_pcm16(samples[:7], 8000))
    assert rate2 == 8000 and len(decoded2) == 7


@pytest.mark.parametrize(
    "mutate",
    [
        lambda b: b[:10],  # truncated container
        lambda b: b"JUNK" + b[4:],  # wrong magic
        lambda b: b[:40],  # truncated data chunk
        lambda b: b.replace(b"fmt ", b"fmtX", 1),  # fmt missing
    ],
)
def test_wav_parse_rejects_poison(mutate):
    good = encode_wav_pcm16(np.zeros(64, dtype=np.int16), 8000)
    with pytest.raises(ValueError):
        parse_wav(mutate(good))


def test_audio_features_exact_contract():
    """Independent recomputation of every feature on a known clip,
    including the negative-mean floor-division pin."""
    import math

    x = np.array([3, -4, 0, -4, 5, -6], dtype=np.int16)
    peak, zc, rms_milli, dc_milli = audio_features_exact(x)
    assert peak == 6
    # strict sign products: (3,-4) (-4,5)... zeros break adjacency
    assert zc == int(np.count_nonzero(x[1:].astype(int) * x[:-1].astype(int) < 0))
    sq = int((x.astype(np.int64) ** 2).sum())
    assert rms_milli == math.isqrt(1_000_000 * sq // len(x))
    assert dc_milli == 1000 * int(x.sum()) // len(x)  # floor, sum is -6 -> -1000
    assert dc_milli == -1000
    assert audio_features_exact(np.array([], dtype=np.int16)) == (0, 0, 0, 0)


def test_wav_fixture_deterministic_and_real():
    refs = ["img://doc1/0", "img://doc2/3"]
    a, b = encode_wav_payloads(refs), encode_wav_payloads(refs)
    assert a == b
    rate, samples = parse_wav(a[0])
    assert rate == 8000 and 512 <= len(samples) < 1536
    assert a[0] != a[1]


def test_audio_featurizer_quarantines_poison_rows():
    refs = ["r0", "r1", "r2"]
    payloads = encode_wav_payloads(refs)
    payloads[1] = payloads[1][:9]  # poison one payload
    batch = pa.table(
        {
            "doc_id": pa.array(["a", "b", "c"]),
            "media_ref": pa.array(refs),
            "media_bytes": pa.array(payloads, pa.binary()),
        }
    )
    out = AudioFeaturizer()(batch)
    assert out.schema.equals(AUDIO_SCHEMA)
    modes = out["decode_mode"].to_pylist()
    assert modes == ["real", "error", "real"]
    assert out["sample_rate"].to_pylist()[1] == -1
    # clean rows carry the exact shared-kernel features
    _, s0 = parse_wav(encode_wav_payloads(["r0"])[0])
    peak, zc, rms, dc = audio_features_exact(s0)
    assert out["peak_abs"].to_pylist()[0] == peak
    assert out["rms_milli"].to_pylist()[0] == rms


def test_media_audio_features_end_to_end(ray_session):
    """The full Ray pipeline over the sf0.001 corpus: every media span
    yields one decoded row, deterministic across runs."""
    sf = "/root/testdata/sf0.001"
    a = media_audio_features(sf, batch_size=128).to_pandas()
    assert len(a) > 0
    assert set(a["decode_mode"]) == {"real"}
    assert (a["sample_rate"] == 8000).all()
    assert (a["n_samples"] >= 512).all()
    b = media_audio_features(sf, batch_size=128).to_pandas()
    key = ["doc_id", "media_ref"]
    pa_ = a.sort_values(key).reset_index(drop=True)
    pb_ = b.sort_values(key).reset_index(drop=True)
    import pandas as pd

    pd.testing.assert_frame_equal(pa_, pb_)
