"""Audio modality stage: real WAV decode + exact-integer feature extraction.

The audio sibling of ``stages/media.py``: the corpus's media refs stand in
for audio object keys, a fetch stage materializes REAL RIFF/PCM16 bytes
per ref (deterministic synthesis — an object-storage GET on a real
deployment), and an actor-pool ``map_batches`` stage parses those bytes
with the pure-numpy codec (``functions/wav.py``) and emits exact-integer
features, so every value is golden-pinnable with no float drift:

- ``rms_milli`` = isqrt(10^6 * Σx² // n) — integer milli-RMS
- ``zero_crossings`` = strict sign-change count
- ``peak_abs``, ``dc_milli`` (floor-divided mean), ``n_samples``,
  ``sample_rate``

Poison payloads quarantine per item (``decode_mode='error'``), never the
task — the ``_decode_real_isolated`` contract of the image stage.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pyarrow as pa

from ..functions.wav import encode_wav_pcm16, parse_wav
from .media import media_pool_size

AUDIO_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("sample_rate", pa.int32()),
        ("n_samples", pa.int32()),
        ("peak_abs", pa.int32()),
        ("zero_crossings", pa.int32()),
        ("rms_milli", pa.int64()),
        ("dc_milli", pa.int64()),
        ("decode_mode", pa.string()),
    ]
)

_WAV_RATE = 8000


def encode_wav_payloads(refs: list[str]) -> list[bytes]:
    """Deterministic PCM16 payload per media_ref — the audio fetch
    stand-in (sha256-derived, so every run and worker fabricates
    identical bytes).  The waveform is pure integer math (a triangle
    carrier plus digest noise), so downstream features are bit-exact on
    any platform — no ``np.sin`` in the fixture path."""
    out = []
    for r in refs:
        dig = hashlib.sha256(r.encode()).digest()
        n = 512 + int.from_bytes(dig[0:2], "little") % 1024
        period = 16 + dig[2] % 48
        amp = 2000 + dig[3] * 64  # <= 18320, safely inside int16
        t = np.arange(n, dtype=np.int64)
        phase = t % period
        tri = (amp * (2 * np.minimum(phase, period - phase)) // period) - amp // 2
        noise = np.frombuffer(
            (dig * (n // len(dig) + 1))[:n], dtype=np.uint8
        ).astype(np.int64)
        samples = (tri + (noise - 128) * 8).astype(np.int16)
        out.append(encode_wav_pcm16(samples, _WAV_RATE))
    return out


def audio_features_exact(samples: np.ndarray) -> tuple[int, int, int, int]:
    """(peak_abs, zero_crossings, rms_milli, dc_milli) in exact integers.

    Shared by the actor and the test oracle so the contract lives once:
    sums fold in int64 (n * 32767^2 stays < 2^63 for n < 8.5e9 — loudly
    guarded), the RMS is ``isqrt(10^6 * Σx² // n)``, and the DC mean uses
    Python floor division (negative-sum semantics pinned by test)."""
    n = len(samples)
    if n == 0:
        return 0, 0, 0, 0
    x = samples.astype(np.int64)
    if n > 8_500_000_000:  # 2^63 / 32767^2 headroom for the square sum
        raise ValueError(f"audio clip too long for int64 energy fold: {n}")
    peak = int(np.abs(x).max())
    zc = int(np.count_nonzero(x[1:] * x[:-1] < 0))
    sq = int((x * x).sum())
    rms_milli = math.isqrt(1_000_000 * sq // n)
    dc_milli = 1000 * int(x.sum()) // n
    return peak, zc, rms_milli, dc_milli


class AudioFeaturizer:
    """map_batches actor: WAV payload bytes -> exact-integer features.

    ``__init__`` is the once-per-actor stateful part (decoder binding);
    ``__call__`` decodes the batch with per-payload quarantine."""

    init_count = 0

    def __init__(self, source_col: str = "media_bytes") -> None:
        AudioFeaturizer.init_count += 1
        self._source_col = source_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column(self._source_col).to_pylist()
        n = len(payloads)
        rate = np.full(n, -1, dtype=np.int32)
        nsamp = np.full(n, -1, dtype=np.int32)
        peak = np.zeros(n, dtype=np.int32)
        zc = np.zeros(n, dtype=np.int32)
        rms = np.zeros(n, dtype=np.int64)
        dc = np.zeros(n, dtype=np.int64)
        ok = np.zeros(n, dtype=bool)
        for i, p in enumerate(payloads):
            try:  # per-payload quarantine: one poison object = one error row
                r, samples = parse_wav(p)
                peak[i], zc[i], rms[i], dc[i] = audio_features_exact(samples)
                rate[i], nsamp[i], ok[i] = r, len(samples), True
            except (ValueError, OverflowError):
                pass
        mode = ["real" if o else "error" for o in ok]
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "sample_rate": pa.array(rate, pa.int32()),
                "n_samples": pa.array(nsamp, pa.int32()),
                "peak_abs": pa.array(peak, pa.int32()),
                "zero_crossings": pa.array(zc, pa.int32()),
                "rms_milli": pa.array(rms, pa.int64()),
                "dc_milli": pa.array(dc, pa.int64()),
                "decode_mode": pa.array(mode, pa.string()),
            },
            schema=AUDIO_SCHEMA,
        )


def media_audio_features(
    sf_dir: str,
    *,
    concurrency=None,
    batch_size: int = 256,
    fetch=encode_wav_payloads,
):
    """Audio pipeline: media spans -> fetch WAV bytes -> actor-pool decode
    + exact-integer features.  Mirrors ``media_features``'s shape (small
    byte-bounded batches, pool sized by ``media_pool_size`` with task-op
    headroom); the fetch stage is a task op so payload bytes stream
    through the object store and never accumulate on the driver."""
    import pyarrow.compute as pc

    from ..pipelines.extract import explode, extract_pipeline
    from ..sources.synth import docs_from_parquet

    if concurrency is None:
        import ray

        cpus = int(ray.cluster_resources().get("CPU", 4)) if ray.is_initialized() else 4
        concurrency = (1, media_pool_size(cpus))

    spans = explode(extract_pipeline(docs_from_parquet(sf_dir)))
    media = spans.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("media_ref"), "")),
        batch_format="pyarrow",
    )

    def fetch_stage(b: pa.Table) -> pa.Table:
        return b.append_column(
            "media_bytes",
            pa.array(fetch(b.column("media_ref").to_pylist()), pa.binary()),
        )

    return media.map_batches(fetch_stage, batch_format="pyarrow").map_batches(
        AudioFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )
