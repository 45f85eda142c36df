"""Pure-numpy RIFF/WAVE PCM16 codec (mono).

The audio sibling of ``functions/png.py`` / ``functions/jpeg.py``: no audio
library exists in this sandbox, and WAV's RIFF container is simple enough
to parse for real — so the audio decode stage runs ACTUAL BYTES end to end
(header walk, chunk validation, sample plane) instead of a stub.  The
writer exists for the fixture/fetch stand-in (``stages/audio.py``) and the
reader is the injectable decoder; both are deliberately strict so poison
payloads quarantine with clear errors (the ``parse_raw8`` convention,
``stages/media.py:85``).

Format subset: RIFF/WAVE, one ``fmt `` chunk (PCM tag 1, 1 channel,
16-bit), one ``data`` chunk.  Unknown chunks are skipped per spec (word
alignment honored), so files written by other tools still parse.
"""

from __future__ import annotations

import numpy as np

_FMT_PCM = 1


def encode_wav_pcm16(samples: np.ndarray, sample_rate: int) -> bytes:
    """``int16 samples (mono) -> RIFF/WAVE bytes`` (the real container)."""
    samples = np.ascontiguousarray(samples, dtype="<i2")
    data = samples.tobytes()
    byte_rate = sample_rate * 2
    fmt = (
        _FMT_PCM.to_bytes(2, "little")
        + (1).to_bytes(2, "little")  # channels
        + int(sample_rate).to_bytes(4, "little")
        + int(byte_rate).to_bytes(4, "little")
        + (2).to_bytes(2, "little")  # block align
        + (16).to_bytes(2, "little")  # bits per sample
    )
    body = (
        b"WAVE"
        + b"fmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
        + (b"\x00" if len(data) % 2 else b"")
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body


def parse_wav(payload: bytes) -> tuple[int, np.ndarray]:
    """``RIFF/WAVE bytes -> (sample_rate, int16 samples)``.

    Strict: truncated containers, non-PCM formats, multi-channel or
    non-16-bit streams all raise ``ValueError`` with the failing field —
    the quarantine contract of the audio decode stage."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE container")
    declared = int.from_bytes(payload[4:8], "little")
    if declared + 8 > len(payload):
        raise ValueError(
            f"truncated RIFF payload: declares {declared + 8}, have {len(payload)}"
        )
    pos = 12
    rate: int | None = None
    data: bytes | None = None
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        size = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise ValueError(f"truncated chunk {cid!r}: wants {size}, have {len(body)}")
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("fmt chunk too small")
            tag = int.from_bytes(body[0:2], "little")
            channels = int.from_bytes(body[2:4], "little")
            rate = int.from_bytes(body[4:8], "little")
            bits = int.from_bytes(body[14:16], "little")
            if tag != _FMT_PCM or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported format: tag={tag} channels={channels} bits={bits}"
                )
        elif cid == b"data":
            data = body
        pos += 8 + size + (size % 2)  # chunks are word-aligned
    if rate is None:
        raise ValueError("missing fmt chunk")
    if data is None:
        raise ValueError("missing data chunk")
    if len(data) % 2:
        raise ValueError("odd data chunk length for 16-bit samples")
    return rate, np.frombuffer(data, dtype="<i2")
