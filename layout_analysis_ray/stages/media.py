"""Multimodal media stages: decode / feature-extract as actor-pool stages.

The engine treats image/audio/video payloads as opaque references
(``media_ref`` string column; at 100 TB the bytes would live in object
storage and be fetched inside the actor) with typed metadata.  The decode
kernel itself is STUBBED in this sandbox — no image/audio libraries are
installed — behind a try-import: with PIL/cv2 present ``decode_mode`` becomes
"real"; here it is "stub", a deterministic sha256-derived fake that exercises
the full Ray-side plumbing (schema, batch size, actor pool signature, output
layout), which is what the tests pin down.

Reference analogue: ``load_img`` + per-doc model scoring
(``/root/reference/src/DocumentAnalyzer.py:105-109,44-50``) — an image decode
feeding a feature extractor; there it was scipy imread + TF session per doc,
here it is an actor pool with the "model" loaded once in ``__init__``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

FEAT_DIM = 16

MEDIA_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("n_frames", pa.int32()),
        ("decode_mode", pa.string()),
        ("embedding", pa.list_(pa.float32(), FEAT_DIM)),
    ]
)


def _try_real_decoder():
    try:  # pragma: no cover - not installed in this sandbox
        from PIL import Image  # noqa: F401

        return "real"
    except ImportError:
        return "stub"


# --- demo payload format ("RAW8"): the fixture image container ----------
#
# header (little-endian): u16 width | u16 height | u16 n_frames, followed
# by width*height*n_frames 8-bit gray pixels.  It exists so the demo
# decode path parses ACTUAL BYTES end to end — header fields, pixel
# plane, stride resampling — exactly the shape of a real image decode
# (ref ``/root/reference/src/DocumentAnalyzer.py:105-109``), with no
# image libraries in the sandbox.

_RAW8_HEADER = 6


def encode_demo_payloads(refs: list[str]) -> list[bytes]:
    """Deterministic RAW8 payload per media_ref — the stand-in for the
    object-storage FETCH stage (at 100 TB this map is `ref -> GET bytes`
    inside the actor; here the bytes are synthesized from sha256(ref) so
    every run and every worker fabricates identical payloads)."""
    out = []
    for r in refs:
        dig = hashlib.sha256(r.encode()).digest()
        w = 16 + dig[0] % 48
        h = 16 + dig[1] % 48
        f = 1 + dig[2] % 4
        n_px = w * h * f
        px = np.frombuffer(
            (dig * (n_px // len(dig) + 1))[:n_px], dtype=np.uint8
        )
        out.append(
            int(w).to_bytes(2, "little")
            + int(h).to_bytes(2, "little")
            + int(f).to_bytes(2, "little")
            + px.tobytes()
        )
    return out


def parse_raw8(payload: bytes) -> tuple[int, int, int, np.ndarray]:
    """Validated RAW8 parse: ``payload -> (width, height, n_frames,
    first-frame plane uint8[h, w])``.  The single header/pixel-plane
    reader shared by every RAW8 consumer (decode, deskew, overlay) so
    truncated or mis-sized payloads always fail with the same clear
    error instead of an opaque reshape ValueError; the plane is a
    zero-copy view into the payload bytes."""
    if len(payload) < _RAW8_HEADER:
        raise ValueError(f"truncated RAW8 payload ({len(payload)} bytes)")
    w = int.from_bytes(payload[0:2], "little")
    h = int.from_bytes(payload[2:4], "little")
    f = int.from_bytes(payload[4:6], "little")
    if len(payload) != _RAW8_HEADER + w * h * f:
        raise ValueError(
            f"RAW8 length mismatch: header says {w}x{h}x{f}, "
            f"payload {len(payload) - _RAW8_HEADER}"
        )
    plane = np.frombuffer(
        payload, dtype=np.uint8, count=w * h, offset=_RAW8_HEADER
    ).reshape(h, w)
    return w, h, f, plane


def demo_bytes_decoder(payloads: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """REAL decode of RAW8 payload bytes: parse the header, slice the
    first frame's pixel plane, resample it to 32 uniform-stride samples
    (the 'resize' of this format).  Implements the injectable decode
    contract ``payloads -> (raw uint8[n, 32], meta int32[n, 3])``; lives
    in the package (not a test module) because actor constructors must be
    importable on every worker."""
    n = len(payloads)
    raw = np.empty((n, 32), dtype=np.uint8)
    meta = np.empty((n, 3), dtype=np.int32)
    idx32 = np.arange(32, dtype=np.int64)
    for i, p in enumerate(payloads):
        w, h, f, plane = parse_raw8(p)
        frame = plane.reshape(-1)
        raw[i] = frame[(idx32 * (w * h)) // 32]
        meta[i] = (w, h, f)
    return raw, meta


def encode_png_payloads(refs: list[str]) -> list[bytes]:
    """PNG variant of the object-storage fetch stand-in: the SAME
    deterministic first-frame plane as the RAW8 payload for each ref
    (parse_raw8 of ``encode_demo_payloads``), compressed as a real
    grayscale PNG.  Pixel-identical planes across codecs make the PNG
    decode path directly comparable to the RAW8 path (pinned by test)."""
    from ..functions.png import encode_png_gray

    return [
        encode_png_gray(parse_raw8(p)[3]) for p in encode_demo_payloads(refs)
    ]


def encode_jpeg_payloads(refs: list[str]) -> list[bytes]:
    """Baseline-JPEG variant of the fetch stand-in: the same deterministic
    RAW8 first-frame plane per ref, entropy-coded as a real grayscale
    JPEG (quality 90, restart markers every 4 MCUs so the decoder's
    resync path runs on every fixture)."""
    from ..functions.jpeg import encode_jpeg_gray

    return [
        encode_jpeg_gray(parse_raw8(p)[3], quality=90, restart_interval=4)
        for p in encode_demo_payloads(refs)
    ]


def jpeg_bytes_decoder(payloads: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """REAL decode of baseline JPEG bytes (pure-Python Huffman entropy
    decode + vectorized IDCT, ``functions/jpeg.py``): luma plane -> 32
    uniform-stride samples, same contract as ``demo_bytes_decoder``;
    n_frames is 1.  JPEG is lossy, so samples approximate the RAW8
    plane within quantization error (tolerance-pinned by test) while
    dims match exactly.  Malformed payloads raise -> quarantine."""
    from ..functions.jpeg import decode_jpeg_gray

    n = len(payloads)
    raw = np.empty((n, 32), dtype=np.uint8)
    meta = np.empty((n, 3), dtype=np.int32)
    idx32 = np.arange(32, dtype=np.int64)
    for i, p in enumerate(payloads):
        plane = decode_jpeg_gray(p)
        h, w = plane.shape
        flat = plane.reshape(-1)
        raw[i] = flat[(idx32 * (w * h)) // 32]
        meta[i] = (w, h, 1)
    return raw, meta


def png_bytes_decoder(payloads: list[bytes]) -> tuple[np.ndarray, np.ndarray]:
    """REAL decode of compressed PNG bytes (pure-Python inflate +
    un-filtering, ``functions/png.py``): grayscale plane -> 32
    uniform-stride samples, same contract as ``demo_bytes_decoder``.
    PNG is single-frame, so n_frames is 1.  Malformed payloads raise
    (CRC-checked), which the featurizer quarantines per row."""
    from ..functions.png import decode_png_gray

    n = len(payloads)
    raw = np.empty((n, 32), dtype=np.uint8)
    meta = np.empty((n, 3), dtype=np.int32)
    idx32 = np.arange(32, dtype=np.int64)
    for i, p in enumerate(payloads):
        plane = decode_png_gray(p)
        h, w = plane.shape
        flat = plane.reshape(-1)
        raw[i] = flat[(idx32 * (w * h)) // 32]
        meta[i] = (w, h, 1)
    return raw, meta


class MediaFeaturizer:
    """map_batches actor: media_ref -> (dims, frames, embedding).

    ``__init__`` loads the decoder + featurizer once per actor (the stateful
    part); ``__call__`` is vectorized over the batch.  Batches should be
    sized in *bytes* not rows for real media (SURVEY.md §7.3): pass
    ``batch_size`` small when payloads are large.
    """

    init_count = 0

    def __init__(self, decoder=None, source_col: str = "media_ref") -> None:
        """``decoder``: optional real decode kernel with the contract
        ``payloads -> (raw uint8[n, 32], dims int32[n, >=3])`` (pixels +
        width/height/frame metadata), fed the values of ``source_col`` —
        a ``binary`` payload column (``media_bytes``) for byte decoders
        like ``demo_bytes_decoder``, or the ref strings for decoders that
        fetch themselves.  Injecting one switches ``decode_mode`` to
        "real" while every other part of the stage — schema, batch
        sizing, once-per-actor init, batched matmul inference — is shared
        with the stub path (the contract test pins this)."""
        MediaFeaturizer.init_count += 1
        self._decoder = decoder
        self._source_col = source_col
        self.decode_mode = "real" if decoder is not None else _try_real_decoder()
        # once-per-actor "model load": a fixed projection matrix
        rng = np.random.default_rng(12345)
        self._proj = rng.standard_normal((32, FEAT_DIM)).astype(np.float32)

    def _decode_stub(self, refs: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Deterministic fake decode: sha256(media_ref) -> pseudo-pixels +
        pseudo (width, height, n_frames)."""
        raw = np.empty((len(refs), 32), dtype=np.uint8)
        for i, r in enumerate(refs):
            raw[i] = np.frombuffer(hashlib.sha256(r.encode()).digest(), np.uint8)
        meta = np.empty((len(refs), 3), dtype=np.int32)
        meta[:, 0] = 256 + (raw[:, 0].astype(np.int32) << 3)
        meta[:, 1] = 256 + (raw[:, 1].astype(np.int32) << 3)
        meta[:, 2] = 1 + (raw[:, 2] % 4).astype(np.int32)
        return raw, meta

    def _decode_real(self, refs: list[str]) -> tuple[np.ndarray, np.ndarray]:
        if self._decoder is not None:
            return self._decoder(refs)
        # pragma: no cover — PIL path, not installed in this sandbox
        from PIL import Image

        raw = np.empty((len(refs), 32), dtype=np.uint8)
        meta = np.empty((len(refs), 3), dtype=np.int32)
        for i, r in enumerate(refs):
            img = Image.open(r).convert("L")
            meta[i] = (img.width, img.height, getattr(img, "n_frames", 1))
            raw[i] = np.asarray(img.resize((8, 4)), dtype=np.uint8).reshape(32)
        return raw, meta

    def _decode_real_isolated(
        self, payloads: list
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Batch decode with per-payload quarantine: try the whole batch
        first (zero overhead on the clean path), and only if it raises,
        retry item-by-item so ONE poison payload yields one error row
        instead of killing the task — the ``extract_error_docs`` pattern
        (``stages/assemble.py``), matching the reference's
        retry-with-replacement precedent
        (``src/train_detector.py:149,173-174``).  One bad object in
        100 TB of media must quarantine, not fail the stage."""
        n = len(payloads)
        try:
            raw, meta = self._decode_real(payloads)
            return raw, meta, np.ones(n, dtype=bool)
        except Exception:
            pass
        raw = np.zeros((n, 32), dtype=np.uint8)
        meta = np.full((n, 3), -1, dtype=np.int32)
        ok = np.zeros(n, dtype=bool)
        for i, p in enumerate(payloads):
            try:
                r1, m1 = self._decode_real([p])
                raw[i], meta[i], ok[i] = r1[0], m1[0][:3], True
            except Exception:
                pass
        return raw, meta, ok

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        ids = batch.column("doc_id")
        if self.decode_mode == "real":
            raw, meta, ok = self._decode_real_isolated(
                batch.column(self._source_col).to_pylist()
            )
        else:
            raw, meta = self._decode_stub(refs)
            ok = np.ones(len(refs), dtype=bool)

        width = meta[:, 0].astype(np.int32)
        height = meta[:, 1].astype(np.int32)
        n_frames = meta[:, 2].astype(np.int32)
        # batched "inference": one matmul for the whole batch
        feats = (raw.astype(np.float32) / 255.0) @ self._proj
        norms = np.linalg.norm(feats, axis=1, keepdims=True)
        feats = feats / np.maximum(norms, 1e-9)
        # quarantined rows: decode_mode "error", meta -1, zero embedding
        feats[~ok] = 0.0
        mode = [self.decode_mode if o else "error" for o in ok]

        return pa.table(
            {
                "doc_id": ids,
                "media_ref": batch.column("media_ref"),
                "width": pa.array(width, pa.int32()),
                "height": pa.array(height, pa.int32()),
                "n_frames": pa.array(n_frames, pa.int32()),
                "decode_mode": pa.array(mode, pa.string()),
                "embedding": pa.FixedSizeListArray.from_arrays(
                    pa.array(feats.reshape(-1), pa.float32()), FEAT_DIM
                ),
            },
            schema=MEDIA_SCHEMA,
        )


def media_pool_size(num_cpus: int) -> int:
    """Featurizer actor count for a session with ``num_cpus``: decode
    dominates the real-codec paths (~5/8 of the pipeline's CPU demand,
    measured on the JPEG Huffman+IDCT kernel vs the fetch/encode task
    stage), always leaving headroom so the read/fetch task ops never
    starve — a pool == num_cpus deadlocks the pipeline (the
    ``scorer_pool_size`` invariant, ``pipelines/extract.py:30``)."""
    return max(1, min(max(4, round(num_cpus * 5 / 8)), num_cpus - 1))


def media_features(
    sf_dir: str,
    *,
    concurrency=None,
    batch_size: int = 256,
    decoder=None,
    fetch=encode_demo_payloads,
    sample_mod: int | None = None,
):
    """Extract media spans from the interleaved corpus and featurize them.

    Small ``batch_size`` by design: with real payloads each row carries
    megabytes, so batches are bounded by bytes, not rows.  ``decoder``
    injects a real BYTES decode kernel (see ``MediaFeaturizer``); when
    one is injected, a fetch stage first materializes a ``media_bytes``
    payload column and the decoder parses those actual bytes.  ``fetch``
    is the ref->bytes kernel that stage runs (``refs -> list[bytes]``):
    ``encode_demo_payloads`` by default (the sandbox stand-in; an
    object-storage GET per ref on a real deployment), any callable to
    substitute a real fetch, or ``None`` to skip the fetch stage and
    hand the decoder the ``media_ref`` strings so it can fetch itself.

    ``concurrency=None`` (default) sizes the actor pool to the live
    session via ``media_pool_size`` — at 32 CPUs the decode stage gets
    ~20 actors instead of a fixed 4; pass an explicit tuple to override.

    ``sample_mod`` decodes a deterministic 1/mod sample of the media
    spans (md5-hash of ``media_ref`` — process-independent, the QA
    convention for expensive codecs over a huge corpus): the filter runs
    BEFORE the fetch stage so undecoded payload bytes never move.
    """
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
    if sample_mod is not None and sample_mod > 1:
        from ..functions.hashing import str_hash_u60

        mod = int(sample_mod)

        def keep_sample(b: pa.Table) -> pa.Table:
            h = str_hash_u60(b.column("media_ref"))
            return b.filter(pa.array(h % mod == 0))

        media = media.map_batches(keep_sample, batch_format="pyarrow")
    kwargs = {}
    if decoder is not None:
        if fetch is not None:
            def fetch_stage(b: pa.Table) -> pa.Table:
                return b.append_column(
                    "media_bytes",
                    pa.array(
                        fetch(b.column("media_ref").to_pylist()), pa.binary()
                    ),
                )

            media = media.map_batches(fetch_stage, batch_format="pyarrow")
            source_col = "media_bytes"
        else:
            source_col = "media_ref"
        kwargs["fn_constructor_kwargs"] = {
            "decoder": decoder,
            "source_col": source_col,
        }
    return media.map_batches(
        MediaFeaturizer,
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
        **kwargs,
    )


def frame_sample(sf_dir: str, k: int = 4, **feat_kwargs):
    """Uniform-stride frame sampling for multi-frame media (the brief's
    frame-sample stage): each media item expands to ``min(k, n_frames)``
    (doc_id, media_ref, frame_idx) rows with frame indices evenly spaced
    over [0, n_frames) — deterministic, so downstream per-frame decode
    fetches exactly the same frames on any rerun.

    Plumbing-real like the rest of the media path: frame COUNTS come from
    the featurizer's metadata (stub or injected real decoder); the
    expansion itself is a vectorized flat map (prefix sums + repeat), one
    row per sampled frame, streaming."""
    feats = media_features(sf_dir, **feat_kwargs)

    def expand(batch: pa.Table) -> pa.Table:
        nf = batch.column("n_frames").to_numpy(zero_copy_only=False).astype(np.int64)
        # quarantined decode rows carry n_frames == -1: sample zero frames
        take = np.minimum(np.maximum(nf, 0), k)
        total = int(take.sum())
        row = np.repeat(np.arange(len(nf)), take)
        # j-th sampled frame of item i: floor(j * n_frames[i] / take[i])
        j = np.arange(total) - np.repeat(np.cumsum(take) - take, take)
        frame_idx = (j * nf[row]) // np.maximum(take[row], 1)
        ids = batch.column("doc_id")
        refs = batch.column("media_ref")
        if isinstance(ids, pa.ChunkedArray):
            ids = ids.combine_chunks()
        if isinstance(refs, pa.ChunkedArray):
            refs = refs.combine_chunks()
        idx = pa.array(row)
        return pa.table(
            {
                "doc_id": ids.take(idx),
                "media_ref": refs.take(idx),
                "n_frames": pa.array(nf[row], pa.int32()),
                "frame_idx": pa.array(frame_idx.astype(np.int32), pa.int32()),
            }
        )

    return feats.map_batches(expand, batch_format="pyarrow")


# --- perceptual-hash near-dup (the image sibling of dedup_simhash) -------

PHASH_HAM_MAX = 3
PHASH_BANDS = 4  # 4 x 16-bit bands: pigeonhole-exhaustive for hamming<=3
_PHASH_N = 32
_PHASH_K = 8
_PHASH_PARTS = 64

PHASH_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("media_ref", pa.string()),
        ("phash", pa.int64()),  # uint64 bit pattern viewed as int64
        ("decode_mode", pa.string()),
    ]
)
PHASH_PAIRS_SCHEMA = pa.schema(
    [
        ("ref_a", pa.string()),
        ("ref_b", pa.string()),
        ("hamming", pa.int64()),
    ]
)


def _dct_basis(n: int = _PHASH_N) -> np.ndarray:
    k = np.arange(n, dtype=np.float64)[:, None]
    i = np.arange(n, dtype=np.float64)[None, :]
    d = np.cos(np.pi * (2 * i + 1) * k / (2 * n)) * np.sqrt(2.0 / n)
    d[0] /= np.sqrt(2.0)
    return d


def phash64(plane: np.ndarray, basis: np.ndarray | None = None) -> np.uint64:
    """Classic DCT perceptual hash of a grayscale plane: nearest-neighbor
    resample to 32x32, orthonormal DCT-II, the low-frequency 8x8 block
    thresholded at its median -> 64 bits.  Robust to resizing and small
    pixel noise; brittle to crops/rotations by design (pair with
    ``media_deskew`` upstream)."""
    if basis is None:
        basis = _dct_basis()
    h, w = plane.shape
    a = plane[
        (np.arange(_PHASH_N, dtype=np.int64) * h) // _PHASH_N
    ][:, (np.arange(_PHASH_N, dtype=np.int64) * w) // _PHASH_N].astype(
        np.float64
    )
    c = basis @ a @ basis.T
    block = c[:_PHASH_K, :_PHASH_K].ravel()
    bits = block > np.median(block)
    return np.uint64(
        np.dot(bits.astype(np.uint64), 1 << np.arange(64, dtype=np.uint64))
    )


class MediaPHasher:
    """map_batches actor: media payload bytes -> 64-bit perceptual hash.
    The DCT basis is the once-per-actor state; ``plane_fn`` is the
    injectable full-plane decode (default: the RAW8 parser; swap in the
    PNG/JPEG codecs for compressed corpora).  Poison payloads quarantine
    per item (decode_mode 'error', phash 0) — the MediaFeaturizer
    pattern."""

    def __init__(self, plane_fn=None) -> None:
        self._basis = _dct_basis()
        self._plane_fn = plane_fn or (lambda p: parse_raw8(p)[3])

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("media_bytes").to_pylist()
        hashes = np.zeros(len(payloads), dtype=np.uint64)
        mode = []
        for i, p in enumerate(payloads):
            try:
                hashes[i] = phash64(self._plane_fn(p), self._basis)
                mode.append("real")
            except Exception:
                mode.append("error")
        return pa.table(
            {
                "doc_id": batch.column("doc_id"),
                "media_ref": batch.column("media_ref"),
                "phash": pa.array(hashes.view(np.int64), pa.int64()),
                "decode_mode": pa.array(mode, pa.string()),
            },
            schema=PHASH_SCHEMA,
        )


def media_phash(
    sf_dir: str,
    *,
    concurrency=None,
    batch_size: int = 256,
    fetch=encode_demo_payloads,
    plane_fn=None,
    sample_mod: int | None = None,
):
    """Per-image perceptual hashes over the interleaved corpus's media
    spans — the media_features plumbing (extract -> media filter ->
    optional deterministic ref-hash sample -> fetch -> actor pool) with
    the pHash kernel in the pool."""
    import pyarrow.compute as pc

    from ..pipelines.extract import explode, extract_pipeline
    from ..sources.synth import docs_from_parquet

    if concurrency is None:
        import ray

        cpus = (
            int(ray.cluster_resources().get("CPU", 4))
            if ray.is_initialized()
            else 4
        )
        concurrency = (1, media_pool_size(cpus))

    spans = explode(extract_pipeline(docs_from_parquet(sf_dir)))
    media = spans.map_batches(
        lambda b: b.filter(pc.not_equal(b.column("media_ref"), "")),
        batch_format="pyarrow",
    )
    if sample_mod is not None and sample_mod > 1:
        from ..functions.hashing import str_hash_u60

        mod = int(sample_mod)

        def keep_sample(b: pa.Table) -> pa.Table:
            h = str_hash_u60(b.column("media_ref"))
            return b.filter(pa.array(h % mod == 0))

        media = media.map_batches(keep_sample, batch_format="pyarrow")

    def do_fetch(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "doc_id": b.column("doc_id"),
                "media_ref": b.column("media_ref"),
                "media_bytes": pa.array(
                    fetch(b.column("media_ref").to_pylist()), pa.binary()
                ),
            }
        )

    return media.map_batches(do_fetch, batch_format="pyarrow").map_batches(
        MediaPHasher,
        fn_constructor_kwargs={"plane_fn": plane_fn},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
        num_cpus=1,
    )


def phash_pairs_from_hashes(hashes):
    """(media_ref, phash) Dataset -> all pairs within PHASH_HAM_MAX
    hamming distance, exhaustive by pigeonhole over PHASH_BANDS disjoint
    16-bit bands — the simhash_pairs kernel re-keyed on media refs.
    Only (part, band_key, ref, phash) rows shuffle; pairing is a coarse
    partition kernel with vectorized XOR-popcount hamming."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..functions.schema import ensure_schema

    def band_rows(batch: pa.Table) -> pa.Table:
        batch = batch.filter(
            pc.not_equal(batch.column("decode_mode"), "error")
        ) if "decode_mode" in batch.column_names else batch
        refs = batch["media_ref"].to_numpy(zero_copy_only=False)
        ph = batch["phash"].to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(refs)
        bands = np.empty((n, PHASH_BANDS), dtype=np.int64)
        for b in range(PHASH_BANDS):
            bands[:, b] = (
                (ph >> np.uint64(16 * b)) & np.uint64(0xFFFF)
            ).astype(np.int64)
        band_ids = np.tile(np.arange(PHASH_BANDS, dtype=np.int64), n)
        key = bands.reshape(-1) * PHASH_BANDS + band_ids
        return pa.table(
            {
                "part": pa.array(
                    (key % _PHASH_PARTS).astype(np.int32), pa.int32()
                ),
                "band_key": pa.array(key, pa.int64()),
                "media_ref": pa.array(
                    np.repeat(refs, PHASH_BANDS), pa.string()
                ),
                "ph": pa.array(
                    np.repeat(ph.view(np.int64), PHASH_BANDS), pa.int64()
                ),
            }
        )

    bands = hashes.map_batches(band_rows, batch_format="pyarrow")

    def partition_pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b, out_h = [], [], []
        for _, grp in g.groupby("band_key", sort=False):
            grp = grp.drop_duplicates("media_ref")
            if len(grp) < 2:
                continue
            refs = grp["media_ref"].to_numpy()
            ph = grp["ph"].to_numpy().astype(np.int64).view(np.uint64)
            order = np.argsort(refs)
            refs, ph = refs[order], ph[order]
            ia, ib = np.triu_indices(len(refs), k=1)
            x = ph[ia] ^ ph[ib]
            ham = (
                np.unpackbits(x.view(np.uint8).reshape(len(x), 8), axis=1)
                .sum(axis=1)
                .astype(np.int64)
            )
            keep = ham <= PHASH_HAM_MAX
            out_a.append(refs[ia[keep]])
            out_b.append(refs[ib[keep]])
            out_h.append(ham[keep])
        return pd.DataFrame(
            {
                "ref_a": (
                    np.concatenate(out_a) if out_a else np.empty(0, object)
                ),
                "ref_b": (
                    np.concatenate(out_b) if out_b else np.empty(0, object)
                ),
                "hamming": (
                    np.concatenate(out_h) if out_h else np.empty(0, np.int64)
                ),
            }
        ).drop_duplicates(["ref_a", "ref_b"])

    pairs = bands.groupby("part").map_groups(
        partition_pairs, batch_format="pandas"
    )

    # cross-band dedup on the STRING pair key (dedup_pair_rows is int64;
    # refs hash part-by-part with categorize=False per the CLAUDE.md
    # embedded-NUL caveat, never a joined "a\x00b" string)
    def add_ppart(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch.append_column("__ppart", pa.array([], pa.int64()))
        ha = pd.util.hash_array(
            batch["ref_a"].to_numpy(zero_copy_only=False).astype(object),
            categorize=False,
        )
        hb = pd.util.hash_array(
            batch["ref_b"].to_numpy(zero_copy_only=False).astype(object),
            categorize=False,
        )
        key = ha * np.uint64(0x9E3779B97F4A7C15) ^ hb
        key ^= key >> np.uint64(29)
        return batch.append_column(
            "__ppart", pa.array((key % np.uint64(64)).astype(np.int64))
        )

    def drop(g: pd.DataFrame) -> pd.DataFrame:
        return g.drop_duplicates(["ref_a", "ref_b"]).drop(columns="__ppart")

    return ensure_schema(
        pairs.map_batches(add_ppart, batch_format="pyarrow")
        .groupby("__ppart")
        .map_groups(drop, batch_format="pandas"),
        PHASH_PAIRS_SCHEMA,
    )


def media_phash_neardup_pairs(sf_dir: str, **kwargs):
    """Image near-dup pairs over the corpus's media spans: pHash in the
    decode actor pool, then the banded pair join.  The multimodal
    sibling of ``dedup_simhash_pairs``."""
    return phash_pairs_from_hashes(media_phash(sf_dir, **kwargs))
