"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Decode is REAL for the containers the stdlib can parse — PNG
(zlib inflate + scanline unfilter) and RIFF/PCM WAV (the ``wave``
module) via :mod:`.codecs`, with PIL/soundfile as optional wideners
behind import-try. A payload that is one of those containers goes
through the actual codec: header-derived dimensions, decoded-pixel
statistics, true nearest-neighbor resampling, PCM sample windows.
Payloads that are NOT a media container (the synthetic corpus the
oracle binds against) take the documented deterministic fallback —
same ``mapInPandas`` chain, same Arrow batch shape, either way.
"""
from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import portable_hash60, tokens
from . import codecs
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FEATURE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("checksum", StringType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("byte_mean", LongType()),
    ]
)


def synth_media(docs: DataFrame) -> DataFrame:
    """Attach a synthetic binary 'image' column + metadata struct.

    Payload bytes derive deterministically from the text (utf-8);
    width/height come from the engine-portable 60-bit md5 hash
    (``functions.portable_hash60``) so the DuckDB oracle can
    recompute them, via bit ops (exact — no double rounding).
    """
    payload = F.encode("text", "utf-8").cast(BinaryType())
    h = portable_hash60("text")
    meta = F.struct(
        (h.bitwiseAND(F.lit(1023)) + 64).cast("long").alias("width"),
        (F.shiftrightunsigned(h, 10).bitwiseAND(F.lit(1023)) + 64).cast("long").alias("height"),
        F.lit("image/fake").alias("mime"),
    )
    return docs.select("doc_id", payload.alias("media"), meta.alias("meta"))


def _extract_one(payload: bytes, meta_w: int | None, meta_h: int | None) -> dict:
    """Per-payload feature extraction. Real containers decode for
    real: a PNG's width/height come from its IHDR and byte_mean from
    the DECODED pixels; a WAV's 'width' is its frame count, 'height'
    its channel count, byte_mean over the decoded PCM stream. A
    non-container payload (synthetic corpus) keeps the deterministic
    fallback — metadata dimensions, raw-byte mean — so the oracle
    twin stays recomputable."""
    kind = codecs.sniff(payload)
    if kind == "png":
        w, h, _ch, px = codecs.decode_png(payload)
        return {
            "n_bytes": len(payload),
            "checksum": hashlib.md5(payload).hexdigest(),
            "width": w,
            "height": h,
            "byte_mean": sum(px) // max(len(px), 1),
        }
    if kind == "wav":
        _rate, channels, sampwidth, pcm = codecs.decode_wav(payload)
        return {
            "n_bytes": len(payload),
            "checksum": hashlib.md5(payload).hexdigest(),
            "width": len(pcm) // max(channels * sampwidth, 1),
            "height": channels,
            "byte_mean": sum(pcm) // max(len(pcm), 1),
        }
    return {
        "n_bytes": len(payload),
        "checksum": hashlib.md5(payload).hexdigest(),
        "width": meta_w,
        "height": meta_h,
        "byte_mean": sum(payload) // max(len(payload), 1),
    }


def extract_features(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over Arrow record batches; real
    codec per payload (PNG/WAV), metadata fallback otherwise."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = (
                pdf["meta"]
                if "meta" in pdf.columns
                else [None] * len(pdf)
            )
            feats = [
                _extract_one(
                    bytes(b),
                    None if m is None else m["width"],
                    None if m is None else m["height"],
                )
                for b, m in zip(pdf["media"], metas)
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [f["n_bytes"] for f in feats],
                    "checksum": [f["checksum"] for f in feats],
                    "width": pd.array(
                        [f["width"] for f in feats], dtype="Int64"
                    ),
                    "height": pd.array(
                        [f["height"] for f in feats], dtype="Int64"
                    ),
                    "byte_mean": [f["byte_mean"] for f in feats],
                }
            )

    return media.mapInPandas(run, FEATURE_SCHEMA)


RESIZE_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("media", BinaryType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
    ]
)


def resize(media: DataFrame, target_w: int, target_h: int) -> DataFrame:
    """Resize over Arrow batches. A PNG payload is REALLY resized:
    stdlib decode → vectorized nearest-neighbor resample of the
    decoded pixels → re-encode as a valid PNG at the target size. A
    non-image payload keeps the deterministic fallback (truncate/tile
    bytes to the target area) so the synthetic-corpus oracle still
    binds. Same batch shape and schema on both paths."""

    def _fake_resample(payload: bytes, area: int) -> bytes:
        if not payload:
            return b"\x00" * area
        reps = area // len(payload) + 1
        return (payload * reps)[:area]

    def _one(payload: bytes, area: int) -> bytes:
        if codecs.is_png(payload):
            w, h, ch, px = codecs.decode_png(payload)
            out = codecs.resize_nearest(px, w, h, ch, target_w, target_h)
            return codecs.encode_png(target_w, target_h, out, channels=ch)
        return _fake_resample(payload, area)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        area = target_w * target_h
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "media": [_one(bytes(b), area) for b in pdf["media"]],
                    "width": target_w,
                    "height": target_h,
                }
            )

    return media.mapInPandas(run, RESIZE_SCHEMA)


FRAME_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("frame_idx", LongType()),
        StructField("frame", BinaryType()),
    ]
)


def frame_sample(media: DataFrame, n_frames: int = 4, frame_bytes: int = 64) -> DataFrame:
    """Video frame sampling: one input row fans out to up to
    ``n_frames`` rows (the 1→N batch shape a real decoder produces).

    A payload that IS a video container (MP4/MKV/AVI —
    ``codecs.is_video``) goes through REAL keyframe extraction with
    PyAV when importable (``codecs.decode_video_keyframes``; each
    frame comes back PNG-encoded), and raises the loud
    ``UnsupportedMediaError`` when the codec is absent — a real video
    must never silently degrade to byte slices. Non-video payloads
    (the synthetic corpus the oracle binds against) take the
    documented deterministic fallback: evenly-spaced byte slices,
    same row-explosion plumbing either way."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, frames = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(b)
                if codecs.is_video(payload):
                    for i, (_w, _h, png) in enumerate(
                        codecs.decode_video_keyframes(payload, n_frames)
                    ):
                        ids.append(int(doc_id))
                        idxs.append(i)
                        frames.append(png)
                    continue
                for i in range(n_frames):
                    off = (len(payload) * i) // max(n_frames, 1)
                    ids.append(int(doc_id))
                    idxs.append(i)
                    frames.append(payload[off : off + frame_bytes])
            yield pd.DataFrame({"doc_id": ids, "frame_idx": idxs, "frame": frames})

    return media.mapInPandas(run, FRAME_SCHEMA)


WINDOW_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("win_idx", LongType()),
        StructField("win", BinaryType()),
    ]
)


def frame_windows(
    media: DataFrame, frame_bytes: int = 64, hop_bytes: int = 32
) -> DataFrame:
    """Audio-style sliding-window framing: the payload is sliced into
    overlapping windows of ``frame_bytes`` advancing by ``hop_bytes``
    (the STFT/feature-frame batch shape an audio pipeline produces).
    A WAV payload is REALLY decoded first (stdlib ``wave``) and the
    windows slide over its PCM sample stream — actual audio frames;
    a non-audio payload windows its raw bytes (synthetic-corpus
    fallback). Every offset < stream length starts a window; the
    final windows are ragged (shorter than ``frame_bytes``) exactly
    as a real framer emits them. The 1→N fan-out runs inside one
    ``mapInPandas`` iterator — Arrow batches in, Arrow batches out,
    no Python-per-row serialization."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, wins = [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                payload = bytes(b)
                if codecs.is_wav(payload):
                    payload = codecs.decode_wav(payload)[3]
                start, i = 0, 0
                while start < len(payload):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    wins.append(payload[start : start + frame_bytes])
                    start += hop_bytes
                    i += 1
            yield pd.DataFrame({"doc_id": ids, "win_idx": idxs, "win": wins})

    return media.mapInPandas(run, WINDOW_SCHEMA)


# ---- perceptual-hash image near-dup (d50) -------------------------------
# Grid geometry of the synthetic "thumbnail": 8x8 grayscale cells, so
# the difference hash over row-adjacent cell pairs is 8 rows x 7
# comparisons = 56 bits — deliberately < 63 so the fingerprint stays
# non-negative in a signed int64 on BOTH engines (the same headroom
# rationale as functions.portable_hash60's 60-bit cut; a 64-bit dHash
# would need 1<<63, which overflows signed BIGINT in DuckDB).
DHASH_GRID_W = 8
DHASH_GRID_H = 8
DHASH_CELLS = DHASH_GRID_W * DHASH_GRID_H
DHASH_BITS = (DHASH_GRID_W - 1) * DHASH_GRID_H  # 56


def synth_token_png(docs: DataFrame) -> DataFrame:
    """(doc_id, media): a REAL 8×8 grayscale PNG per document whose
    pixel cells are the doc's distinct-token bucket histogram —
    cell i = min(#distinct tokens with portable_hash60(tok) % 64 == i,
    255). Near-duplicate documents share most tokens, so their
    thumbnails differ in few cells and their difference hashes land
    within a small Hamming radius — the deterministic stand-in for
    "similar images have similar pHashes" that the oracle can
    recompute from the text (the corpus ships no real images; the PNG
    container, filters and zlib stream are REAL and round-trip the
    cells losslessly, so :func:`dhash56`'s decode is a true codec
    path, same discipline as extract_features).

    The token buckets are computed JVM-side with the exact
    tokenizer + portable hash the dedup family twins use
    (functions.tokens / portable_hash60), so the Python stage only
    counts and encodes — no tokenization-semantics drift between the
    engines can hide in the UDF.

    Scale shape: one linear projection + one Arrow ``mapInPandas``
    pass (O(doc) rows in, O(doc) rows out, payloads ~100 B)."""
    ts = docs.select(
        "doc_id",
        F.array_remove(F.array_distinct(tokens("text")), "").alias("toks"),
    )
    return synth_token_png_from_sets(ts)


def synth_token_png_from_sets(ts: DataFrame) -> DataFrame:
    """:func:`synth_token_png` over a precomputed token-set table
    ``(doc_id, toks)`` — the thumbnail is a pure function of the
    token SET (distinct-token histogram), which is exactly what lets
    the dedup family's identical-set rep collapse carry the
    perceptual-hash pipeline (queries/dedup_family.py): reps stand in
    for members, hashes expand back."""
    buckets = F.transform(
        F.col("toks"), lambda t: portable_hash60(t) % DHASH_CELLS
    )
    src = ts.select("doc_id", buckets.alias("cells_src"))
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            medias = [_png_of_cells(cl) for cl in pdf["cells_src"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": medias})

    return src.mapInPandas(run, schema)


def _png_of_cells(cl) -> bytes:
    """The ONE copy of the bucket-histogram → real 8×8 grayscale PNG
    rule (shared by the composed synth ops and the fused
    synth→decode→hash passes, so the two paths cannot drift)."""
    counts = [0] * DHASH_CELLS
    for c in cl:
        counts[int(c)] += 1
    return codecs.encode_png(
        DHASH_GRID_W,
        DHASH_GRID_H,
        bytes(min(v, 255) for v in counts),
        channels=1,
    )


def synth_token_video(docs: DataFrame, n_frames: int = 4) -> DataFrame:
    """(doc_id, media): a REAL RIFF/AVI Motion-PNG video per document
    — the token SEQUENCE split into ``n_frames`` contiguous chunks,
    each chunk's distinct-token bucket histogram rendered as an 8×8
    grayscale PNG frame (the :func:`synth_token_png` rule at frame
    grain), the frames wrapped in a real AVI container
    (codecs.encode_avi_mjpeg with the 'MPNG' fourcc). Documents that
    share long stretches of text share frame thumbnails, so a
    frame-level perceptual hash finds partially-overlapping videos —
    the deterministic stand-in for near-dup video detection that the
    oracle can recompute from the text, with every container/codec
    step REAL (chunk walk, PNG encode/decode). Chunk i covers token
    positions [ceil(i·L/n), ceil((i+1)·L/n)) — identical to the
    per-position rule (pos·n) div L the SQL twin replays. Chunks with
    no tokens are dropped (a doc with fewer tokens than frames yields
    a shorter video); docs with no tokens yield no video row.

    Chunking, slicing and bucket hashing are all ARRAY-native
    JVM-side column algebra (the dedup family's tokenizer + portable
    hash inside nested transforms) — no token-grain explode, no
    shuffle at all before the single Arrow pass that counts, encodes
    and wraps (no semantics can drift in the UDF: it only
    histograms integers it was handed).

    Scale shape: one tokenize + per-row slice/hash projection
    (O(tokens) work, zero exchanges), one Arrow ``mapInPandas`` pass
    at doc grain (payloads ~0.5 KB)."""
    src = _video_chunks_src(docs, n_frames)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            medias = [_avi_of_chunks(chunks) for chunks in pdf["chunks_src"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": medias})

    return src.mapInPandas(run, schema)


def _video_chunks_src(docs: DataFrame, n_frames: int) -> DataFrame:
    """The JVM front of :func:`synth_token_video` — tokenize, chunk,
    bucket-hash, all array-native column algebra (one copy, shared
    with the fused synth→walk→hash pass)."""
    tk = docs.select(
        "doc_id", F.filter(tokens("text"), lambda t: t != "").alias("tk")
    ).where(F.size("tk") > 0)
    starts = [
        f"(((size(tk) * {i}) + {n_frames - 1}) div {n_frames})"
        for i in range(n_frames + 1)
    ]
    slices = F.array(
        *[
            F.expr(
                f"array_distinct(slice(tk, {starts[i]} + 1,"
                f" {starts[i + 1]} - {starts[i]}))"
            )
            for i in range(n_frames)
        ]
    )
    cells = F.transform(
        slices,
        lambda ch: F.transform(ch, lambda t: portable_hash60(t) % DHASH_CELLS),
    )
    return tk.select("doc_id", cells.alias("chunks_src"))


def _avi_of_chunks(chunks) -> bytes:
    """The ONE copy of the per-chunk-histogram → PNG frames → real
    AVI/Motion-PNG container rule (shared by :func:`synth_token_video`
    and the fused synth→walk→hash pass). Empty chunks are dropped —
    a doc shorter than n_frames yields a shorter video."""
    frames = [_png_of_cells(cl) for cl in chunks if len(cl) > 0]
    return codecs.encode_avi_mjpeg(
        frames, DHASH_GRID_W, DHASH_GRID_H, fourcc=b"MPNG"
    )


def dhash56(media: DataFrame) -> DataFrame:
    """(doc_id, sh): 56-bit difference hash over the DECODED grayscale
    pixels of a PNG payload column — the perceptual fingerprint
    (dHash: bit (r·7 + c) set iff pixel[r][c] < pixel[r][c+1], the
    gradient-direction encoding that survives brightness shifts).
    The decode is the real stdlib codec (operators/codecs.decode_png:
    chunk parse → inflate → unfilter); a non-grayscale or non-PNG
    payload fails loudly rather than hashing garbage.

    Scale shape: one Arrow ``mapInPandas`` pass, O(doc) rows; the
    gradient compare + bit pack is vectorized numpy over the decoded
    buffer (r11 advice — the hash stays bit-identical to the scalar
    ``px[i] < px[i+1]`` loop it replaces, pinned against golden
    values in tests), so per-row Python work is just the PNG decode."""
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("sh", LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = [_dhash56_of_png(bytes(b)) for b in pdf["media"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "sh": pd.array(outs, dtype="int64"),
                }
            )

    return media.mapInPandas(run, schema)


def _dhash56_weights():
    import numpy as np

    return np.left_shift(
        np.uint64(1),
        np.arange(DHASH_GRID_H * (DHASH_GRID_W - 1), dtype=np.uint64),
    )


_DHASH_W = None


def _dhash56_of_png(png: bytes) -> int:
    """The ONE copy of the true-PNG-decode → dHash rule (shared by
    :func:`dhash56` and the fused synth→decode→hash passes)."""
    import numpy as np

    global _DHASH_W
    if _DHASH_W is None:
        _DHASH_W = _dhash56_weights()
    w, h = DHASH_GRID_W, DHASH_GRID_H
    pw, ph, ch, px = codecs.decode_png(png)
    if (pw, ph, ch) != (w, h, 1):
        raise codecs.UnsupportedMediaError(
            f"dhash56 wants {w}x{h} grayscale, got {pw}x{ph}x{ch}"
        )
    arr = np.frombuffer(px, dtype=np.uint8).reshape(h, w)
    bits = (arr[:, :-1] < arr[:, 1:]).reshape(-1)
    return int((bits.astype(np.uint64) * _DHASH_W).sum())


# ---- audio energy-envelope fingerprint near-dup (d55) --------------------
# Chromaprint's shape reduced to its deterministic integer core: the
# PCM stream is split into segments (the clip grain pairs roll up to),
# each segment into AUDIO_WINDOWS energy sub-windows, and the
# fingerprint encodes the energy-envelope GRADIENT — bit j set iff
# E[j] < E[j+1] — the dHash discipline on the sample stream. 57
# windows → 56 delta bits, the same signed-int64 headroom rationale as
# DHASH_BITS (a 64-bit fingerprint would need 1<<63, overflowing
# signed BIGINT in DuckDB).
AUDIO_WINDOWS = 57
AUDIO_FP_BITS = AUDIO_WINDOWS - 1  # 56
AUDIO_SEGMENTS = 4  # clip grain (positional segments per clip) — ONE
# constant shared by the d55 query, its oracle, and the streaming
# sidecar so the maintained deposit can't drift from the query grain
WAV_RATE = 16000  # container metadata only; windowing is positional
# Samples emitted per token: 32 overlapping 16-bit slices of the
# token's 60-bit hash (shift (i·7) mod 45 walks 32 DISTINCT offsets).
# One sample per token left the energy sub-windows mostly EMPTY at
# the corpus's 10-100-token doc lengths (≤ 1 sample per 57-window
# segment cell), collapsing ~5000 distinct texts to ~250 fingerprints
# and blowing the banding join up quadratically (measured: 115M
# candidate pairs at the 10x stress corpus); 32 samples/token puts
# ~4-8 samples in every window, so envelopes separate distinct
# content while identical prefixes still match (the containment
# signal).
WAV_SAMPLES_PER_TOKEN = 32


def synth_token_wav(docs: DataFrame) -> DataFrame:
    """(doc_id, media): a REAL RIFF/PCM WAV per document whose int16
    mono sample stream is the token SEQUENCE under the portable hash —
    token p emits WAV_SAMPLES_PER_TOKEN samples, sample i being the
    16-bit slice (h_p >> ((i·7) mod 45)) mod 65536 − 32768 of its
    60-bit hash. Documents that share long stretches of text share
    stretches of waveform, so an energy-envelope fingerprint finds
    partially-overlapping clips — the deterministic stand-in for
    perceptual audio dedup that the oracle can recompute from the
    text (the corpus ships no real audio; the WAV container is REAL
    and PCM round-trips losslessly through the stdlib codec, so
    :func:`audio_fingerprint56`'s decode is a true codec path — the
    d50/d53 discipline on the third modality). Docs with no tokens
    yield no row.

    The samples are computed JVM-side with the exact tokenizer +
    portable hash the dedup family twins use (shiftright is
    arithmetic on the non-negative hash in both engines) — the
    Python stage only packs integers it was handed into
    little-endian PCM and wraps the container; no semantics can
    drift in the UDF.

    Scale shape: one tokenize + per-row hash/slice projection
    (O(tokens · 32) work, zero exchanges), one Arrow ``mapInPandas``
    pass at doc grain (payloads 64 B/token + 44 B header)."""
    src = _wav_samples_src(docs)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("media", BinaryType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            medias = [_wav_of_samples(s) for s in pdf["samples_src"]]
            yield pd.DataFrame({"doc_id": pdf["doc_id"], "media": medias})

    return src.mapInPandas(run, schema)


def _wav_samples_src(docs: DataFrame) -> DataFrame:
    """The JVM front of :func:`synth_token_wav` — tokenize + per-token
    16-bit hash slices (one copy, shared with the fused
    synth→decode→fingerprint pass)."""
    tk = docs.select(
        "doc_id", F.filter(tokens("text"), lambda t: t != "").alias("tk")
    ).where(F.size("tk") > 0)
    hs = F.transform(F.col("tk"), lambda t: portable_hash60(t))
    samples = F.expr(
        f"flatten(transform(hs, h -> transform("
        f"sequence(0, {WAV_SAMPLES_PER_TOKEN - 1}), "
        f"i -> CAST(shiftright(h, CAST((i * 7) % 45 AS INT)) % 65536"
        f" - 32768 AS INT))))"
    )
    return tk.select("doc_id", hs.alias("hs")).select(
        "doc_id", samples.alias("samples_src")
    )


def _wav_of_samples(s) -> bytes:
    """int16 sample list → real RIFF/PCM WAV container (one copy)."""
    import numpy as np

    pcm = np.asarray(s, dtype="<i2").tobytes()
    return codecs.encode_wav(pcm, rate=WAV_RATE, channels=1, sampwidth=2)


def audio_fingerprint56(
    media: DataFrame, n_segments: int = AUDIO_SEGMENTS
) -> DataFrame:
    """(doc_id, seg, ah): 56-bit energy-envelope difference hash per
    SEGMENT of a WAV payload column — the audio analog of
    :func:`dhash56`. The decode is the real stdlib codec
    (operators/codecs.decode_wav); a non-mono or non-16-bit payload
    fails loudly rather than hashing garbage. Sample p of an L-sample
    stream lands in global window (p · n_segments · AUDIO_WINDOWS)
    div L — segment = div AUDIO_WINDOWS, sub-window = mod
    AUDIO_WINDOWS (the d53 positional-chunk rule one level deeper) —
    each (segment, window) accumulates Σ|sample| exactly in int64,
    and bit j of the segment's hash is set iff E[j] < E[j+1].
    Segments with no samples are dropped (a short clip yields fewer
    segments); windows with no samples read E = 0 — all integer
    compares, bit-identical in any engine.

    Scale shape: one Arrow ``mapInPandas`` pass, ≤ n_segments rows
    out per clip; the windowing/energy/pack is vectorized numpy over
    the decoded buffer, so per-row Python work is just the WAV
    header parse."""
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("seg", IntegerType()),
            StructField("ah", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc: list[int] = []
            out_seg: list[int] = []
            out_ah: list[int] = []
            for doc_id, b in zip(pdf["doc_id"], pdf["media"]):
                for g, ah in _audio_fp56_of_wav(bytes(b), n_segments):
                    out_doc.append(int(doc_id))
                    out_seg.append(g)
                    out_ah.append(ah)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(out_doc, dtype="int64"),
                    "seg": pd.array(out_seg, dtype="int32"),
                    "ah": pd.array(out_ah, dtype="int64"),
                }
            )

    return media.mapInPandas(run, schema)


_AUDIO_W = None


def _audio_fp56_of_wav(wav: bytes, n_segments: int) -> list[tuple[int, int]]:
    """The ONE copy of the true-WAV-decode → energy-envelope
    fingerprint rule: [(seg, ah), ...] per clip (shared by
    :func:`audio_fingerprint56` and the fused synth→decode→fingerprint
    pass). Segments with no samples are dropped."""
    import numpy as np

    global _AUDIO_W
    if _AUDIO_W is None:
        _AUDIO_W = np.left_shift(
            np.int64(1), np.arange(AUDIO_FP_BITS, dtype=np.int64)
        )
    nw = AUDIO_WINDOWS
    rate, ch, sw, pcm = codecs.decode_wav(wav)
    if (ch, sw) != (1, 2):
        raise codecs.UnsupportedMediaError(
            f"audio_fingerprint56 wants mono 16-bit, got "
            f"{ch}ch {sw * 8}-bit"
        )
    s = np.abs(np.frombuffer(pcm, dtype="<i2").astype(np.int64))
    L = len(s)
    if L == 0:
        return []
    pos = np.arange(L, dtype=np.int64)
    wg = (pos * (n_segments * nw)) // L
    energy = np.zeros((n_segments, nw), dtype=np.int64)
    np.add.at(energy, (wg // nw, wg % nw), s)
    fps = ((energy[:, :-1] < energy[:, 1:]) * _AUDIO_W).sum(axis=1)
    return [(int(g), int(fps[g])) for g in np.unique(wg // nw)]


# ---- fused synth→codec→hash passes (optimization round r14) --------------
# Each composed pipeline above is row-wise independent, so chaining its
# stages inside ONE mapInPandas removes whole JVM↔Python round trips of
# the media payloads (guide §4: the boundary crossing is the cost you
# control). The per-row rules are the SAME module-level helpers the
# composed operators call — the fused paths cannot drift from the
# composed ones, and tests pin fused ≡ composed row-for-row.


def dhash56_from_sets(ts: DataFrame) -> DataFrame:
    """Fused :func:`synth_token_png_from_sets` → :func:`dhash56`:
    (doc_id, toks) → (doc_id, sh) in one Arrow pass. The PNG is still
    REALLY encoded and decoded per row (same codec calls); its bytes
    just never cross to the JVM and back between the two steps."""
    buckets = F.transform(
        F.col("toks"), lambda t: portable_hash60(t) % DHASH_CELLS
    )
    src = ts.select("doc_id", buckets.alias("cells_src"))
    schema = StructType(
        [StructField("doc_id", LongType()), StructField("sh", LongType())]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            outs = [
                _dhash56_of_png(_png_of_cells(cl)) for cl in pdf["cells_src"]
            ]
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "sh": pd.array(outs, dtype="int64")}
            )

    return src.mapInPandas(run, schema)


def dhash56_from_docs(docs: DataFrame) -> DataFrame:
    """Fused :func:`synth_token_png` → :func:`dhash56` over a raw
    document frame (the :func:`dhash56_from_sets` pass behind the
    same token-set projection synth_token_png applies)."""
    return dhash56_from_sets(
        docs.select(
            "doc_id",
            F.array_remove(F.array_distinct(tokens("text")), "").alias(
                "toks"
            ),
        )
    )


def video_frame_dhash56(docs: DataFrame, n_frames: int = 4) -> DataFrame:
    """Fused :func:`synth_token_video` → :func:`frame_sample` →
    :func:`dhash56`: (doc_id, text) → (doc_id, frame_idx, sh) in one
    Arrow pass. The AVI container is still really assembled and
    really walked (codecs.encode_avi_mjpeg → is_video →
    decode_video_keyframes), every frame still PNG-decoded — the container
    and frame bytes just stay inside the Python worker instead of
    crossing the boundary twice more."""
    src = _video_chunks_src(docs, n_frames)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("frame_idx", LongType()),
            StructField("sh", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list[int] = []
            idxs: list[int] = []
            outs: list[int] = []
            for doc_id, chunks in zip(pdf["doc_id"], pdf["chunks_src"]):
                payload = _avi_of_chunks(chunks)
                if not codecs.is_video(payload):  # the synth always
                    raise codecs.UnsupportedMediaError(  # wraps a RIFF
                        "fused video walk expects an AVI container"
                    )
                for i, (_w, _h, png) in enumerate(
                    codecs.decode_video_keyframes(payload, n_frames)
                ):
                    ids.append(int(doc_id))
                    idxs.append(i)
                    outs.append(_dhash56_of_png(png))
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(ids, dtype="int64"),
                    "frame_idx": pd.array(idxs, dtype="int64"),
                    "sh": pd.array(outs, dtype="int64"),
                }
            )

    return src.mapInPandas(run, schema)


def audio_fingerprint56_from_docs(
    docs: DataFrame, n_segments: int = AUDIO_SEGMENTS
) -> DataFrame:
    """Fused :func:`synth_token_wav` → :func:`audio_fingerprint56`:
    (doc_id, text) → (doc_id, seg, ah) in one Arrow pass; the WAV is
    still really packed and really decoded per row."""
    src = _wav_samples_src(docs)
    schema = StructType(
        [
            StructField("doc_id", LongType()),
            StructField("seg", IntegerType()),
            StructField("ah", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_doc: list[int] = []
            out_seg: list[int] = []
            out_ah: list[int] = []
            for doc_id, s in zip(pdf["doc_id"], pdf["samples_src"]):
                for g, ah in _audio_fp56_of_wav(
                    _wav_of_samples(s), n_segments
                ):
                    out_doc.append(int(doc_id))
                    out_seg.append(g)
                    out_ah.append(ah)
            yield pd.DataFrame(
                {
                    "doc_id": pd.array(out_doc, dtype="int64"),
                    "seg": pd.array(out_seg, dtype="int32"),
                    "ah": pd.array(out_ah, dtype="int64"),
                }
            )

    return src.mapInPandas(run, schema)
