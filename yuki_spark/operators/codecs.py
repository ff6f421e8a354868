"""Real media codecs for the multimodal operators — stdlib only.

The container ships no image/audio libraries, but PNG and WAV are
fully decodable with the standard library (zlib inflate + PNG
unfiltering; the ``wave`` module for RIFF/PCM), so the multimodal
operators' decode step can be REAL for those containers instead of a
synthetic stand-in: parse the actual header, inflate the actual pixel
data, resample actual pixels.

Optional dependencies (behind import-try, never required):

- PIL, if importable, extends :func:`decode_image` to non-PNG formats
  (JPEG etc.). PNG stays on the stdlib path even with PIL present so
  the decode is bit-deterministic regardless of environment.
- soundfile, if importable, extends :func:`decode_audio` beyond
  RIFF/PCM (FLAC etc.); WAV stays on the stdlib ``wave`` path.

Formats outside both (video containers, exotic codecs) raise
``UnsupportedMediaError`` — loud, not silently faked; the operators
in ``multimodal.py`` fall back to their documented synthetic path
only for payloads that are not media containers at all (the synth
corpus).
"""
from __future__ import annotations

import io
import struct
import wave
import zlib

try:  # optional — widens decode_image to JPEG & friends
    from PIL import Image as _PILImage

    _HAS_PIL = True
except Exception:  # pragma: no cover - absent in this container
    _HAS_PIL = False

try:  # optional — widens decode_audio beyond RIFF/PCM
    import soundfile as _soundfile

    _HAS_SOUNDFILE = True
except Exception:  # pragma: no cover - absent in this container
    _HAS_SOUNDFILE = False

try:  # optional — real video keyframe decode (MP4/MKV/AVI containers)
    import av as _av

    _HAS_AV = True
except Exception:  # pragma: no cover - absent in this container
    _HAS_AV = False

PNG_MAGIC = b"\x89PNG\r\n\x1a\n"

# PNG color type → samples per pixel (8-bit depth, non-interlaced)
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


class UnsupportedMediaError(ValueError):
    """Payload is a media container this build cannot decode."""


def is_png(data: bytes) -> bool:
    return data[:8] == PNG_MAGIC


def is_wav(data: bytes) -> bool:
    return data[:4] == b"RIFF" and data[8:12] == b"WAVE"


def sniff(data: bytes) -> str | None:
    """'png' | 'wav' | None (not a known media container)."""
    if is_png(data):
        return "png"
    if is_wav(data):
        return "wav"
    return None


# ---------------------------------------------------------------------------
# PNG
# ---------------------------------------------------------------------------


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(width: int, height: int, pixels: bytes, channels: int = 3) -> bytes:
    """Minimal valid PNG writer (8-bit, filter 0 on every scanline).

    ``channels``: 1=gray, 2=gray+alpha, 3=RGB, 4=RGBA. The output
    passes any conformant decoder (CRCs included)."""
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[channels]
    stride = width * channels
    if len(pixels) != stride * height:
        raise ValueError(
            f"pixels: got {len(pixels)} bytes, want {stride * height} "
            f"({width}x{height}x{channels})"
        )
    raw = b"".join(
        b"\x00" + pixels[y * stride : (y + 1) * stride] for y in range(height)
    )
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        PNG_MAGIC
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(data: bytes) -> tuple[int, int, int, bytes]:
    """REAL PNG decode with the stdlib: chunk parse → zlib inflate →
    scanline unfilter (all five PNG filter types). Supports the
    profile real pipelines overwhelmingly use — 8-bit depth, color
    types gray/gray+alpha/RGB/RGBA, non-interlaced. Returns
    ``(width, height, channels, pixels)`` with pixels row-major,
    ``channels`` bytes per pixel.

    Every parse failure surfaces as :class:`UnsupportedMediaError` —
    a corrupt payload behind a valid PNG magic (truncated IHDR,
    garbled IDAT) must raise the ONE documented media exception, not
    a raw struct/zlib error that crashes a whole mapInPandas batch
    with an undecodable-media case the caller meant to handle."""
    if not is_png(data):
        raise UnsupportedMediaError("not a PNG payload")
    try:
        return _decode_png_body(data)
    except UnsupportedMediaError:
        raise
    except Exception as e:  # noqa: BLE001 — normalize parse failures
        raise UnsupportedMediaError(f"corrupt PNG payload: {e}") from e


def _decode_png_body(data: bytes) -> tuple[int, int, int, bytes]:
    pos, width = 8, None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        body = data[pos + 8 : pos + 8 + length]
        if tag == b"IHDR":
            width, height, depth, color_type, comp, filt, interlace = (
                struct.unpack(">IIBBBBB", body)
            )
            if depth != 8:
                raise UnsupportedMediaError(f"PNG bit depth {depth} (want 8)")
            if color_type not in _PNG_CHANNELS:
                raise UnsupportedMediaError(
                    f"PNG color type {color_type} (palette unsupported)"
                )
            if interlace != 0:
                raise UnsupportedMediaError("interlaced PNG unsupported")
            channels = _PNG_CHANNELS[color_type]
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise UnsupportedMediaError("PNG without IHDR")
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != (stride + 1) * height:
        raise UnsupportedMediaError("PNG pixel data length mismatch")
    out = bytearray(stride * height)
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + ((left + prev[i]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                ul = prev[i - channels] if i >= channels else 0
                line[i] = (line[i] + _paeth(left, prev[i], ul)) & 0xFF
        elif ftype != 0:
            raise UnsupportedMediaError(f"PNG filter type {ftype}")
        out[y * stride : (y + 1) * stride] = line
        prev = line
    return width, height, channels, bytes(out)


def decode_image(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode any supported image payload: PNG on the deterministic
    stdlib path; other formats through PIL when it is importable,
    else ``UnsupportedMediaError`` (loud, never a silent fake)."""
    if is_png(data):
        return decode_png(data)
    if _HAS_PIL:
        img = _PILImage.open(io.BytesIO(data))
        img = img.convert({1: "L", 3: "RGB", 4: "RGBA"}.get(len(img.getbands()), "RGB"))
        return img.width, img.height, len(img.getbands()), img.tobytes()
    raise UnsupportedMediaError(
        "payload is not PNG and PIL is not installed — install pillow to "
        "decode other image formats"
    )


def resize_nearest(
    pixels: bytes, width: int, height: int, channels: int, tw: int, th: int
) -> bytes:
    """Nearest-neighbor resample of real decoded pixels (vectorized
    numpy gather — no Python per-pixel loop)."""
    import numpy as np

    a = np.frombuffer(pixels, dtype=np.uint8).reshape(height, width, channels)
    ys = (np.arange(th) * height) // th
    xs = (np.arange(tw) * width) // tw
    return a[ys][:, xs].tobytes()


# ---------------------------------------------------------------------------
# WAV
# ---------------------------------------------------------------------------


def encode_wav(
    samples: bytes, rate: int = 16000, channels: int = 1, sampwidth: int = 2
) -> bytes:
    """RIFF/PCM WAV writer via the stdlib ``wave`` module. ``samples``
    is raw little-endian PCM (``sampwidth`` bytes per sample)."""
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(sampwidth)
        w.setframerate(rate)
        w.writeframes(samples)
    return buf.getvalue()


def decode_wav(data: bytes) -> tuple[int, int, int, bytes]:
    """REAL WAV decode via the stdlib ``wave`` module: returns
    ``(rate, channels, sampwidth, pcm_bytes)``."""
    if not is_wav(data):
        raise UnsupportedMediaError("not a RIFF/WAVE payload")
    with wave.open(io.BytesIO(data), "rb") as w:
        return (
            w.getframerate(),
            w.getnchannels(),
            w.getsampwidth(),
            w.readframes(w.getnframes()),
        )


def decode_audio(data: bytes) -> tuple[int, int, int, bytes]:
    """Decode any supported audio payload: WAV on the stdlib path;
    other formats through soundfile when importable, else
    ``UnsupportedMediaError``."""
    if is_wav(data):
        return decode_wav(data)
    if _HAS_SOUNDFILE:
        import numpy as np

        arr, rate = _soundfile.read(io.BytesIO(data), dtype="int16")
        channels = 1 if arr.ndim == 1 else arr.shape[1]
        return rate, channels, 2, np.ascontiguousarray(arr).tobytes()
    raise UnsupportedMediaError(
        "payload is not WAV and soundfile is not installed — install "
        "soundfile to decode other audio formats"
    )


def is_video(data: bytes) -> bool:
    """Container sniff for the formats :func:`decode_video_keyframes`
    handles: ISO-BMFF/MP4 (ftyp box), Matroska/WebM (EBML magic),
    RIFF/AVI."""
    return (
        data[4:8] == b"ftyp"
        or data[:4] == b"\x1a\x45\xdf\xa3"
        or (data[:4] == b"RIFF" and data[8:12] == b"AVI ")
    )


# ---- RIFF/AVI Motion-JPEG (pure Python — no codec library) ---------------
#
# MJPEG stores every frame as a self-contained JPEG inside RIFF '00dc'
# chunks, so keyframe SAMPLING needs no codec at all: every frame is an
# I-frame, the container walk is a pure chunk parse, and the sampled
# frame payloads ship downstream as-is (exactly what a production
# sampler hands to the GPU/decoder stage). This gives the video branch
# a REAL container path that executes without PyAV.

JPEG_SOI = b"\xff\xd8"

# SOF0..SOF15 carry dimensions, except DHT(C4)/JPG(C8)/DAC(CC)
_SOF_MARKERS = frozenset(range(0xC0, 0xD0)) - {0xC4, 0xC8, 0xCC}


def jpeg_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from a JPEG's SOF segment — a pure marker walk
    (no pixel decode; the sampler's contract is container-level)."""
    if data[:2] != JPEG_SOI:
        raise UnsupportedMediaError("not a JPEG payload")
    i = 2
    while i + 4 <= len(data):
        if data[i] != 0xFF:
            raise UnsupportedMediaError("corrupt JPEG marker stream")
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte — legal padding before any marker
            i += 1
            continue
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            i += 2
            continue
        if marker in _SOF_MARKERS:
            if i + 9 > len(data):
                break
            h, w = struct.unpack(">HH", data[i + 5 : i + 9])
            return int(w), int(h)
        if marker == 0xDA:  # SOS: entropy data follows, SOF must precede
            break
        i += 2 + struct.unpack(">H", data[i + 2 : i + 4])[0]
    raise UnsupportedMediaError("JPEG without SOF dimensions")


def avi_mjpeg_frames(data: bytes) -> list[bytes]:
    """Every self-contained image frame payload in a RIFF/AVI
    container, in stream order: an iterative chunk walk (LIST
    recursion via an explicit stack, even-size padding per the RIFF
    spec) collecting video chunks ('##dc'/'##db') that carry a JPEG
    SOI (Motion-JPEG) or — since r12 — a PNG magic (Motion-PNG, the
    'MPNG' AVI codec: every frame a self-contained PNG, the
    video-grain perceptual-dedup key's container). Returns [] for an
    AVI with neither (a compressed-codec AVI — the PyAV path owns
    those)."""
    if not (data[:4] == b"RIFF" and data[8:12] == b"AVI "):
        raise UnsupportedMediaError("not a RIFF/AVI container")
    end = min(len(data), 8 + struct.unpack("<I", data[4:8])[0])
    frames: list[bytes] = []

    def walk(i: int, stop: int) -> None:
        # recurse INTO a LIST before continuing the level: a LIFO
        # stack here returned 'rec '-grouped interleaved frames (the
        # standard AVI layout) out of stream order. RIFF nesting is
        # shallow (movi → rec), so recursion depth is bounded.
        while i + 8 <= stop:
            fourcc = data[i : i + 4]
            size = struct.unpack("<I", data[i + 4 : i + 8])[0]
            body_end = min(i + 8 + size, stop)
            if fourcc == b"LIST":
                walk(i + 12, body_end)  # skip the list type
            elif fourcc[2:4] in (b"dc", b"db"):
                body = data[i + 8 : body_end]
                if body[:2] == JPEG_SOI or body[:8] == PNG_MAGIC:
                    frames.append(body)
            i += 8 + size + (size & 1)

    walk(12, end)  # skip 'RIFF' size 'AVI '
    return frames


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10,
    fourcc: bytes = b"MJPG",
) -> bytes:
    """Minimal valid RIFF/AVI container around self-contained image
    frame payloads (avih + vids strl headers + movi; no idx1 —
    players that need seeking rebuild it): Motion-JPEG by default,
    Motion-PNG with ``fourcc=b"MPNG"`` (r12 — the synthetic video
    corpus carries PNG frames so the downstream perceptual hash runs
    a real pixel decode). The deterministic container builder for the
    pure-Python sampling path."""
    n = len(frames)
    if len(fourcc) != 4:
        raise UnsupportedMediaError("fourcc must be 4 bytes")

    def chunk(fourcc: bytes, body: bytes) -> bytes:
        return fourcc + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) & 1))

    def lst(listtype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", listtype + body)

    avih = struct.pack(
        "<14I",
        1_000_000 // max(fps, 1),  # dwMicroSecPerFrame
        0, 0,
        0x10,  # AVIF_HASINDEX off, 0x10 = AVIF_WASCAPTUREFILE-ish flags
        n, 0, 1, 0, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + fourcc
        + struct.pack("<10I", 0, 0, 0, 1, max(fps, 1), 0, n, 0, 0xFFFFFFFF, 0)
        + struct.pack("<4h", 0, 0, width, height)
    )
    strf = struct.pack(
        "<I2i2H2I2i2I", 40, width, height, 1, 24,
        struct.unpack("<I", fourcc)[0],  # biCompression = fourcc LE
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", f) for f in frames))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def encode_stub_jpeg(width: int, height: int, seed: int = 0) -> bytes:
    """A structurally valid baseline-JPEG byte stream (SOI, JFIF APP0,
    DQT, SOF0, DHT, SOS, entropy bytes, EOI) whose SOF carries the
    given dimensions — the deterministic frame payload for MJPEG
    container tests. Structure-valid means every segment parses and
    :func:`jpeg_dims` reads the true dimensions; the entropy data is
    filler (the sampler never decodes pixels — a real pipeline ships
    frame payloads to the decoder stage as-is)."""
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([1] * 64)
    sof0 = (
        b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
        + struct.pack(">HH", height, width) + b"\x01" + b"\x01\x11\x00"
    )
    dht = (
        b"\xff\xc4" + struct.pack(">H", 20) + b"\x00"
        + bytes([1] + [0] * 15) + b"\x00"
    )
    sos = b"\xff\xda" + struct.pack(">H", 8) + b"\x01\x01\x00\x00\x3f\x00"
    entropy = bytes([(seed * 37 + i * 11) % 255 for i in range(16)]).replace(b"\xff", b"\xfe")
    return JPEG_SOI + app0 + dqt + sof0 + dht + sos + entropy + b"\xff\xd9"


def png_dims(data: bytes) -> tuple[int, int]:
    """(width, height) from a PNG's IHDR — a pure header parse (no
    pixel decode; the sampler's contract is container-level, exactly
    like :func:`jpeg_dims`)."""
    if data[:8] != PNG_MAGIC or data[12:16] != b"IHDR" or len(data) < 24:
        raise UnsupportedMediaError("not a PNG payload")
    w, h = struct.unpack(">II", data[16:24])
    return int(w), int(h)


def decode_video_keyframes(data: bytes, n_frames: int = 4) -> list[tuple[int, int, bytes]]:
    """REAL keyframe extraction from a video container via PyAV when
    it is importable: up to ``n_frames`` keyframes (decoder skips
    non-key frames — the I-frame walk a real sampler does), each
    returned as ``(width, height, png_bytes)`` with the pixels
    re-encoded through the deterministic stdlib PNG writer so the
    downstream binary column is engine-stable. A container with no
    keyframes beyond the first GOP falls back to decoding sequential
    frames. Raises :class:`UnsupportedMediaError` when PyAV is absent
    or the payload cannot be decoded — loud, never a silent fake (the
    byte-slice stand-in is only for NON-video payloads, chosen by the
    caller via :func:`is_video`)."""
    if not is_video(data):
        raise UnsupportedMediaError("not a recognized video container")
    if data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        mj = avi_mjpeg_frames(data)
        if mj:
            # Motion-JPEG / Motion-PNG: every frame is an I-frame and
            # already a self-contained image payload — pure-Python
            # container path, no codec library needed (dimensions from
            # the SOF marker walk or the PNG IHDR; payloads ship
            # downstream as-is, PNG frames pixel-decodable by the
            # stdlib codec)
            return [
                (*(png_dims(f) if f[:8] == PNG_MAGIC else jpeg_dims(f)), f)
                for f in mj[:n_frames]
            ]
    if not _HAS_AV:
        raise UnsupportedMediaError(
            "video payload but PyAV is not installed — install av to "
            "decode video containers"
        )
    try:
        out: list[tuple[int, int, bytes]] = []
        with _av.open(io.BytesIO(data)) as container:
            stream = container.streams.video[0]
            stream.codec_context.skip_frame = "NONKEY"
            for frame in container.decode(stream):
                arr = frame.to_ndarray(format="rgb24")
                h, w = arr.shape[0], arr.shape[1]
                out.append((w, h, encode_png(w, h, arr.tobytes(), channels=3)))
                if len(out) >= n_frames:
                    break
        if not out:  # single-GOP edge: take leading frames instead
            with _av.open(io.BytesIO(data)) as container:
                for frame in container.decode(container.streams.video[0]):
                    arr = frame.to_ndarray(format="rgb24")
                    h, w = arr.shape[0], arr.shape[1]
                    out.append((w, h, encode_png(w, h, arr.tobytes(), channels=3)))
                    if len(out) >= n_frames:
                        break
        if not out:
            raise UnsupportedMediaError("video container decoded zero frames")
        return out
    except UnsupportedMediaError:
        raise
    except Exception as e:  # noqa: BLE001 — normalize decoder failures
        raise UnsupportedMediaError(f"undecodable video payload: {e}") from e
