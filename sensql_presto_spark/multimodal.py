"""Multimodal decoders — real stdlib codecs for WAV/PCM audio and PNG images.

The pipeline queries (``queries/pipeline.py``) treat image/audio/video as
opaque ``binary`` columns with typed metadata and decode them only inside
``mapInPandas`` Arrow batches.

Audio is REAL (round 3): ``encode_wav_pcm16``/``decode_wav`` implement the
RIFF/WAVE PCM container with the stdlib ``wave`` + ``struct`` modules —
no third-party codec needed — and ``queries/pipeline.py::mm_audio_windows``
computes its windowed energies from actually-decoded samples.

Images are REAL too (round 3): ``encode_png``/``decode_png`` implement the
PNG container with stdlib ``zlib`` + ``struct`` — chunk walk with CRC
validation, IDAT inflate, and the full scanline-filter set (None/Sub/Up/
Average/Paeth) on decode.  ``decode_image`` dispatches PNG natively and
falls back to Pillow only for other formats (jpeg/webp/...), raising
``NotImplementedError`` when it's absent — the same loud-contract seam
style used elsewhere.
"""

from __future__ import annotations

from collections.abc import Iterator

try:  # pragma: no cover - not installed in this container
    from PIL import Image  # type: ignore

    _HAVE_PIL = True
except ImportError:
    _HAVE_PIL = False

try:  # pragma: no cover - not installed in this container
    import soundfile  # type: ignore

    _HAVE_SOUNDFILE = True
except ImportError:
    _HAVE_SOUNDFILE = False


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# PNG color type -> (mode name, samples per pixel); 8-bit depth only.
_PNG_MODES = {0: ("L", 1), 2: ("RGB", 3), 4: ("LA", 2), 6: ("RGBA", 4)}


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(
    width: int,
    height: int,
    pixels: bytes,
    mode: str = "L",
    filter_for_row=None,
) -> bytes:
    """Serialize raw 8-bit pixels as a complete PNG file (stdlib zlib/struct).

    ``pixels`` is row-major, ``width * height * samples_per_pixel`` bytes.
    ``filter_for_row(y) -> int`` picks the scanline filter type (0..4) per
    row — defaults to 0 (None); passing a mix exercises every decode-side
    unfilter path (Sub/Up/Average/Paeth), which is how the tests prove the
    decoder is a real codec rather than a passthrough.
    """
    import struct
    import zlib

    try:
        color_type, spp = next((ct, s) for ct, (m, s) in _PNG_MODES.items() if m == mode)
    except StopIteration:
        raise NotImplementedError(f"PNG encode mode {mode!r} not supported") from None
    stride = width * spp
    if len(pixels) != stride * height:
        raise ValueError(f"pixel buffer {len(pixels)} != {stride}*{height}")
    pick = filter_for_row or (lambda y: 0)
    raw = bytearray()
    prev = bytes(stride)
    for y in range(height):
        row = pixels[y * stride : (y + 1) * stride]
        ftype = pick(y)
        raw.append(ftype)
        raw += _png_filter(ftype, row, prev, spp)
        prev = row
    ihdr = struct.pack(">IIBBBBB", width, height, 8, color_type, 0, 0, 0)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_filter(ftype: int, row: bytes, prev: bytes, spp: int) -> bytes:
    """Apply PNG scanline filter ``ftype`` (encode direction)."""
    if ftype == 0:
        return row
    out = bytearray(len(row))
    for i, x in enumerate(row):
        a = row[i - spp] if i >= spp else 0
        b = prev[i]
        c = prev[i - spp] if i >= spp else 0
        if ftype == 1:  # Sub
            out[i] = (x - a) & 0xFF
        elif ftype == 2:  # Up
            out[i] = (x - b) & 0xFF
        elif ftype == 3:  # Average
            out[i] = (x - (a + b) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            out[i] = (x - _paeth(a, b, c)) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
    return bytes(out)


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def decode_png(payload: bytes) -> tuple[int, int, str, bytes]:
    """REAL image decode: parse a PNG payload to (width, height, mode, pixels).

    Stdlib-only — walks the chunk list with CRC32 validation, inflates the
    concatenated IDAT stream with zlib, and reverses the scanline filters
    (None/Sub/Up/Average/Paeth per the PNG spec §9).  Supports 8-bit
    greyscale/RGB/LA/RGBA, non-interlaced; anything else raises
    ``NotImplementedError`` loudly (same contract style as decode_wav).
    """
    import struct
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload (bad signature)")
    pos, idat, ihdr = 8, bytearray(), None
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        tag = payload[pos + 4 : pos + 8]
        body = payload[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack(">I", payload[pos + 8 + length : pos + 12 + length])
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {tag!r} CRC mismatch")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("PNG missing IHDR")
    width, height, depth, color_type, comp, filt, interlace = ihdr
    if depth != 8 or comp != 0 or filt != 0 or interlace != 0:
        raise NotImplementedError(
            f"PNG depth={depth} compression={comp} interlace={interlace} not supported"
        )
    if color_type not in _PNG_MODES:
        raise NotImplementedError(f"PNG color type {color_type} not supported")
    mode, spp = _PNG_MODES[color_type]
    stride = width * spp
    raw = zlib.decompress(bytes(idat))
    if len(raw) != (stride + 1) * height:
        raise ValueError("PNG pixel data size mismatch")
    out = bytearray()
    prev = bytearray(stride)
    for y in range(height):
        ftype = raw[y * (stride + 1)]
        line = bytearray(raw[y * (stride + 1) + 1 : (y + 1) * (stride + 1)])
        if ftype == 1:  # Sub
            for i in range(spp, stride):
                line[i] = (line[i] + line[i - spp]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                a = line[i - spp] if i >= spp else 0
                line[i] = (line[i] + (a + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - spp] if i >= spp else 0
                c = prev[i - spp] if i >= spp else 0
                line[i] = (line[i] + _paeth(a, prev[i], c)) & 0xFF
        elif ftype != 0:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out += line
        prev = line
    return width, height, mode, bytes(out)


def decode_image(payload: bytes) -> tuple[int, int, str]:
    """Return (width, height, mode) for an encoded image payload.

    PNG decodes natively via :func:`decode_png`; other containers
    (jpeg/webp/...) still require Pillow and raise until installed.
    """
    if payload[:8] == _PNG_SIG:
        width, height, mode, _ = decode_png(payload)
        return width, height, mode
    if not _HAVE_PIL:
        raise NotImplementedError(
            "non-PNG image decode requires Pillow; PNG decodes natively "
            "(decode_png, stdlib zlib/struct)."
        )
    import io

    with Image.open(io.BytesIO(payload)) as im:  # pragma: no cover
        return im.width, im.height, im.mode


def encode_wav_pcm16(samples: list[int], sample_rate: int = 8000) -> bytes:
    """Serialize mono 16-bit PCM samples as a complete RIFF/WAVE file.

    Pure stdlib (``wave`` writes the RIFF header + fmt/data chunks,
    ``struct`` packs little-endian int16 frames) — the ingest-side twin of
    :func:`decode_wav`.
    """
    import io
    import struct
    import wave

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sample_rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    return buf.getvalue()


def decode_wav(payload: bytes) -> tuple[int, int, list[int]]:
    """REAL audio decode: parse a RIFF/WAVE payload to (rate, channels, samples).

    Stdlib-only — ``wave`` validates the RIFF/WAVE header and walks the
    chunk list; frames are unpacked with ``struct`` (16-bit signed LE) or
    offset-shifted (8-bit WAV stores unsigned bytes). Raises ``wave.Error``
    on a malformed container and ``NotImplementedError`` for PCM widths
    this engine doesn't handle — the same loud-contract style as the other
    unsupported seams.
    """
    import io
    import struct
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        nch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        samples = list(struct.unpack(f"<{len(raw) // 2}h", raw))
    elif width == 1:
        samples = [b - 128 for b in raw]  # 8-bit WAV stores unsigned bytes
    else:
        raise NotImplementedError(f"PCM sample width {width * 8} bits not supported")
    return rate, nch, samples


def decode_audio(payload: bytes) -> tuple[int, int]:
    """Return (n_samples_per_channel, sample_rate) for an audio payload.

    WAV/PCM decodes natively via :func:`decode_wav`; other containers
    (flac/ogg/mp3) still require soundfile and raise until installed.
    """
    if len(payload) >= 12 and payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        rate, nch, samples = decode_wav(payload)
        return len(samples) // max(nch, 1), rate
    if not _HAVE_SOUNDFILE:
        raise NotImplementedError(
            "non-WAV audio decode requires soundfile; WAV/PCM decodes natively."
        )
    import io

    data, rate = soundfile.read(io.BytesIO(payload))  # pragma: no cover
    return len(data), rate


def image_feature_batches(batches: Iterator, out_columns: tuple[str, ...]):
    """mapInPandas-shaped driver for real image decode (plumbing only).

    Mirrors the fake extractor's batch contract in queries/pipeline.py —
    usable as ``df.mapInPandas(lambda it: image_feature_batches(it, cols),
    schema)`` once a codec is installed.
    """
    import pandas as pd

    for pdf in batches:
        rows = [decode_image(p) for p in pdf["payload"]]
        yield pd.DataFrame(dict(zip(out_columns, zip(*rows))), index=pdf.index)


# --- AVI (RIFF) video container — real stdlib codec, round-3 final ---------
#
# Completes the multimodal trio (WAV audio, PNG image, AVI video). The
# encoder writes a spec-complete RIFF('AVI ') file: LIST(hdrl) with avih +
# LIST(strl){strh 'vids'/'DIB ', strf BITMAPINFOHEADER}, LIST(movi) with
# one '00db' chunk per frame storing the uncompressed DIB (BGR, bottom-up
# rows, 4-byte row padding), and an idx1 index. The decoder walks the
# chunk tree back to top-down RGB24 frames — so a row-order/channel-order/
# padding bug anywhere breaks the encode->decode roundtrip identity that
# mm_video_frames' oracle checks. Compressed streams (fccHandler other
# than DIB/raw, biCompression != 0) raise NotImplementedError loudly.


def encode_avi_rgb24(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """Serialize top-down RGB24 frames as an uncompressed RIFF/AVI file."""
    import struct

    row = width * 3
    pad = (4 - row % 4) % 4
    dib_frames = []
    for fr in frames:
        if len(fr) != row * height:
            raise ValueError(f"frame must be {row * height} bytes, got {len(fr)}")
        out = bytearray()
        for y in range(height - 1, -1, -1):  # bottom-up rows
            line = fr[y * row : (y + 1) * row]
            # RGB -> BGR per pixel
            for x in range(width):
                out += line[x * 3 : x * 3 + 3][::-1]
            out += b"\x00" * pad
        dib_frames.append(bytes(out))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return tag + struct.pack("<I", len(body)) + body + (b"\x00" * (len(body) % 2))

    def lst(tag: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", tag + body)

    frame_bytes = (row + pad) * height
    avih = struct.pack(
        "<10I",
        1_000_000 // fps,  # microseconds per frame
        frame_bytes * fps,  # max bytes per second
        0,  # padding granularity
        0x10,  # AVIF_HASINDEX
        len(frames),
        0,  # initial frames
        1,  # streams
        frame_bytes,  # suggested buffer
        width,
        height,
    ) + struct.pack("<4I", 0, 0, 0, 0)
    strh = (
        b"vids"
        + b"DIB "
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames), frame_bytes, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(
        "<IiiHHIIiiII", 40, width, height, 1, 24, 0, frame_bytes, 0, 0, 0, 0
    )
    hdrl = lst(b"hdrl", chunk(b"avih", avih) + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    movi_body = b"".join(chunk(b"00db", f) for f in dib_frames)
    movi = lst(b"movi", movi_body)
    # idx1: one entry per frame (chunk id, flags=KEYFRAME, offset, size)
    idx = b""
    off = 4  # offsets are relative to the start of the 'movi' fourcc + 4
    for f in dib_frames:
        idx += b"00db" + struct.pack("<3I", 0x10, off, len(f))
        off += 8 + len(f) + (len(f) % 2)
    riff_body = b"AVI " + hdrl + movi + chunk(b"idx1", idx)
    return b"RIFF" + struct.pack("<I", len(riff_body)) + riff_body


def decode_avi(payload: bytes) -> tuple[int, int, int, list[bytes]]:
    """REAL video decode: parse an uncompressed AVI to
    (width, height, n_frames, frames) with frames as top-down RGB24 bytes.

    Stdlib-only RIFF chunk walk; validates the container fourccs, reads
    dimensions from avih, rejects compressed streams (the loud-contract
    seam), collects movi '00db'/'00dc' chunks and undoes the DIB layout
    (BGR -> RGB, bottom-up -> top-down, strip row padding).
    """
    import struct

    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    width = height = None
    declared_frames = 0
    frames: list[bytes] = []

    def walk(buf: bytes, pos: int, end: int) -> None:
        nonlocal width, height, declared_frames
        import struct as _s

        while pos + 8 <= end:
            tag = buf[pos : pos + 4]
            (size,) = _s.unpack_from("<I", buf, pos + 4)
            body_start = pos + 8
            if tag == b"LIST":
                walk(buf, body_start + 4, body_start + size)
            elif tag == b"avih":
                fields = _s.unpack_from("<10I", buf, body_start)
                declared_frames = fields[4]
                width, height = fields[8], fields[9]
            elif tag == b"strh":
                fcc_type = buf[body_start : body_start + 4]
                handler = buf[body_start + 4 : body_start + 8]
                if fcc_type == b"vids" and handler not in (b"DIB ", b"\x00\x00\x00\x00", b"RAW "):
                    raise NotImplementedError(
                        f"compressed AVI stream {handler!r} not supported"
                    )
            elif tag == b"strf":
                (compression,) = _s.unpack_from("<I", buf, body_start + 16)
                (bits,) = _s.unpack_from("<H", buf, body_start + 14)
                if compression != 0 or bits != 24:
                    raise NotImplementedError(
                        f"AVI biCompression={compression} bitcount={bits} not supported"
                    )
            elif tag in (b"00db", b"00dc"):
                frames.append(buf[body_start : body_start + size])
            pos = body_start + size + (size % 2)

    walk(payload, 12, len(payload))
    if width is None or height is None:
        raise ValueError("AVI missing avih header")
    row = width * 3
    pad = (4 - row % 4) % 4
    rgb_frames = []
    for dib in frames:
        if len(dib) != (row + pad) * height:
            raise ValueError("AVI frame size does not match avih dimensions")
        out = bytearray()
        for y in range(height - 1, -1, -1):  # undo bottom-up
            line = dib[y * (row + pad) : y * (row + pad) + row]
            for x in range(width):  # undo BGR
                out += line[x * 3 : x * 3 + 3][::-1]
        rgb_frames.append(bytes(out))
    if declared_frames and declared_frames != len(rgb_frames):
        raise ValueError(
            f"avih declares {declared_frames} frames, movi has {len(rgb_frames)}"
        )
    return width, height, len(rgb_frames), rgb_frames


def resize_nearest(
    width: int, height: int, pixels: bytes, new_w: int, new_h: int
) -> bytes:
    """Nearest-neighbor resample of a grayscale pixel buffer.

    The standard integer mapping (src = dst * src_dim // dst_dim) — the
    resize step of an image-preprocessing pipeline, kept dependency-free
    like the codecs above.
    """
    if new_w <= 0 or new_h <= 0:
        raise ValueError(f"resize_nearest: bad target {new_w}x{new_h}")
    if len(pixels) != width * height:
        raise ValueError(
            f"resize_nearest: buffer {len(pixels)} != {width}x{height}"
        )
    out = bytearray()
    for y in range(new_h):
        sy = y * height // new_h
        row = sy * width
        for x in range(new_w):
            out.append(pixels[row + x * width // new_w])
    return bytes(out)
