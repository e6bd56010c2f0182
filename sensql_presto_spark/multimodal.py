"""Multimodal decoders — one real codec, one gated stub.

The pipeline queries (``queries/pipeline.py``) treat image/audio/video as
opaque ``binary`` columns with typed metadata and decode them only inside
``mapInPandas`` Arrow batches.

Audio is REAL (round 3): ``encode_wav_pcm16``/``decode_wav`` implement the
RIFF/WAVE PCM container with the stdlib ``wave`` + ``struct`` modules —
no third-party codec needed — and ``queries/pipeline.py::mm_audio_windows``
computes its windowed energies from actually-decoded samples.

Image decode remains the single gated stub: ``decode_image`` resolves
Pillow at call time and raises ``NotImplementedError`` when absent (this
container ships no image codec), so the Spark-side plumbing — schema,
Arrow batch shape, partitioning — is fully exercised while the codec
itself stays swappable.
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


def decode_image(payload: bytes) -> tuple[int, int, str]:
    """Return (width, height, mode) for an encoded image payload."""
    if not _HAVE_PIL:
        raise NotImplementedError(
            "image decode requires Pillow; install it and this stub becomes real. "
            "The Spark plumbing (binary column -> mapInPandas -> typed rows) is "
            "tested with the deterministic fake extractor in queries/pipeline.py."
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
