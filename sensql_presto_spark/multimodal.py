"""Multimodal decode stubs — real decoders gated behind optional imports.

The pipeline queries (``queries/pipeline.py``) treat image/audio/video as
opaque ``binary`` columns with typed metadata and run deterministic fake
extractors through ``mapInPandas``. This module holds the seam where real
decoders plug in: each ``decode_*`` resolves its library at call time and
raises ``NotImplementedError`` when the library is absent (this container
ships no image/audio codecs), so the Spark-side plumbing — schema, Arrow
batch shape, partitioning — is fully exercised while the codec itself is
swappable.
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


def decode_audio(payload: bytes) -> tuple[int, int]:
    """Return (n_samples, sample_rate) for an encoded audio payload."""
    if not _HAVE_SOUNDFILE:
        raise NotImplementedError(
            "audio decode requires soundfile; install it and this stub becomes real."
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
