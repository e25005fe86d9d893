"""Optional-dependency probe — one cached import check per process.

The container this engine develops in lacks the native media/codec
libraries (PIL, soundfile, PyAV) and the protobuf runtime that
``transformWithStateInPandas`` needs. Everything that COULD use them is
written against this probe so the round the sandbox gains a library,
the corresponding capability activates with zero code changes:

- ``PIL.Image``   → library decode fallback for image formats the
  pure-Python chain rejects (progressive JPEG, interlaced PNG, WebP…)
  in operators/multimodal.py `_try_decode_image`.
- ``soundfile``   → compressed-audio decode fallback (FLAC/OGG…) in
  `_try_decode_audio`.
- ``av``          → container/codec decode (MP3, H.264…) for audio and
  video payloads.
- ``google.protobuf`` → the TWS runtime test
  (tests/test_streaming.py) stops skipping via importorskip.

The probe result is logged by tests/test_env_probe.py every run, so
each round's pytest output records exactly which optional capabilities
were active.
"""

from __future__ import annotations

import importlib

OPTIONAL_DEPS = ("PIL.Image", "soundfile", "av", "google.protobuf")

_PROBE: dict[str, bool] | None = None


def probe() -> dict[str, bool]:
    """{module: importable} for every optional dependency; cached."""
    global _PROBE
    if _PROBE is None:
        result = {}
        for mod in OPTIONAL_DEPS:
            try:
                importlib.import_module(mod)
                result[mod] = True
            except Exception:
                result[mod] = False
        _PROBE = result
    return _PROBE


def have(mod: str) -> bool:
    return probe().get(mod, False)
