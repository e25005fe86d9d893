"""Per-round environment probe (VERDICT r7 next-step #7): log which
optional libraries are importable so every pytest run records exactly
which env-gated capabilities were active, and pin the fallback wiring
that auto-activates them the round the sandbox changes."""

from __future__ import annotations

from flyq_spark.envprobe import OPTIONAL_DEPS, have, probe


def test_probe_logs_optional_deps(capsys):
    result = probe()
    assert set(result) == set(OPTIONAL_DEPS)
    # always-visible record in the test output (-rP not needed: the
    # print lands in the captured block shown on failure, and the
    # assertion message carries it on any future env change)
    report = ", ".join(f"{k}={'yes' if v else 'no'}" for k, v in result.items())
    print(f"ENV PROBE: {report}")
    assert all(isinstance(v, bool) for v in result.values()), report


def test_image_lib_fallback_is_wired():
    """_try_decode_image must end with the library fallback: when PIL
    is absent the fallback returns None (stub path unchanged); when
    present, a format the stdlib chain rejects gets a real decode."""
    from flyq_spark.operators.multimodal import (
        _try_decode_image_lib,
        _try_decode_jpeg,
    )

    # a progressive-JPEG-shaped payload: stdlib decoder must reject it
    prog = b"\xff\xd8\xff\xc2" + b"\x00\x10" + b"\x00" * 32
    assert _try_decode_jpeg(prog) is None
    if not have("PIL.Image"):
        assert _try_decode_image_lib(prog) is None
    else:
        # PIL present: a real (tiny, baseline) image must decode through
        # the lib path too — proves the fallback is functional, not inert
        import io

        import numpy as np
        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            np.arange(12, dtype=np.uint8).reshape(3, 4)
        ).save(buf, format="PNG")
        luma = _try_decode_image_lib(buf.getvalue())
        assert luma is not None and luma.shape == (3, 4)


def test_audio_lib_fallback_is_wired():
    from flyq_spark.operators.multimodal import (
        _try_decode_audio,
        _try_decode_audio_lib,
    )

    garbage = b"\x00\x01\x02not-audio" * 4
    if not (have("soundfile") or have("av")):
        assert _try_decode_audio_lib(garbage) is None
        assert _try_decode_audio(garbage) is None


def test_tws_runtime_gate_matches_probe():
    """The transformWithStateInPandas suite skip and the probe must
    agree — the round google.protobuf appears, the runtime test stops
    skipping automatically (it uses importorskip on the same module)."""
    import importlib.util

    try:
        # find_spec raises when even the parent package is absent
        spec_present = importlib.util.find_spec("google.protobuf") is not None
    except ModuleNotFoundError:
        spec_present = False
    assert have("google.protobuf") == spec_present
