"""Backend capability probe: unknown platform names must fail LOUDLY into
interpret mode (warning), never silently (round-3 advisor finding: a name
allowlist routed unknown accelerators to interpret mode with no signal)."""
import warnings

import jax
import pytest

from rayzath_tpu.ops import traverse_cluster as tc


def test_unknown_backend_warns_and_falls_back(monkeypatch):
    monkeypatch.setattr(tc, "_MOSAIC_OK", None)
    monkeypatch.setattr(jax, "default_backend", lambda: "weirdchip")
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert tc._interpret() is True          # explicit fallback
    assert any("Mosaic" in str(w.message) for w in rec), \
        "unknown backend must warn about the interpret-mode fallback"


def test_cpu_backend_interprets_without_warning(monkeypatch):
    monkeypatch.setattr(tc, "_MOSAIC_OK", None)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        assert tc._interpret() is True          # tests run on CPU
    assert not any("Mosaic" in str(w.message) for w in rec)


def test_probe_result_is_cached(monkeypatch):
    monkeypatch.setattr(tc, "_MOSAIC_OK", None)
    assert tc.mosaic_supported() == tc.mosaic_supported()
    assert tc._MOSAIC_OK is not None
