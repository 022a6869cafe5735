"""bench.py headline selection: never report a faster-than-physics number."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from bench import classify_windows  # noqa: E402


def test_consistent_window_wins():
    # floor 80 ms; windows include a pooled 2 ms and an honest 85 ms
    step, regime = classify_windows([0.002, 0.085, 0.120], floor_s=0.080)
    assert step == 0.085
    assert regime == "single-chip-consistent"


def test_all_pooled_clamps_to_floor():
    step, regime = classify_windows([0.002, 0.003], floor_s=0.080)
    assert step == 0.080
    assert regime == "pooled-clamped-to-roofline-upper-bound"


def test_no_cost_model_falls_back_to_best():
    step, regime = classify_windows([0.05, 0.09], floor_s=None)
    assert step == 0.05
    assert regime == "unverified-no-cost-model"


def test_best_consistent_not_median():
    # two honest windows: pick the faster of the honest ones
    step, _ = classify_windows([0.085, 0.100, 0.002], floor_s=0.080)
    assert step == 0.085


def test_chip_peaks_longest_prefix_wins(monkeypatch):
    """'TPU v5 lite' must match the v5e entry, not the v5p 'TPU v5' one."""
    import bench

    class FakeDev:
        def __init__(self, kind):
            self.device_kind = kind

    import jax

    for kind, tflops in [("TPU v5 lite", 197.0), ("TPU v5p x", 459.0), ("TPU v4 foo", 275.0)]:
        monkeypatch.setattr(jax, "devices", lambda k=kind: [FakeDev(k)])
        flops, bw, got_kind, known = bench.chip_peaks()
        assert known and got_kind == kind
        assert flops / 1e12 == tflops

    monkeypatch.setattr(jax, "devices", lambda: [FakeDev("Mystery Accelerator")])
    flops, bw, kind, known = bench.chip_peaks()
    assert not known  # unknown silicon is flagged, constants fall back to v5e
    assert flops / 1e12 == 197.0
