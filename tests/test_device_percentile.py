"""Device percentile (jnp.sort + linear-interp gather) is bit-identical to
the numpy path (thresholds.rs:17 percentile_linear_interp), and
thresholds_from_sampled engages it when the offload policy selects the
device."""

import numpy as np
import pytest

from modkit_tpu.thresholds import (
    percentile_linear_interp, percentile_linear_interp_device,
)


@pytest.mark.parametrize("n", [2, 3, 1000, 4097, 100_000])
@pytest.mark.parametrize("q", [0.0, 0.1, 0.25, 0.5, 0.9, 1.0])
def test_device_percentile_bit_identical(n, q):
    rng = np.random.default_rng(n)
    xs = rng.random(n, dtype=np.float32)
    want = percentile_linear_interp(np.sort(xs), q)
    got = percentile_linear_interp_device(xs, q)
    assert np.float32(got) == np.float32(want), (n, q)


def test_thresholds_from_sampled_uses_device(monkeypatch):
    import modkit_tpu.thresholds as th

    calls = {"device": 0}
    orig = th.percentile_linear_interp_device

    def spy(xs, q):
        calls["device"] += 1
        return orig(xs, q)

    monkeypatch.setattr(th, "percentile_linear_interp_device", spy)
    monkeypatch.setenv("MODKIT_TPU_OFFLOAD", "always")
    sampled = {
        "r1": {1: [((0,), np.array([[0.9], [0.2]], dtype=np.float32))]},
        "r2": {1: [((0,), np.array([[0.7], [0.4]], dtype=np.float32))]},
    }
    out = th.thresholds_from_sampled(sampled, 0.1)
    assert calls["device"] == 1
    assert "C" in out
