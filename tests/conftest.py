"""Test harness: force an 8-device virtual CPU mesh before JAX initializes.

Multi-chip sharding paths (dp/fsdp/tp) are exercised on host CPU devices;
real-TPU execution is covered by bench.py and the driver's compile checks.
"""

import os
import sys

# Must be set before jax initializes backends. The machine environment pins
# JAX_PLATFORMS=axon (the real TPU tunnel) and a sitecustomize hook registers
# the axon plugin with jax_platforms="axon,cpu" — env overrides alone are
# ineffective; the config update below is what forces hermetic CPU tests.
os.environ["JAX_PLATFORMS"] = "cpu"
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def make_speechlike_waveform(rng, duration_s=4.0, sampling_rate=16000):
    """Synthetic speech-like signal: bursts of band-limited noise separated by
    near-silence, so the adaptive tokenizer finds nontrivial boundaries."""
    n = int(duration_s * sampling_rate)
    t = np.arange(n) / sampling_rate
    envelope = np.zeros(n)
    pos = 0
    while pos < n:
        burst = int(rng.uniform(0.15, 0.6) * sampling_rate)
        gap = int(rng.uniform(0.05, 0.3) * sampling_rate)
        envelope[pos : pos + burst] = np.hanning(max(burst, 2))[: max(n - pos, 0)][:burst]
        pos += burst + gap
    carrier = rng.normal(0, 1.0, n) * 0.5 + 0.3 * np.sin(2 * np.pi * 220 * t)
    return (envelope * carrier + rng.normal(0, 1e-4, n)).astype(np.float64)
