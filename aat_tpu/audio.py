"""Waveform value types.

Reference parity: src/aat/audio.py:3-15 (AudioWaveform with duration and
sampling-rate assertion). Kept numpy-first: waveforms enter the framework as
host arrays and are batched before device transfer.
"""

from dataclasses import dataclass

import numpy as np


@dataclass
class AudioWaveform:
    """A 1-D waveform plus its sampling rate."""

    waveform: np.ndarray
    sampling_rate: int

    @property
    def duration_seconds(self) -> float:
        return self.waveform.shape[-1] / self.sampling_rate

    def assert_sampling_rate(self, expected_sampling_rate: int) -> None:
        assert self.sampling_rate == expected_sampling_rate, (
            f"expected sampling rate {expected_sampling_rate}, got {self.sampling_rate}"
        )
