"""Detector-dataset profiles (the codec's "model zoo").

The reference benchmarks Delta-Rice on three experiment families
(``/root/reference/docs/Performance.md``): Nab (the codec's home
experiment), nEDM@SNS, and NOPTREX. Each profile records the published
waveform geometry and codec parameters, and provides a synthetic waveform
generator with matching statistics for benchmarks and tests.
"""

from .profiles import PROFILES, DatasetProfile, get_profile

__all__ = ["PROFILES", "DatasetProfile", "get_profile"]
