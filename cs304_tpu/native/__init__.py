"""Native (C++) runtime tier: WAV decode, frame energies, endpointing.

Loads libcs304wavio.so via ctypes (built on demand from wavio.cpp by
build.py). All entry points have pure-Python/scipy fallbacks, so the package
works without a compiler; with the library present, the IO hot path runs
native.
"""
from .loader import (
    HAS_NATIVE,
    native_endpoint_feed,
    native_endpoint_frames,
    native_frame_energies,
    native_read_wav,
)

__all__ = [
    "HAS_NATIVE",
    "native_read_wav",
    "native_frame_energies",
    "native_endpoint_frames",
    "native_endpoint_feed",
]
