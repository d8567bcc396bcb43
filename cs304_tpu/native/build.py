"""Build the native wavio library with g++ (no pybind11 — plain C ABI)."""
from __future__ import annotations

import logging
import os
import subprocess

logger = logging.getLogger(__name__)

_HERE = os.path.dirname(os.path.abspath(__file__))
SOURCE = os.path.join(_HERE, "wavio.cpp")
LIBRARY = os.path.join(_HERE, "libcs304wavio.so")


def build(force: bool = False) -> str | None:
    """Compile wavio.cpp -> libcs304wavio.so. Returns the path or None."""
    if os.path.exists(LIBRARY) and not force:
        try:
            if os.path.getmtime(LIBRARY) >= os.path.getmtime(SOURCE):
                return LIBRARY
        except OSError:
            # Installed-package layout: a prebuilt .so without the source.
            return LIBRARY
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        SOURCE, "-o", LIBRARY,
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
        logger.info("built native library: %s", LIBRARY)
        return LIBRARY
    except (subprocess.SubprocessError, FileNotFoundError) as e:
        logger.warning("native build failed (%s); using Python fallbacks", e)
        return None


if __name__ == "__main__":
    print(build(force=True))
