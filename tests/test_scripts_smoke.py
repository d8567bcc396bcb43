"""Every CLI script must at least import and print --help (catches wiring rot)."""
import glob
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPTS = sorted(glob.glob(os.path.join(REPO, "scripts", "*.py")))
SCRIPTS = [s for s in SCRIPTS if not s.endswith("_common.py")]


@pytest.mark.parametrize("script", SCRIPTS, ids=[os.path.basename(s) for s in SCRIPTS])
def test_script_help(script):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, script, "--help"],
        capture_output=True, text=True, timeout=300, env=env,
        cwd=os.path.dirname(script),
    )
    assert proc.returncode == 0, proc.stderr[-800:]
    assert "--help" in proc.stdout or "usage" in proc.stdout.lower()
