"""Launcher for tracking_train_impl.py in a FRESH interpreter.

The through-solver reverse-mode programs (grad through the GN scan +
Cholesky into PWC-Net) segfault the XLA CPU compiler when compiled in a
long-lived process that has already compiled ~150 other programs —
reproduced twice at the same test on a quiet host, while the module
passes standalone every time (CLAUDE.md). Running the real module in a
subprocess pins the coverage without the in-process compiler-state
hazard.
"""

import os
import subprocess
import sys


def test_tracking_train_module():
    impl = os.path.join(os.path.dirname(__file__), "tracking_train_impl.py")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", impl],
        capture_output=True,
        text=True,
        timeout=1500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    sys.stdout.write(r.stdout[-2000:])
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]
