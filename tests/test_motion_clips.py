"""Launcher for motion_clips_impl.py in a FRESH interpreter.

test_training_reduces_loss compiles the motion-GNN reverse program;
under a contended host the XLA CPU compiler aborts mid-suite
("Fatal Python error: Aborted", reproduced in round 3 at ~80% through
the full run) while the module passes standalone every time — the same
in-process compiler-state hazard test_tracking_train.py already
isolates. Running the real module in a subprocess pins the coverage
without it.
"""

import os
import subprocess
import sys


def test_motion_clips_module():
    impl = os.path.join(os.path.dirname(__file__), "motion_clips_impl.py")
    r = subprocess.run(
        [sys.executable, "-m", "pytest", "-q", impl],
        capture_output=True,
        text=True,
        timeout=1500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    sys.stdout.write(r.stdout[-2000:])
    assert r.returncode == 0, r.stdout[-4000:] + r.stderr[-2000:]
