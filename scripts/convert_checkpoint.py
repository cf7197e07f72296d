#!/usr/bin/env python
"""Convert the reference motion-completion torch checkpoint to .npz.

Usage: python scripts/convert_checkpoint.py [tar_path] [npz_path]
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import sys

from occlusionfusion_tpu.models.checkpoint import convert_torch_checkpoint

tar = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/checkpoints/model_noise_all.tar"
npz = sys.argv[2] if len(sys.argv) > 2 else "checkpoints/motion_complete.npz"
convert_torch_checkpoint(tar, npz)
print(f"wrote {npz}")
