#!/usr/bin/env python
"""TNSM trainer — twin of ``train_tnsm.py``.

Thin wrapper over cli/train.py with ``--variant tnsm``: the train step adds
the noise consistency + smoothing losses automatically for the TNSM graph
(train/trainer.py, train_tnsm.py:68-72).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if __name__ == "__main__":
    if not any(a.startswith("--variant") for a in sys.argv[1:]):
        sys.argv.append("--variant=tnsm")
    from cli.train import main

    main()
