#!/usr/bin/env python
"""CLI wrapper (reference parity: src/train.py). See object_detection_torch2_tpu/cli/train.py."""
from object_detection_torch2_tpu.cli.train import main

if __name__ == "__main__":
    main()
