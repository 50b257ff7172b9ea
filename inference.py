#!/usr/bin/env python
"""CLI wrapper (reference parity: src/inference.py). See object_detection_torch2_tpu/cli/inference.py."""
from object_detection_torch2_tpu.cli.inference import main

if __name__ == "__main__":
    main()
