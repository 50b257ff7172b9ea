#!/usr/bin/env python
"""CLI wrapper (reference parity: src/evaluate.py). See object_detection_torch2_tpu/cli/evaluate.py."""
from object_detection_torch2_tpu.cli.evaluate import main

if __name__ == "__main__":
    main()
