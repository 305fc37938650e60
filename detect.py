#!/usr/bin/env python
"""Thin wrapper: python detect.py ...  ==  python -m dmayolo_tpu.cli.detect ..."""
from dmayolo_tpu.cli.detect import main

if __name__ == "__main__":
    main()
