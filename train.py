#!/usr/bin/env python
"""Thin wrapper: python train.py ...  ==  python -m dmayolo_tpu.cli.train ..."""
from dmayolo_tpu.cli.train import main

if __name__ == "__main__":
    main()
