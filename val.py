#!/usr/bin/env python
"""Thin wrapper: python val.py ...  ==  python -m dmayolo_tpu.cli.val ..."""
from dmayolo_tpu.cli.val import main

if __name__ == "__main__":
    main()
