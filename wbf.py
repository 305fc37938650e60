#!/usr/bin/env python
"""Thin wrapper: python wbf.py ...  ==  python -m dmayolo_tpu.cli.wbf ..."""
from dmayolo_tpu.cli.wbf import main

if __name__ == "__main__":
    main()
