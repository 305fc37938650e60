#!/usr/bin/env python
"""Thin wrapper: python export.py ...  ==  python -m dmayolo_tpu.cli.export ..."""
from dmayolo_tpu.cli.export import main

if __name__ == "__main__":
    main()
