#!/usr/bin/env python
"""Thin wrapper: python main_gradcam.py ...  ==  python -m dmayolo_tpu.cli.gradcam ...

Reference layout entry point (main_gradcam.py — broken upstream; this one works).
"""
from dmayolo_tpu.cli.gradcam import main

if __name__ == "__main__":
    main()
