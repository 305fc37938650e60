#!/bin/sh
# Build the fastload native library. Requires g++ and libjpeg (both baked
# into the image). The Python wrapper (dmayolo_tpu/data/fastload.py) runs
# this automatically when the .so is missing or older than the source.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -o libfastload.so fastload.cpp -ljpeg
echo "built $(pwd)/libfastload.so"
