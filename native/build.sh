#!/bin/sh
# Build libvface_io.so (no external deps; C++17 + pthreads).
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 -pthread -o libvface_io.so vface_io.cc
echo "built $(pwd)/libvface_io.so"
