#!/bin/sh
# Build the native host runtime (see slamcore.cc).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC slamcore.cc -o libslamcore.so
echo "built $(pwd)/libslamcore.so"
