#!/usr/bin/env bash
# Build the native data runtime -> native/libpmt_dataio.so
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    pmt_dataio.cc -o libpmt_dataio.so -lpng -lz -lpthread
echo "built $(pwd)/libpmt_dataio.so"
