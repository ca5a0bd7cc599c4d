#!/bin/sh
# Build the native runtime library (no cmake needed — two TUs, plain g++).
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O3 -shared -fPIC -pthread -std=c++17 \
    src/ftcf_io.cc src/ftcf_trie.cc \
    -o lib/libftcf_native.so
echo "built lib/libftcf_native.so"
