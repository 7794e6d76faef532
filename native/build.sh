#!/bin/sh
# Build the native host components into native/libmstpu.so.
set -e
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o libmstpu.so tokenizer.cpp
echo "built $(pwd)/libmstpu.so"
