#!/bin/sh
# Build the native host components into native/libmstpu.so.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 -o libmstpu.so tokenizer.cpp posting_builder.cpp
echo "built $(pwd)/libmstpu.so"
