#!/bin/sh
# Build the native host runtime (libmvrecon_native.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libmvrecon_native.so mst.cpp
echo "built $(pwd)/libmvrecon_native.so"
