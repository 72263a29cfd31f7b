#!/bin/sh
# Build the native building-JSON parser shared library.
set -e
cd "$(dirname "$0")"
g++ -O2 -std=c++17 -fPIC -shared -o libbuildingjson.so buildingjson.cc
echo "built $(pwd)/libbuildingjson.so"
g++ -O2 -std=c++17 -fPIC -shared -pthread -o libbatcher.so batcher.cc
echo "built $(pwd)/libbatcher.so"
