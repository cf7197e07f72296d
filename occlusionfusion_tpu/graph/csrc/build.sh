#!/bin/sh
# Build the native graph-builder shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 -Wall \
    graph_builder.cpp -o libgraph_builder.so
echo "built $(pwd)/libgraph_builder.so"
