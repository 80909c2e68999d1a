#!/usr/bin/env bash
# Build the native data-loader core -> native/libd2tloader.so
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC dataloader.cpp -o libd2tloader.so -ljpeg -lpthread
echo "built $(pwd)/libd2tloader.so"
