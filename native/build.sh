#!/bin/sh
# Build the native PLY codec -> splatapult_tpu/io/_libsplatply.so
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -pthread -std=c++17 -o ../splatapult_tpu/io/_libsplatply.so splatply.cpp
echo "built ../splatapult_tpu/io/_libsplatply.so"
