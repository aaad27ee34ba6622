#!/bin/sh
# Build the native host-IO library. Output lands next to the sources so the
# ctypes loader (data/native_reader.py) finds it without installation.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -pthread -shared -fPIC -o libtfrecord_reader.so tfrecord_reader.cc
echo "built $(pwd)/libtfrecord_reader.so"
