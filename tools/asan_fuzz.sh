#!/bin/bash
# AddressSanitizer fuzz of the native entropy runtime (SURVEY §5 "sanitizers").
# Builds an ASan copy of entropy.cc and runs differential + corrupt-stream
# fuzz against the NumPy codec. Exits nonzero on any memory error or mismatch.
set -e
cd "$(dirname "$0")/.."
g++ -O1 -g -std=c++17 -shared -fPIC -pthread -fsanitize=address \
    jpeg_tpu/native/entropy.cc -o /tmp/libjt_asan.so
ASAN_LIB=$(g++ -print-file-name=libasan.so)
LD_PRELOAD=$ASAN_LIB ASAN_OPTIONS=detect_leaks=0 python tools/asan_fuzz.py
