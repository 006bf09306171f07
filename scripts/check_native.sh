#!/bin/sh
# Memory-safety gate for the native runtime: builds the epoll HTTP front
# with ASan+UBSan and runs the standalone stress harness
# (native/test_http_stress.cpp): pipelined keep-alive bursts, protocol
# rejects, abrupt disconnects, random fuzz. Exits non-zero on any
# sanitizer report or behavioral assert.
set -e
cd "$(dirname "$0")/.."
g++ -O1 -g -std=c++17 -pthread -fsanitize=address,undefined \
    -fno-sanitize-recover=all \
    -o /tmp/drs_http_stress native/test_http_stress.cpp native/drs_http.cpp
/tmp/drs_http_stress
