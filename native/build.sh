#!/bin/sh
# Build the native C API library + smoke test.
set -e
cd "$(dirname "$0")"
mkdir -p build
PY_INC=$(python3 -c "import sysconfig; print(sysconfig.get_paths()['include'])")
PY_LIBDIR=$(python3 -c "import sysconfig; print(sysconfig.get_config_var('LIBDIR'))")
PY_LDFLAGS=$(python3-config --ldflags --embed)
g++ -O2 -fPIC -shared -std=c++14 -I"$PY_INC" of2d_capi.cpp \
    $PY_LDFLAGS -Wl,-rpath,"$PY_LIBDIR" \
    -o build/libopticalflow2d.so
gcc -O2 of2d_test.c -Lbuild -lopticalflow2d -lm -Wl,-rpath,"$PWD/build" \
    -o build/of2d_test
echo "built native/build/libopticalflow2d.so and native/build/of2d_test"
