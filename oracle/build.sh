#!/bin/sh
# Build the parity oracle: the unmodified reference sources (compiled in
# place from /root/reference) + shim headers + CLI main.
set -e
cd "$(dirname "$0")"
REF=${REF:-/root/reference}
mkdir -p build
g++ -O2 -std=c++14 -I shim -I "$REF" \
    main.cpp \
    "$REF"/src/Image.cpp \
    "$REF"/src/Motion.cpp \
    "$REF"/src/Kernel.cpp \
    "$REF"/src/Logger.cpp \
    "$REF"/src/ImageRegistration.cpp \
    "$REF"/src/ImageRegistrationOpticalFlow.cpp \
    "$REF"/src/ImageRegistrationDemons.cpp \
    "$REF"/src/ImageRegistrationFluid.cpp \
    "$REF"/src/regularization/IterativeSolver.cpp \
    "$REF"/src/regularization/OpticalFlow/OpticalFlow.cpp \
    "$REF"/src/regularization/OpticalFlow/OpticalFlowDiffusion.cpp \
    "$REF"/src/regularization/OpticalFlow/OpticalFlowCurvature.cpp \
    "$REF"/src/regularization/OpticalFlow/OpticalFlowElastic.cpp \
    "$REF"/src/regularization/OpticalFlow/OpticalFlowFluid.cpp \
    "$REF"/src/regularization/Demons/Demons.cpp \
    "$REF"/src/regularization/Demons/DemonsThirions.cpp \
    "$REF"/src/regularization/Demons/DemonsDiffeomorphic.cpp \
    -o build/oracle
echo "built oracle/build/oracle"
