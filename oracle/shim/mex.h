// CLI shim replacing the MATLAB MEX API for the parity oracle build.
// The reference's src/*.cpp files include <mex.h> only for mexPrintf and
// mexErrMsgTxt (see SURVEY.md §6); the full mxArray API is used only by
// WrapperOpticalFlow2d.cpp, which the oracle does not compile.
#pragma once

#include <cstdarg>
#include <cstdio>
#include <stdexcept>
#include <string>

static inline void mexPrintf(const char* fmt, ...) {
    va_list args;
    va_start(args, fmt);
    vfprintf(stderr, fmt, args);
    va_end(args);
}

static inline void mexErrMsgTxt(const char* msg) {
    throw std::runtime_error(std::string(msg));
}
