// Stub: the reference includes <gmp.h> only to work around a Vivado HLS bug
// (GIN/src/dcl.h:4-6); nothing from gmp is used in C++ compilation.
#ifndef FLOWGNN_GOLDEN_GMP_H
#define FLOWGNN_GOLDEN_GMP_H
#endif
