// Minimal hls:: math shims for the golden build (reimplementation).
// Vitis' fixed-point math cores are bit-approximations; these are
// double-precision stand-ins — exact enough for the ops the kernels use on
// values that are then re-quantized to the ap_fixed grid.
#ifndef FLOWGNN_GOLDEN_HLS_MATH_H
#define FLOWGNN_GOLDEN_HLS_MATH_H

#include <cmath>

namespace hls {

template <typename T> bool signbit(const T& x) { return double(x) < 0.0; }
template <typename T> double sqrt(const T& x) { return std::sqrt(double(x)); }
template <typename T> double recip(const T& x) { return 1.0 / double(x); }
template <typename T> double exp(const T& x) { return std::exp(double(x)); }
template <typename T> double log(const T& x) { return std::log(double(x)); }
template <typename T> double abs(const T& x) { return std::fabs(double(x)); }

}  // namespace hls
#endif
