// Minimal hls::vector<T, N> emulation for the golden build — a plain
// fixed-size elementwise value type (NOT a copy of any Xilinx header).
// Supports what the reference kernels use: broadcast construction from a
// scalar, indexing, elementwise + - * / and compound assignment, including
// nested vectors (hls::vector<hls::vector<...>, M>).
//
// Semantic note: binary ops route through the element's compound ops, so a
// vector PRODUCT quantizes each element to the ap_fixed grid before any
// subsequent accumulation (Vitis keeps the product exact in a widened type
// until assignment — a ≤1-ulp-per-product difference). The fixed-exact
// NumPy oracles (reference/fixed_exact.py) replay THESE semantics, so
// golden binary and oracle agree bit-for-bit; both may differ from the
// FPGA by ulp-level product rounding (same caveat class as division,
// see ap_fixed.h).
#ifndef FLOWGNN_GOLDEN_HLS_VECTOR_H
#define FLOWGNN_GOLDEN_HLS_VECTOR_H

#include <array>
#include <cstddef>
#include <type_traits>

namespace hls {

template <typename T, int N>
struct vector {
  T data_[N];

  vector() = default;
  vector(const T& s) {
    for (int i = 0; i < N; ++i) data_[i] = s;
  }
  // Broadcast from anything convertible to the element type (e.g.
  // FM_VEC(0), or a vector-of-vectors broadcast from its element) — the
  // constraint keeps conversions one-directional so ternaries between a
  // vector and its element resolve unambiguously.
  template <typename U,
            typename = std::enable_if_t<
                std::is_convertible<const U&, T>::value &&
                !std::is_same<U, vector>::value>>
  vector(const U& s) {
    for (int i = 0; i < N; ++i) data_[i] = T(s);
  }

  T& operator[](int i) { return data_[i]; }
  const T& operator[](int i) const { return data_[i]; }

  vector& operator=(const T& s) {
    for (int i = 0; i < N; ++i) data_[i] = s;
    return *this;
  }

#define FLOWGNN_HLSVEC_COMPOUND(op)                    \
  vector& operator op(const vector& o) {               \
    for (int i = 0; i < N; ++i) data_[i] op o.data_[i]; \
    return *this;                                      \
  }
  FLOWGNN_HLSVEC_COMPOUND(+=)
  FLOWGNN_HLSVEC_COMPOUND(-=)
  FLOWGNN_HLSVEC_COMPOUND(*=)
  FLOWGNN_HLSVEC_COMPOUND(/=)
#undef FLOWGNN_HLSVEC_COMPOUND

  friend vector operator+(vector a, const vector& b) { return a += b; }
  friend vector operator-(vector a, const vector& b) { return a -= b; }
  friend vector operator*(vector a, const vector& b) { return a *= b; }
  friend vector operator/(vector a, const vector& b) { return a /= b; }
};

}  // namespace hls

#endif
