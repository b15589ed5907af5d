// Minimal ap_fixed<W,I> emulation for compiling the reference kernels as a
// plain-C++ golden oracle (the sw_emu tier, SURVEY.md §4). NOT a copy of any
// Xilinx header — a double-backed reimplementation of the semantics the
// reference relies on:
//
//  * values live on the 2^-(W-I) grid within signed-W-bit wrapped range,
//  * assignment/construction quantizes with AP_TRN (truncate toward −∞)
//    and AP_WRAP (two's-complement wraparound) — the Vitis defaults,
//  * arithmetic runs exact in double (Vitis widens intermediates enough to
//    be exact for these kernels; doubles hold all products of two 2^-10
//    grid values exactly) and re-quantizes only on assignment to a typed
//    variable — matching where the HLS code declares FM_TYPE temporaries.
//
// Division is correctly-rounded double division quantized on assignment;
// Vitis truncates the exact quotient instead, which can differ by one ulp
// when the true quotient lies on a representable boundary — the golden
// tests therefore allow a 1-ulp tolerance on divisions (mean pooling).
#ifndef FLOWGNN_GOLDEN_AP_FIXED_H
#define FLOWGNN_GOLDEN_AP_FIXED_H

#include <cmath>
#include <cstdint>

template <int W, int I>
struct ap_fixed {
  static constexpr int width = W;
  static constexpr int iwidth = I;
  double v;

  static double quant(double x) {
    const double scale = double(int64_t(1) << (W - I));
    double qf = std::floor(x * scale);
    const int64_t span = int64_t(1) << W;
    const int64_t half = int64_t(1) << (W - 1);
    // Guard insane magnitudes (inf/NaN would poison int64 casts).
    if (!(qf > -9.0e18 && qf < 9.0e18)) qf = std::fmod(qf, double(span));
    int64_t qi = int64_t(qf);
    qi = ((qi + half) % span + span) % span - half;
    return double(qi) / scale;
  }

  ap_fixed() : v(0.0) {}
  ap_fixed(double x) : v(quant(x)) {}
  ap_fixed(float x) : v(quant(double(x))) {}
  ap_fixed(int x) : v(quant(double(x))) {}
  ap_fixed(long x) : v(quant(double(x))) {}
  template <int W2, int I2>
  ap_fixed(const ap_fixed<W2, I2>& o) : v(quant(o.v)) {}

  ap_fixed& operator=(double x) { v = quant(x); return *this; }
  template <int W2, int I2>
  ap_fixed& operator=(const ap_fixed<W2, I2>& o) { v = quant(o.v); return *this; }

  operator double() const { return v; }

  ap_fixed& operator+=(double x) { v = quant(v + x); return *this; }
  ap_fixed& operator-=(double x) { v = quant(v - x); return *this; }
  ap_fixed& operator*=(double x) { v = quant(v * x); return *this; }
  ap_fixed& operator/=(double x) { v = quant(v / x); return *this; }
  ap_fixed& operator++() { v = quant(v + 1.0); return *this; }
  ap_fixed operator-() const { ap_fixed r; r.v = quant(-v); return r; }
};

// Arithmetic stays in double via the implicit conversion (exact
// intermediates, as in Vitis' widened result types); conversion back
// happens at the next typed assignment.

#endif  // FLOWGNN_GOLDEN_AP_FIXED_H
