// Minimal hls::stream for sequential (sw_emu-style) execution of the
// reference dataflow kernels: producers run to completion before consumers,
// so an unbounded FIFO is sufficient (Vitis sw_emu behaves the same way).
// Reimplementation, not a copy of any Xilinx header.
#ifndef FLOWGNN_GOLDEN_HLS_STREAM_H
#define FLOWGNN_GOLDEN_HLS_STREAM_H

#include <cassert>
#include <deque>

namespace hls {

template <typename T>
class stream {
 public:
  stream() = default;
  explicit stream(const char*) {}
  void operator<<(const T& x) { q_.push_back(x); }
  void operator>>(T& x) {
    assert(!q_.empty() && "hls::stream underflow (dataflow order violated)");
    x = q_.front();
    q_.pop_front();
  }
  bool empty() const { return q_.empty(); }

 private:
  std::deque<T> q_;
};

}  // namespace hls
#endif
