// Debug harness: run ONE graph through the reference DGN kernel layer by
// layer (replicating DGN_compute_graphs' loop, DGN/src/DGN_compute.cc:50-106,
// with this framework's own driver code) and dump h_node after each
// iteration for per-layer divergence localisation.
//
// Usage: dgn_debug <dataset_dir> <graph_index> <weights_dir>

#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "dcl.h"
#include "load_inputs.h"
#include "conv_layer.h"

namespace {
std::vector<float> read_at(FILE* f, long offset_floats, size_t count) {
  std::fseek(f, offset_floats * sizeof(float), SEEK_SET);
  std::vector<float> out(count);
  if (std::fread(out.data(), sizeof(float), count, f) != count) std::exit(2);
  return out;
}
template <typename T>
void quantize_into(const std::vector<float>& src, T* dst) {
  for (size_t i = 0; i < src.size(); ++i) dst[i] = T(src[i]);
}
}  // namespace

int main(int argc, char** argv) {
  if (argc != 4) return 1;
  const std::string data_dir = argv[1];
  const int gidx = std::atoi(argv[2]);
  const std::string wpath =
      std::string(argv[3]) + "/dgn_ep1_noBN_dim100.weights.all.bin";

  static WT_TYPE embeds[9][119][100];
  static WT_TYPE post_w[4][100][200];
  static WT_TYPE post_b[4][100];
  static WT_TYPE mlp0_w[50][100];
  static WT_TYPE mlp0_b[50];
  static WT_TYPE mlp1_w[25][50];
  static WT_TYPE mlp1_b[25];
  static WT_TYPE mlp2_w[1][25];
  static WT_TYPE mlp2_b[1];

  FILE* f = std::fopen(wpath.c_str(), "rb");
  if (!f) return 2;
  const long emb_off[9] = {0, 11900, 12300, 13500, 14700,
                           15700, 16300, 16900, 17100};
  const int emb_vocab[9] = {119, 4, 12, 12, 10, 6, 6, 2, 2};
  for (int k = 0; k < 9; ++k)
    quantize_into(read_at(f, emb_off[k], emb_vocab[k] * 100),
                  &embeds[k][0][0]);
  const long pw_off[4] = {17300, 37400, 57500, 77600};
  const long pb_off[4] = {37300, 57400, 77500, 97600};
  for (int l = 0; l < 4; ++l) {
    quantize_into(read_at(f, pw_off[l], 20000), &post_w[l][0][0]);
    quantize_into(read_at(f, pb_off[l], 100), &post_b[l][0]);
  }
  quantize_into(read_at(f, 97700, 5000), &mlp0_w[0][0]);
  quantize_into(read_at(f, 102700, 50), &mlp0_b[0]);
  quantize_into(read_at(f, 102750, 1250), &mlp1_w[0][0]);
  quantize_into(read_at(f, 104000, 25), &mlp1_b[0]);
  quantize_into(read_at(f, 104025, 25), &mlp2_w[0][0]);
  quantize_into(read_at(f, 104050, 1), &mlp2_b[0]);
  std::fclose(f);

  char path[512];
  std::snprintf(path, sizeof(path), "%s/graph_info/g%d_info.txt",
                data_dir.c_str(), gidx);
  FILE* fi = std::fopen(path, "r");
  int n, e;
  if (!fi || std::fscanf(fi, "%d%d", &n, &e) != 2) return 2;
  std::fclose(fi);
  std::vector<node_feature_t> node_feat(n);
  std::vector<node_eigen_t> node_eig(n);
  std::vector<edge_t> edges(e);
  std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_node_feature.bin",
                data_dir.c_str(), gidx);
  fi = std::fopen(path, "rb");
  if (std::fread(node_feat.data(), sizeof(node_feature_t), n, fi) != (size_t)n)
    return 2;
  std::fclose(fi);
  std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_edge_list.bin",
                data_dir.c_str(), gidx);
  fi = std::fopen(path, "rb");
  if (std::fread(edges.data(), sizeof(edge_t), e, fi) != (size_t)e) return 2;
  std::fclose(fi);
  std::snprintf(path, sizeof(path), "%s/eig/g%d.txt", data_dir.c_str(), gidx);
  fi = std::fopen(path, "r");
  float ev[4];
  std::fscanf(fi, "tensor([[%e, %e,%e,%e],\n", &ev[0], &ev[1], &ev[2], &ev[3]);
  for (int i = 0; i < 4; ++i) node_eig[0][i] = WT_TYPE(ev[i]);
  for (int nd = 1; nd < n - 1; ++nd) {
    std::fscanf(fi, "[%e, %e,%e,%e],\n", &ev[0], &ev[1], &ev[2], &ev[3]);
    for (int i = 0; i < 4; ++i) node_eig[nd][i] = WT_TYPE(ev[i]);
  }
  std::fscanf(fi, "[%e, %e,%e,%e]])", &ev[0], &ev[1], &ev[2], &ev[3]);
  for (int i = 0; i < 4; ++i) node_eig[n - 1][i] = WT_TYPE(ev[i]);
  std::fclose(fi);

  load_weights(post_w, post_b, mlp0_w, mlp0_b, mlp1_w, mlp1_b, mlp2_w,
               mlp2_b);
  load_graph(edges.data(), node_eig.data(), n, e);

  FM_TYPE out[NUM_TASK];
  for (int i = 0; i <= NUM_LAYERS; ++i) {
    if (i % 2 == 0)
      compute_CONV_layer(i, messages_ping, messages_pong, node_feat.data(),
                         embeds, out, n);
    else
      compute_CONV_layer(i, messages_pong, messages_ping, node_feat.data(),
                         embeds, out, n);
    std::printf("== after layer %d\n", i);
    for (int nd = 0; nd < (n < 3 ? n : 3); ++nd) {
      std::printf("h[%d]:", nd);
      for (int d = 0; d < 8; ++d) std::printf(" %.6f", double(h_node[nd][d]));
      std::printf("\n");
    }
  }
  std::printf("out: %.10f\n", double(out[0]));
  return 0;
}
