// Debug harness: run ONE graph through the reference PNA kernel layer by
// layer (replicating PNA_compute_graphs' loop with this framework's own
// driver code) and dump h_node and the raw message stats after each
// iteration for per-layer divergence localisation.
//
// Usage: pna_debug <dataset_dir> <graph_index> <weights_dir>

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
      std::string(argv[3]) + "/pna_ep1_noBN_dim80.weights.all.bin";

  static WT_TYPE nd_embed[ND_FEATURE_TOTAL][EMB_DIM];
  static WT_TYPE conv_w[NUM_LAYERS][EMB_DIM][NUM_SCALERS][NUM_AGGRS][EMB_DIM];
  static WT_TYPE conv_b[NUM_LAYERS][EMB_DIM];
  static WT_TYPE mlp1_w[GRAPH_MLP_1_OUT][EMB_DIM];
  static WT_TYPE mlp1_b[GRAPH_MLP_1_OUT];
  static WT_TYPE mlp2_w[GRAPH_MLP_2_OUT][GRAPH_MLP_1_OUT];
  static WT_TYPE mlp2_b[GRAPH_MLP_2_OUT];
  static WT_TYPE mlp3_w[NUM_TASK][GRAPH_MLP_2_OUT];
  static WT_TYPE mlp3_b[NUM_TASK];

  FILE* f = std::fopen(wpath.c_str(), "rb");
  if (!f) return 2;
  quantize_into(read_at(f, 0, ND_FEATURE_TOTAL * EMB_DIM), &nd_embed[0][0]);
  const long w_off[NUM_LAYERS] = {13840, 90720, 167600, 244480};
  const long b_off[NUM_LAYERS] = {90640, 167520, 244400, 321280};
  for (int l = 0; l < NUM_LAYERS; ++l) {
    quantize_into(read_at(f, w_off[l], 76800), &conv_w[l][0][0][0][0]);
    quantize_into(read_at(f, b_off[l], EMB_DIM), &conv_b[l][0]);
  }
  quantize_into(read_at(f, 321360, 3200), &mlp1_w[0][0]);
  quantize_into(read_at(f, 324560, 40), &mlp1_b[0]);
  quantize_into(read_at(f, 324600, 800), &mlp2_w[0][0]);
  quantize_into(read_at(f, 325400, 20), &mlp2_b[0]);
  quantize_into(read_at(f, 325420, 20), &mlp3_w[0][0]);
  quantize_into(read_at(f, 325440, 1), &mlp3_b[0]);
  std::fclose(f);

  char path[512];
  std::snprintf(path, sizeof(path), "%s/graph_info/g%d_info.txt",
                data_dir.c_str(), gidx);
  FILE* fi = std::fopen(path, "r");
  int n, e;
  if (!fi || std::fscanf(fi, "%d%d", &n, &e) != 2) return 2;
  std::fclose(fi);
  std::vector<node_feature_t> node_feat(n);
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

  load_weights(conv_w, conv_b, mlp1_w, mlp1_b, mlp2_w, mlp2_b, mlp3_w,
               mlp3_b, WT_TYPE(6.885701656341553));
  load_graph(edges.data(), n, e);
  reset_messages(messages_pong, n);

  FM_TYPE result[NUM_TASK];
  for (int i = 0; i <= NUM_LAYERS; ++i) {
    if (i % 2 == 0)
      compute_CONV_layer(i, messages_ping, messages_pong, node_feat.data(),
                         nd_embed, result, n);
    else
      compute_CONV_layer(i, messages_pong, messages_ping, node_feat.data(),
                         nd_embed, result, n);
    std::printf("== after layer %d\n", i);
    for (int nd = 0; nd < (n < 2 ? n : 2); ++nd) {
      std::printf("h[%d]:", nd);
      for (int d = 0; d < 6; ++d) std::printf(" %.6f", double(h_node[nd][d]));
      std::printf("\n");
      auto& nxt = (i % 2 == 0) ? messages_pong : messages_ping;
      std::printf("m[%d]:", nd);
      for (int d = 0; d < 2; ++d)
        for (int a = 0; a < NUM_AGGRS; ++a)
          std::printf(" %.6f",
                      double(nxt[nd % EDGE_PARALLEL][nd / EDGE_PARALLEL][d][a]));
      std::printf("\n");
    }
  }
  std::printf("out: %.10f\n", double(result[0]));
  return 0;
}
