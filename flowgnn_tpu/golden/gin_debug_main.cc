// Debug harness: run ONE graph through the reference GIN kernel layer by
// layer (replicating GIN_compute_graphs' loop, GIN/src/GIN_compute.cc:44-98,
// with this framework's own driver code) and dump h_node after each
// iteration for per-layer divergence localisation.
//
// Usage: gin_debug <dataset_dir> <graph_index> <weights_dir>

#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "dcl.h"
#include "load_inputs.h"
#include "conv_layer.h"

namespace {
std::vector<float> read_floats(const std::string& path, size_t count) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) std::exit(2);
  std::vector<float> out(count);
  if (std::fread(out.data(), sizeof(float), count, f) != count) std::exit(2);
  std::fclose(f);
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
  const std::string wdir = std::string(argv[3]) + "/";

  static WT_TYPE nd_embed[ND_FEATURE_TOTAL][EMB_DIM];
  static WT_TYPE ed_embed[NUM_LAYERS][ED_FEATURE_PER_LAYER][EMB_DIM];
  static WT_TYPE mlp1_w[NUM_LAYERS][MLP_1_OUT][EMB_DIM];
  static WT_TYPE mlp1_b[NUM_LAYERS][MLP_1_OUT];
  static WT_TYPE mlp2_w[NUM_LAYERS][EMB_DIM][MLP_1_OUT];
  static WT_TYPE mlp2_b[NUM_LAYERS][EMB_DIM];
  static WT_TYPE pred_w[NUM_TASK][EMB_DIM];
  static WT_TYPE pred_b[NUM_TASK];
  quantize_into(read_floats(wdir + "gin_ep1_nd_embed_dim100.bin", 17300),
                &nd_embed[0][0]);
  quantize_into(read_floats(wdir + "gin_ep1_ed_embed_dim100.bin", 6500),
                &ed_embed[0][0][0]);
  quantize_into(read_floats(wdir + "gin_ep1_mlp_1_weights_dim100.bin", 100000),
                &mlp1_w[0][0][0]);
  quantize_into(read_floats(wdir + "gin_ep1_mlp_1_bias_dim100.bin", 1000),
                &mlp1_b[0][0]);
  quantize_into(read_floats(wdir + "gin_ep1_mlp_2_weights_dim100.bin", 100000),
                &mlp2_w[0][0][0]);
  quantize_into(read_floats(wdir + "gin_ep1_mlp_2_bias_dim100.bin", 500),
                &mlp2_b[0][0]);
  quantize_into(read_floats(wdir + "gin_ep1_pred_weights_dim100.bin", 100),
                &pred_w[0][0]);
  quantize_into(read_floats(wdir + "gin_ep1_pred_bias_dim100.bin", 1),
                &pred_b[0]);

  char path[512];
  int n = 0, e = 0;
  std::snprintf(path, sizeof(path), "%s/graph_info/g%d_info.txt",
                data_dir.c_str(), gidx);
  FILE* f = std::fopen(path, "r");
  if (!f || std::fscanf(f, "%d%d", &n, &e) != 2) return 2;
  std::fclose(f);
  std::vector<node_feature_t> node_feat(n);
  std::vector<edge_t> edges(e);
  std::vector<edge_attr_t> edge_attr(e);
  std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_node_feature.bin",
                data_dir.c_str(), gidx);
  f = std::fopen(path, "rb");
  if (std::fread(node_feat.data(), sizeof(node_feature_t), n, f) != (size_t)n)
    return 2;
  std::fclose(f);
  std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_edge_list.bin",
                data_dir.c_str(), gidx);
  f = std::fopen(path, "rb");
  if (std::fread(edges.data(), sizeof(edge_t), e, f) != (size_t)e) return 2;
  std::fclose(f);
  std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_edge_attr.bin",
                data_dir.c_str(), gidx);
  f = std::fopen(path, "rb");
  if (std::fread(edge_attr.data(), sizeof(edge_attr_t), e, f) != (size_t)e)
    return 2;
  std::fclose(f);

  load_weights(mlp1_w, mlp1_b, mlp2_w, mlp2_b, ed_embed, pred_w, pred_b);
  load_graph(edges.data(), edge_attr.data(), n, e);

  FM_TYPE result[NUM_TASK];
  for (int i = 0; i <= NUM_LAYERS; i++) {
    if (i % 2 == 0)
      compute_CONV_layer(i, messages_ping, messages_pong, node_feat.data(),
                         nd_embed, result, n);
    else
      compute_CONV_layer(i, messages_pong, messages_ping, node_feat.data(),
                         nd_embed, result, n);
    // Dump h_node state (input embedding after i=0; layer i-1 output after
    // i>=1) and the freshly produced messages.
    std::printf("=== iter %d h_node\n", i);
    for (int nd = 0; nd < n; ++nd) {
      for (int d = 0; d < EMB_DIM; ++d)
        std::printf("%.10f ", double(h_node[nd][d]));
      std::printf("\n");
    }
    FM_TYPE(*msgs)[ceildiv(MAX_NODE, EDGE_PARALLEL)][EMB_DIM] =
        (i % 2 == 0) ? messages_pong : messages_ping;
    std::printf("=== iter %d messages\n", i);
    for (int nd = 0; nd < n; ++nd) {
      for (int d = 0; d < EMB_DIM; ++d)
        std::printf("%.10f ", double(msgs[nd % EDGE_PARALLEL][nd / EDGE_PARALLEL][d]));
      std::printf("\n");
    }
  }
  std::printf("=== out %.10f\n", double(result[0]));
  return 0;
}
