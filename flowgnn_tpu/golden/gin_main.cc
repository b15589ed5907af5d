// Golden-oracle host for the reference GIN kernel compiled as plain C++.
//
// This is this framework's own host program (not a copy of the reference's
// OpenCL host): it loads a reference-layout dataset + the committed GIN
// weight binaries, quantizes to ap_fixed (via the emulation header), calls
// the reference kernel GIN_compute_graphs() directly — the sw_emu execution
// model — and prints per-graph predictions in the HLS_output.txt format
// ("g%d: %.8f", GIN/src/host.cc:213-222). Kernel sources are compiled from
// /root/reference at build time (never copied into this repo).
//
// Usage: gin_golden <dataset_dir> <num_graphs> <weights_dir>

#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "dcl.h"  // reference kernel types + GIN_compute_graphs decl

namespace {

std::vector<float> read_floats(const std::string& path, size_t count) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path.c_str());
    std::exit(2);
  }
  std::vector<float> out(count);
  if (std::fread(out.data(), sizeof(float), count, f) != count) {
    std::fprintf(stderr, "short read %s\n", path.c_str());
    std::exit(2);
  }
  std::fclose(f);
  return out;
}

template <typename T>
void quantize_into(const std::vector<float>& src, T* dst) {
  for (size_t i = 0; i < src.size(); ++i) dst[i] = T(src[i]);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 4) {
    std::fprintf(stderr, "usage: %s <dataset_dir> <num_graphs> <weights_dir>\n",
                 argv[0]);
    return 1;
  }
  const std::string data_dir = argv[1];
  const int num_graphs = std::atoi(argv[2]);
  const std::string wdir = std::string(argv[3]) + "/";

  // --- weights (one weight set) -------------------------------------------
  static WT_TYPE nd_embed[1][ND_FEATURE_TOTAL][EMB_DIM];
  static WT_TYPE ed_embed[1][NUM_LAYERS][ED_FEATURE_PER_LAYER][EMB_DIM];
  static WT_TYPE mlp1_w[1][NUM_LAYERS][MLP_1_OUT][EMB_DIM];
  static WT_TYPE mlp1_b[1][NUM_LAYERS][MLP_1_OUT];
  static WT_TYPE mlp2_w[1][NUM_LAYERS][EMB_DIM][MLP_1_OUT];
  static WT_TYPE mlp2_b[1][NUM_LAYERS][EMB_DIM];
  static WT_TYPE pred_w[1][NUM_TASK][EMB_DIM];
  static WT_TYPE pred_b[1][NUM_TASK];

  quantize_into(read_floats(wdir + "gin_ep1_nd_embed_dim100.bin",
                            ND_FEATURE_TOTAL * EMB_DIM),
                &nd_embed[0][0][0]);
  quantize_into(read_floats(wdir + "gin_ep1_ed_embed_dim100.bin",
                            NUM_LAYERS * ED_FEATURE_PER_LAYER * EMB_DIM),
                &ed_embed[0][0][0][0]);
  quantize_into(read_floats(wdir + "gin_ep1_mlp_1_weights_dim100.bin",
                            NUM_LAYERS * MLP_1_OUT * EMB_DIM),
                &mlp1_w[0][0][0][0]);
  quantize_into(read_floats(wdir + "gin_ep1_mlp_1_bias_dim100.bin",
                            NUM_LAYERS * MLP_1_OUT),
                &mlp1_b[0][0][0]);
  quantize_into(read_floats(wdir + "gin_ep1_mlp_2_weights_dim100.bin",
                            NUM_LAYERS * EMB_DIM * MLP_1_OUT),
                &mlp2_w[0][0][0][0]);
  quantize_into(read_floats(wdir + "gin_ep1_mlp_2_bias_dim100.bin",
                            NUM_LAYERS * EMB_DIM),
                &mlp2_b[0][0][0]);
  quantize_into(read_floats(wdir + "gin_ep1_pred_weights_dim100.bin",
                            NUM_TASK * EMB_DIM),
                &pred_w[0][0][0]);
  quantize_into(read_floats(wdir + "gin_ep1_pred_bias_dim100.bin", NUM_TASK),
                &pred_b[0][0]);

  // --- graphs --------------------------------------------------------------
  std::vector<int> n_nodes(num_graphs), n_edges(num_graphs),
      reload(num_graphs, 0);
  reload[0] = 1;
  std::vector<node_feature_t> node_feat;
  std::vector<edge_t> edges;
  std::vector<edge_attr_t> edge_attr;

  for (int g = 1; g <= num_graphs; ++g) {
    char path[512];
    std::snprintf(path, sizeof(path), "%s/graph_info/g%d_info.txt",
                  data_dir.c_str(), g);
    FILE* f = std::fopen(path, "r");
    if (!f || std::fscanf(f, "%d%d", &n_nodes[g - 1], &n_edges[g - 1]) != 2) {
      std::fprintf(stderr, "bad info file %s\n", path);
      return 2;
    }
    std::fclose(f);
    const int n = n_nodes[g - 1], e = n_edges[g - 1];
    if (n > MAX_NODE || e > MAX_EDGE) {
      std::fprintf(stderr, "graph %d exceeds kernel limits\n", g);
      return 2;
    }

    size_t nf0 = node_feat.size(), e0 = edges.size();
    node_feat.resize(nf0 + n);
    edges.resize(e0 + e);
    edge_attr.resize(e0 + e);
    std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_node_feature.bin",
                  data_dir.c_str(), g);
    f = std::fopen(path, "rb");
    if (std::fread(&node_feat[nf0], sizeof(node_feature_t), n, f) != (size_t)n)
      return 2;
    std::fclose(f);
    std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_edge_list.bin",
                  data_dir.c_str(), g);
    f = std::fopen(path, "rb");
    if (std::fread(&edges[e0], sizeof(edge_t), e, f) != (size_t)e) return 2;
    std::fclose(f);
    std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_edge_attr.bin",
                  data_dir.c_str(), g);
    f = std::fopen(path, "rb");
    if (std::fread(&edge_attr[e0], sizeof(edge_attr_t), e, f) != (size_t)e)
      return 2;
    std::fclose(f);
  }

  std::vector<std::array<FM_TYPE, NUM_TASK>> out(num_graphs);

  GIN_compute_graphs(
      num_graphs, n_nodes.data(), n_edges.data(), reload.data(),
      reinterpret_cast<FM_TYPE(*)[NUM_TASK]>(out.data()), node_feat.data(),
      edges.data(), edge_attr.data(), nd_embed, ed_embed, mlp1_w, mlp1_b,
      mlp2_w, mlp2_b, pred_w, pred_b);

  for (int g = 1; g <= num_graphs; ++g)
    for (int t = 0; t < NUM_TASK; ++t)
      // %.10f resolves the 2^-10 grid exactly (the reference prints %.8f).
      std::printf("g%d: %.10f\n", g, double(out[g - 1][t]));
  return 0;
}
