// Golden-oracle host for the reference PNA kernel compiled as plain C++
// (sw_emu tier; pattern of gin_main.cc). Our own host code — kernel sources
// compile from /root/reference at build time. Weight layout is the
// fseek-offset map of PNA/src/host_load.cc:25-70 into
// pna_ep1_noBN_dim80.weights.all.bin (also in params/loaders.py).
//
// Usage: pna_golden <dataset_dir> <num_graphs> <weights_dir>

#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "dcl.h"

namespace {

std::vector<float> read_at(FILE* f, long offset_floats, size_t count) {
  std::fseek(f, offset_floats * sizeof(float), SEEK_SET);
  std::vector<float> out(count);
  if (std::fread(out.data(), sizeof(float), count, f) != count) {
    std::fprintf(stderr, "short read at %ld\n", offset_floats);
    std::exit(2);
  }
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
  const int num_graphs = std::atoi(argv[2]);
  const std::string wpath =
      std::string(argv[3]) + "/pna_ep1_noBN_dim80.weights.all.bin";

  static WT_TYPE nd_embed[1][ND_FEATURE_TOTAL][EMB_DIM];
  static WT_TYPE conv_w[1][NUM_LAYERS][EMB_DIM][NUM_SCALERS][NUM_AGGRS][EMB_DIM];
  static WT_TYPE conv_b[1][NUM_LAYERS][EMB_DIM];
  static WT_TYPE mlp1_w[1][GRAPH_MLP_1_OUT][EMB_DIM];
  static WT_TYPE mlp1_b[1][GRAPH_MLP_1_OUT];
  static WT_TYPE mlp2_w[1][GRAPH_MLP_2_OUT][GRAPH_MLP_1_OUT];
  static WT_TYPE mlp2_b[1][GRAPH_MLP_2_OUT];
  static WT_TYPE mlp3_w[1][NUM_TASK][GRAPH_MLP_2_OUT];
  static WT_TYPE mlp3_b[1][NUM_TASK];
  static WT_TYPE avg_deg[1];

  FILE* f = std::fopen(wpath.c_str(), "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", wpath.c_str());
    return 2;
  }
  quantize_into(read_at(f, 0, ND_FEATURE_TOTAL * EMB_DIM),
                &nd_embed[0][0][0]);
  // Per-layer tower blocks + biases (strided map, host_load.cc:28-51).
  const long w_off[NUM_LAYERS] = {13840, 90720, 167600, 244480};
  const long b_off[NUM_LAYERS] = {90640, 167520, 244400, 321280};
  for (int l = 0; l < NUM_LAYERS; ++l) {
    quantize_into(read_at(f, w_off[l], 76800), &conv_w[0][l][0][0][0][0]);
    quantize_into(read_at(f, b_off[l], EMB_DIM), &conv_b[0][l][0]);
  }
  quantize_into(read_at(f, 321360, 3200), &mlp1_w[0][0][0]);
  quantize_into(read_at(f, 324560, 40), &mlp1_b[0][0]);
  quantize_into(read_at(f, 324600, 800), &mlp2_w[0][0][0]);
  quantize_into(read_at(f, 325400, 20), &mlp2_b[0][0]);
  quantize_into(read_at(f, 325420, 20), &mlp3_w[0][0][0]);
  quantize_into(read_at(f, 325440, 1), &mlp3_b[0][0]);
  std::fclose(f);
  avg_deg[0] = WT_TYPE(6.885701656341553);  // PNA/src/host_load.cc:127

  std::vector<int> n_nodes(num_graphs), n_edges(num_graphs),
      reload(num_graphs, 0);
  reload[0] = 1;
  std::vector<node_feature_t> node_feat;
  std::vector<edge_t> edges;
  for (int g = 1; g <= num_graphs; ++g) {
    char path[512];
    std::snprintf(path, sizeof(path), "%s/graph_info/g%d_info.txt",
                  data_dir.c_str(), g);
    FILE* fi = std::fopen(path, "r");
    if (!fi || std::fscanf(fi, "%d%d", &n_nodes[g - 1], &n_edges[g - 1]) != 2)
      return 2;
    std::fclose(fi);
    const int n = n_nodes[g - 1], e = n_edges[g - 1];
    size_t nf0 = node_feat.size(), e0 = edges.size();
    node_feat.resize(nf0 + n);
    edges.resize(e0 + e);
    std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_node_feature.bin",
                  data_dir.c_str(), g);
    fi = std::fopen(path, "rb");
    if (std::fread(&node_feat[nf0], sizeof(node_feature_t), n, fi) !=
        (size_t)n)
      return 2;
    std::fclose(fi);
    std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_edge_list.bin",
                  data_dir.c_str(), g);
    fi = std::fopen(path, "rb");
    if (std::fread(&edges[e0], sizeof(edge_t), e, fi) != (size_t)e) return 2;
    std::fclose(fi);
  }

  std::vector<FM_TYPE> flat(num_graphs * NUM_TASK);
  auto* out = reinterpret_cast<FM_TYPE(*)[NUM_TASK]>(flat.data());
  PNA_compute_graphs(num_graphs, n_nodes.data(), n_edges.data(),
                     reload.data(), out, node_feat.data(), edges.data(),
                     nd_embed, conv_w, conv_b, mlp1_w, mlp1_b, mlp2_w,
                     mlp2_b, mlp3_w, mlp3_b, avg_deg);

  for (int g = 1; g <= num_graphs; ++g)
    for (int t = 0; t < NUM_TASK; ++t)
      std::printf("g%d: %.10f\n", g, double(out[g - 1][t]));
  return 0;
}
