// Golden-oracle host for the reference GCN kernel compiled as plain C++
// (sw_emu tier; see gin_main.cc for the pattern). Our own host code — the
// kernel sources compile from /root/reference at build time. The GCN weight
// layout is the fseek-offset map of GCN/src/host_load.cc:31-190, re-read
// here with the layouts documented in params/loaders.py.
//
// Usage: gcn_golden <dataset_dir> <num_graphs> <weights_dir>

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

// The reference host regroups the per-layer edge tables against the
// concatenated bond vocab (GCN/src/host_load.cc:175-190); layout is already
// [13][EMB_DIM] contiguous per layer, so a direct copy suffices.

}  // namespace

int main(int argc, char** argv) {
  if (argc != 4) return 1;
  const std::string data_dir = argv[1];
  const int num_graphs = std::atoi(argv[2]);
  const std::string wpath =
      std::string(argv[3]) + "/gcn_ep1_dim100.weights.all.bin";

  static WT_TYPE nd_embed[1][ND_FEATURE_TOTAL][EMB_DIM];
  static WT_TYPE ed_embed[1][NUM_LAYERS][ED_FEATURE_PER_LAYER][EMB_DIM];
  static WT_TYPE conv_w[1][NUM_LAYERS][100][100];
  static WT_TYPE conv_b[1][NUM_LAYERS][100];
  static WT_TYPE root_emb[1][NUM_LAYERS][100];
  static WT_TYPE bn_w[1][NUM_LAYERS][100];
  static WT_TYPE bn_b[1][NUM_LAYERS][100];
  static WT_TYPE bn_m[1][NUM_LAYERS][100];
  static WT_TYPE bn_v[1][NUM_LAYERS][100];
  static WT_TYPE pred_w[1][NUM_TASK][EMB_DIM];
  static WT_TYPE pred_b[1][NUM_TASK];

  FILE* f = std::fopen(wpath.c_str(), "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", wpath.c_str());
    return 2;
  }
  quantize_into(read_at(f, 0, 17300), &nd_embed[0][0][0]);
  for (int l = 0; l < NUM_LAYERS; ++l) {
    const long base = 17300 + 11500L * l;
    quantize_into(read_at(f, base, 10000), &conv_w[0][l][0][0]);
    quantize_into(read_at(f, base + 10000, 100), &conv_b[0][l][0]);
    quantize_into(read_at(f, base + 10100, 100), &root_emb[0][l][0]);
    quantize_into(read_at(f, base + 10200, 1300), &ed_embed[0][l][0][0]);
    const long bn = 74800 + 401L * l;
    quantize_into(read_at(f, bn, 100), &bn_w[0][l][0]);
    quantize_into(read_at(f, bn + 100, 100), &bn_b[0][l][0]);
    quantize_into(read_at(f, bn + 200, 100), &bn_m[0][l][0]);
    quantize_into(read_at(f, bn + 300, 100), &bn_v[0][l][0]);
  }
  quantize_into(read_at(f, 76805, 100), &pred_w[0][0][0]);
  quantize_into(read_at(f, 76905, 1), &pred_b[0][0]);
  std::fclose(f);

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
    FILE* fi = std::fopen(path, "r");
    if (!fi || std::fscanf(fi, "%d%d", &n_nodes[g - 1], &n_edges[g - 1]) != 2)
      return 2;
    std::fclose(fi);
    const int n = n_nodes[g - 1], e = n_edges[g - 1];
    size_t nf0 = node_feat.size(), e0 = edges.size();
    node_feat.resize(nf0 + n);
    edges.resize(e0 + e);
    edge_attr.resize(e0 + e);
    std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_node_feature.bin",
                  data_dir.c_str(), g);
    fi = std::fopen(path, "rb");
    if (std::fread(&node_feat[nf0], sizeof(node_feature_t), n, fi) != (size_t)n)
      return 2;
    std::fclose(fi);
    std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_edge_list.bin",
                  data_dir.c_str(), g);
    fi = std::fopen(path, "rb");
    if (std::fread(&edges[e0], sizeof(edge_t), e, fi) != (size_t)e) return 2;
    std::fclose(fi);
    std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_edge_attr.bin",
                  data_dir.c_str(), g);
    fi = std::fopen(path, "rb");
    if (std::fread(&edge_attr[e0], sizeof(edge_attr_t), e, fi) != (size_t)e)
      return 2;
    std::fclose(fi);
  }

  std::vector<FM_TYPE> out(num_graphs * NUM_TASK);
  GCN_compute_graphs(
      num_graphs, n_nodes.data(), n_edges.data(), reload.data(), out.data(),
      node_feat.data(), edges.data(), edge_attr.data(), nd_embed, ed_embed,
      conv_w, conv_b, root_emb, bn_w, bn_b, bn_m, bn_v, pred_w, pred_b);

  for (int g = 1; g <= num_graphs; ++g)
    for (int t = 0; t < NUM_TASK; ++t)
      std::printf("g%d: %.10f\n", g, double(out[(g - 1) * NUM_TASK + t]));
  return 0;
}
