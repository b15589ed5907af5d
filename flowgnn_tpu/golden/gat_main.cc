// Golden-oracle host for the reference GAT kernel compiled as plain C++
// (sw_emu tier; pattern of gin_main.cc). Our own host code — kernel sources
// compile from /root/reference at build time. Weight files and layouts
// follow GAT/src/host_load.cc:14-98 (8 separate .bin files; layer-0
// projections are [H][16][1][9] raw-feature blocks packed into the
// [L][H][D][H][D] arrays with the remainder zero).
//
// Usage: gat_golden <dataset_dir> <num_graphs> <weights_dir>

#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "dcl.h"

namespace {

std::vector<float> read_file(const std::string& path, size_t count) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", path.c_str());
    std::exit(2);
  }
  std::vector<float> out(count);
  if (std::fread(out.data(), sizeof(float), count, f) != count) std::exit(2);
  std::fclose(f);
  return out;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 4) return 1;
  const std::string data_dir = argv[1];
  const int num_graphs = std::atoi(argv[2]);
  const std::string w = std::string(argv[3]) + "/gat_ep1_";

  static WT_TYPE s_tgt[1][NUM_LAYERS][NUM_HEADS][EMB_DIM];
  static WT_TYPE s_src[1][NUM_LAYERS][NUM_HEADS][EMB_DIM];
  static WT_TYPE proj[1][NUM_LAYERS][NUM_HEADS][EMB_DIM][NUM_HEADS][EMB_DIM];
  static WT_TYPE skip[1][NUM_LAYERS][NUM_HEADS][EMB_DIM][NUM_HEADS][EMB_DIM];
  static WT_TYPE pred_w[1][NUM_TASK][EMB_DIM];
  static WT_TYPE pred_b[1][NUM_TASK];

  {
    auto v = read_file(w + "scoring_fn_target_layer5.bin",
                       NUM_LAYERS * NUM_HEADS * EMB_DIM);
    for (size_t i = 0; i < v.size(); ++i)
      (&s_tgt[0][0][0][0])[i] = WT_TYPE(v[i]);
    v = read_file(w + "scoring_fn_source_layer5.bin",
                  NUM_LAYERS * NUM_HEADS * EMB_DIM);
    for (size_t i = 0; i < v.size(); ++i)
      (&s_src[0][0][0][0])[i] = WT_TYPE(v[i]);
    v = read_file(w + "pred_weights_layer5.bin", NUM_TASK * EMB_DIM);
    for (size_t i = 0; i < v.size(); ++i)
      (&pred_w[0][0][0])[i] = WT_TYPE(v[i]);
    v = read_file(w + "pred_bias_layer5.bin", NUM_TASK);
    for (size_t i = 0; i < v.size(); ++i) (&pred_b[0][0])[i] = WT_TYPE(v[i]);

    // Layer 0: [H][D][1][9] raw-feature block, rest of the slot stays zero.
    v = read_file(w + "linear_proj_weight_0_layer5.bin",
                  NUM_HEADS * EMB_DIM * ND_FEATURE);
    auto vs = read_file(w + "skip_proj_weight_0_layer5.bin",
                        NUM_HEADS * EMB_DIM * ND_FEATURE);
    for (int ho = 0; ho < NUM_HEADS; ++ho)
      for (int dd = 0; dd < EMB_DIM; ++dd)
        for (int di = 0; di < ND_FEATURE; ++di) {
          proj[0][0][ho][dd][0][di] =
              WT_TYPE(v[(ho * EMB_DIM + dd) * ND_FEATURE + di]);
          skip[0][0][ho][dd][0][di] =
              WT_TYPE(vs[(ho * EMB_DIM + dd) * ND_FEATURE + di]);
        }
    // Layers 1..4: [H][D][H][D].
    const size_t per = NUM_HEADS * EMB_DIM * NUM_HEADS * EMB_DIM;
    v = read_file(w + "linear_proj_weight_1_layer5.bin", (NUM_LAYERS - 1) * per);
    vs = read_file(w + "skip_proj_weight_1_layer5.bin", (NUM_LAYERS - 1) * per);
    for (int l = 1; l < NUM_LAYERS; ++l)
      for (size_t i = 0; i < per; ++i) {
        (&proj[0][l][0][0][0][0])[i] = WT_TYPE(v[(l - 1) * per + i]);
        (&skip[0][l][0][0][0][0])[i] = WT_TYPE(vs[(l - 1) * per + i]);
      }
  }

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
    for (int i = 0; i < n; ++i) {
      int buf[ND_FEATURE];
      if (std::fread(buf, sizeof(int), ND_FEATURE, fi) != ND_FEATURE) return 2;
      for (int k = 0; k < ND_FEATURE; ++k) node_feat[nf0 + i][k] = buf[k];
    }
    std::fclose(fi);
    std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_edge_list.bin",
                  data_dir.c_str(), g);
    fi = std::fopen(path, "rb");
    if (std::fread(&edges[e0], sizeof(edge_t), e, fi) != (size_t)e) return 2;
    std::fclose(fi);
  }

  std::vector<FM_TYPE> flat(num_graphs * NUM_TASK);
  auto* out = reinterpret_cast<FM_TYPE(*)[NUM_TASK]>(flat.data());
  GAT_compute_graphs(num_graphs, n_nodes.data(), n_edges.data(),
                     reload.data(), out, node_feat.data(), edges.data(),
                     s_tgt, s_src, proj, skip, pred_w, pred_b);

  for (int g = 1; g <= num_graphs; ++g)
    for (int t = 0; t < NUM_TASK; ++t)
      std::printf("g%d: %.10f\n", g, double(out[g - 1][t]));
  return 0;
}
