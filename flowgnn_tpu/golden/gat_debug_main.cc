// Debug harness: run ONE graph through the reference GAT kernel layer by
// layer (replicating GAT_compute_graphs' loop with this framework's own
// driver code) and dump h_node / scores / prev after the input stage and
// every conv layer, for per-layer divergence localisation.
//
// Usage: gat_debug <dataset_dir> <graph_index> <weights_dir>

#include <cstdio>
#include <cstdlib>
#include <string>
#include <vector>

#include "dcl.h"
#include "load_inputs.h"
#include "conv_layer.h"

namespace {
std::vector<float> read_file(const std::string& path, size_t count) {
  FILE* f = std::fopen(path.c_str(), "rb");
  if (!f) std::exit(2);
  std::vector<float> out(count);
  if (std::fread(out.data(), sizeof(float), count, f) != count) std::exit(2);
  std::fclose(f);
  return out;
}

void dump_state(int nd_count, bool pong) {
  for (int nd = 0; nd < nd_count; ++nd) {
    std::printf("h[%d]:", nd);
    for (int d = 0; d < 4; ++d)
      for (int hh = 0; hh < NUM_HEADS; ++hh)
        std::printf(" %.6f",
                    double((pong ? h_node_pong : h_node_ping)
                               [nd % EDGE_PARALLEL][nd / EDGE_PARALLEL][d][hh]));
    std::printf("\n");
    std::printf("s[%d]:", nd);
    for (int hh = 0; hh < NUM_HEADS; ++hh)
      std::printf(" %.6f / %.6f",
                  double((pong ? scores_source_pong : scores_source_ping)[0][nd][hh]),
                  double((pong ? scores_target_pong : scores_target_ping)
                             [nd % EDGE_PARALLEL][nd / EDGE_PARALLEL][hh]));
    std::printf("\n");
    std::printf("p[%d]:", nd);
    for (int d = 0; d < 4; ++d)
      for (int hh = 0; hh < NUM_HEADS; ++hh)
        std::printf(" %.6f",
                    double((pong ? out_nodes_features_skip_concat_bias_pong
                                 : out_nodes_features_skip_concat_bias_ping)[nd][d][hh]));
    std::printf("\n");
  }
}

}  // namespace

int main(int argc, char** argv) {
  if (argc != 4) return 1;
  const std::string data_dir = argv[1];
  const int gidx = std::atoi(argv[2]);
  const std::string w = std::string(argv[3]) + "/gat_ep1_";

  {
    auto v = read_file(w + "scoring_fn_target_layer5.bin",
                       NUM_LAYERS * NUM_HEADS * EMB_DIM);
    for (size_t i = 0; i < v.size(); ++i)
      (&scoring_fn_target[0][0][0])[i] = WT_TYPE(v[i]);
    v = read_file(w + "scoring_fn_source_layer5.bin",
                  NUM_LAYERS * NUM_HEADS * EMB_DIM);
    for (size_t i = 0; i < v.size(); ++i)
      (&scoring_fn_source[0][0][0])[i] = WT_TYPE(v[i]);
    v = read_file(w + "pred_weights_layer5.bin", NUM_TASK * EMB_DIM);
    for (size_t i = 0; i < v.size(); ++i)
      (&graph_pred_weights[0][0])[i] = WT_TYPE(v[i]);
    v = read_file(w + "pred_bias_layer5.bin", NUM_TASK);
    for (size_t i = 0; i < v.size(); ++i) (&graph_pred_bias[0])[i] = WT_TYPE(v[i]);
    v = read_file(w + "linear_proj_weight_0_layer5.bin",
                  NUM_HEADS * EMB_DIM * ND_FEATURE);
    auto vs = read_file(w + "skip_proj_weight_0_layer5.bin",
                        NUM_HEADS * EMB_DIM * ND_FEATURE);
    for (int ho = 0; ho < NUM_HEADS; ++ho)
      for (int dd = 0; dd < EMB_DIM; ++dd)
        for (int di = 0; di < ND_FEATURE; ++di) {
          linear_proj_weights[0][ho][dd][0][di] =
              WT_TYPE(v[(ho * EMB_DIM + dd) * ND_FEATURE + di]);
          skip_proj_weights[0][ho][dd][0][di] =
              WT_TYPE(vs[(ho * EMB_DIM + dd) * ND_FEATURE + di]);
        }
    const size_t per = NUM_HEADS * EMB_DIM * NUM_HEADS * EMB_DIM;
    v = read_file(w + "linear_proj_weight_1_layer5.bin", (NUM_LAYERS - 1) * per);
    vs = read_file(w + "skip_proj_weight_1_layer5.bin", (NUM_LAYERS - 1) * per);
    for (int l = 1; l < NUM_LAYERS; ++l)
      for (size_t i = 0; i < per; ++i) {
        (&linear_proj_weights[l][0][0][0][0])[i] = WT_TYPE(v[(l - 1) * per + i]);
        (&skip_proj_weights[l][0][0][0][0])[i] = WT_TYPE(vs[(l - 1) * per + i]);
      }
  }

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
  for (int i = 0; i < n; ++i) {
    int buf[ND_FEATURE];
    if (std::fread(buf, sizeof(int), ND_FEATURE, fi) != ND_FEATURE) return 2;
    for (int k = 0; k < ND_FEATURE; ++k) node_feat[i][k] = buf[k];
  }
  std::fclose(fi);
  std::snprintf(path, sizeof(path), "%s/graph_bin/g%d_edge_list.bin",
                data_dir.c_str(), gidx);
  fi = std::fopen(path, "rb");
  if (std::fread(edges.data(), sizeof(edge_t), e, fi) != (size_t)e) return 2;
  std::fclose(fi);

  load_graph(edges.data(), n, e);
  load_input_node_embeddings(node_feat.data(), n);
  std::printf("== after input\n");
  dump_state(n < 2 ? n : 2, false);

  FM_TYPE result[NUM_TASK];
  for (int i = 0; i < NUM_LAYERS; ++i) {
    if (i % 2 == 0)
      compute_CONV_layer(i, h_node_ping, h_node_pong, scores_source_ping,
                         scores_source_pong, scores_target_ping,
                         scores_target_pong,
                         out_nodes_features_skip_concat_bias_ping,
                         out_nodes_features_skip_concat_bias_pong, result, n);
    else
      compute_CONV_layer(i, h_node_pong, h_node_ping, scores_source_pong,
                         scores_source_ping, scores_target_pong,
                         scores_target_ping,
                         out_nodes_features_skip_concat_bias_pong,
                         out_nodes_features_skip_concat_bias_ping, result, n);
    std::printf("== after layer %d\n", i);
    dump_state(n < 2 ? n : 2, i % 2 == 0);
  }
  std::printf("out: %.10f\n", double(result[0]));
  return 0;
}
