// Golden-oracle host for the reference DGN kernel compiled as plain C++
// (sw_emu tier; pattern of gin_main.cc). Our own host code — kernel sources
// compile from /root/reference at build time. Weight layout is the
// fseek-offset map of DGN/src/host_load.cc:11-151 into
// dgn_ep1_noBN_dim100.weights.all.bin; the 9 atom-embedding tables (vocab
// {119,4,12,12,10,6,6,2,2}) each occupy a zero-padded [119][100] slot of
// the kernel's [9][119][100] argument. Eigenvectors come from the
// torch-printed eig/g%d.txt files (host_load.cc:154-216 format).
//
// Usage: dgn_golden <dataset_dir> <num_graphs> <weights_dir>

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
      std::string(argv[3]) + "/dgn_ep1_noBN_dim100.weights.all.bin";

  static WT_TYPE embeds[1][9][119][100];
  static WT_TYPE post_w[1][4][100][200];
  static WT_TYPE post_b[1][4][100];
  static WT_TYPE mlp0_w[1][50][100];
  static WT_TYPE mlp0_b[1][50];
  static WT_TYPE mlp1_w[1][25][50];
  static WT_TYPE mlp1_b[1][25];
  static WT_TYPE mlp2_w[1][1][25];
  static WT_TYPE mlp2_b[1][1];

  FILE* f = std::fopen(wpath.c_str(), "rb");
  if (!f) {
    std::fprintf(stderr, "cannot open %s\n", wpath.c_str());
    return 2;
  }
  const long emb_off[9] = {0, 11900, 12300, 13500, 14700,
                           15700, 16300, 16900, 17100};
  const int emb_vocab[9] = {119, 4, 12, 12, 10, 6, 6, 2, 2};
  for (int k = 0; k < 9; ++k)
    quantize_into(read_at(f, emb_off[k], emb_vocab[k] * 100),
                  &embeds[0][k][0][0]);
  const long pw_off[4] = {17300, 37400, 57500, 77600};
  const long pb_off[4] = {37300, 57400, 77500, 97600};
  for (int l = 0; l < 4; ++l) {
    quantize_into(read_at(f, pw_off[l], 20000), &post_w[0][l][0][0]);
    quantize_into(read_at(f, pb_off[l], 100), &post_b[0][l][0]);
  }
  quantize_into(read_at(f, 97700, 5000), &mlp0_w[0][0][0]);
  quantize_into(read_at(f, 102700, 50), &mlp0_b[0][0]);
  quantize_into(read_at(f, 102750, 1250), &mlp1_w[0][0][0]);
  quantize_into(read_at(f, 104000, 25), &mlp1_b[0][0]);
  quantize_into(read_at(f, 104025, 25), &mlp2_w[0][0][0]);
  quantize_into(read_at(f, 104050, 1), &mlp2_b[0][0]);
  std::fclose(f);

  std::vector<int> n_nodes(num_graphs), n_edges(num_graphs),
      reload(num_graphs, 0);
  reload[0] = 1;
  std::vector<node_feature_t> node_feat;
  std::vector<node_eigen_t> node_eig;
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
    node_eig.resize(nf0 + n);
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
    // eig/g%d.txt — torch print format (DGN/src/host_load.cc:201-215).
    std::snprintf(path, sizeof(path), "%s/eig/g%d.txt", data_dir.c_str(), g);
    fi = std::fopen(path, "r");
    if (!fi) {
      std::fprintf(stderr, "cannot open %s\n", path);
      return 2;
    }
    float ev[4];
    std::fscanf(fi, "tensor([[%e, %e,%e,%e],\n", &ev[0], &ev[1], &ev[2],
                &ev[3]);
    for (int i = 0; i < 4; ++i) node_eig[nf0][i] = WT_TYPE(ev[i]);
    for (int nd = 1; nd < n - 1; ++nd) {
      std::fscanf(fi, "[%e, %e,%e,%e],\n", &ev[0], &ev[1], &ev[2], &ev[3]);
      for (int i = 0; i < 4; ++i) node_eig[nf0 + nd][i] = WT_TYPE(ev[i]);
    }
    std::fscanf(fi, "[%e, %e,%e,%e]])", &ev[0], &ev[1], &ev[2], &ev[3]);
    for (int i = 0; i < 4; ++i) node_eig[nf0 + n - 1][i] = WT_TYPE(ev[i]);
    std::fclose(fi);
  }

  std::vector<FM_TYPE> out(num_graphs * NUM_TASK);
  DGN_compute_graphs(num_graphs, n_nodes.data(), n_edges.data(),
                     reload.data(), out.data(), node_feat.data(),
                     node_eig.data(), edges.data(), embeds, post_w, post_b,
                     mlp0_w, mlp0_b, mlp1_w, mlp1_b, mlp2_w, mlp2_b);

  for (int g = 1; g <= num_graphs; ++g)
    for (int t = 0; t < NUM_TASK; ++t)
      std::printf("g%d: %.13f\n", g, double(out[(g - 1) * NUM_TASK + t]));
  return 0;
}
