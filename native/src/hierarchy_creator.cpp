// Offline merge-hierarchy creator (native tool).
//
// Standalone C++ counterpart of hierarchy/build.py for out-of-JAX offline
// builds on very large point clouds — the role the reference fills with its
// GaussianHierarchyCreator executable. Same algorithm as the JAX builder
// (which is the framework's primary path): kd-median split along the
// longest AABB axis, bottom-up covariance-preserving pairwise merge
// (weights = opacity * ellipse surface), analytic symmetric 3x3
// eigendecomposition, 24-candidate proper-signed-permutation rotation
// alignment, `.dhier` output byte-compatible with data/dhier.py.
//
//   hierarchy_creator <input .ply (3DGS layout)> <output .dhier> [sh_degree]

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <iostream>
#include <numeric>
#include <sstream>
#include <string>
#include <vector>

namespace {

struct V3 {
  float x = 0, y = 0, z = 0;
  float& operator[](int i) { return (&x)[i]; }
  float operator[](int i) const { return (&x)[i]; }
};
static V3 operator+(V3 a, V3 b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
static V3 operator-(V3 a, V3 b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
static V3 operator*(float s, V3 a) { return {s * a.x, s * a.y, s * a.z}; }
static V3 cross(V3 a, V3 b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
static float dot(V3 a, V3 b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
static float norm(V3 a) { return std::sqrt(dot(a, a)); }

struct M3 {
  float m[3][3] = {};
  static M3 identity() {
    M3 r;
    r.m[0][0] = r.m[1][1] = r.m[2][2] = 1;
    return r;
  }
};
static M3 matmul(const M3& a, const M3& b) {
  M3 r;
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      for (int k = 0; k < 3; k++) r.m[i][j] += a.m[i][k] * b.m[k][j];
  return r;
}

struct Q4 {
  float w = 1, x = 0, y = 0, z = 0;
};

static M3 quat_to_mat(Q4 q) {
  float n = std::sqrt(q.w * q.w + q.x * q.x + q.y * q.y + q.z * q.z);
  if (n < 1e-12f) n = 1;
  float w = q.w / n, x = q.x / n, y = q.y / n, z = q.z / n;
  M3 R;
  R.m[0][0] = 1 - 2 * (y * y + z * z);
  R.m[0][1] = 2 * (x * y - w * z);
  R.m[0][2] = 2 * (x * z + w * y);
  R.m[1][0] = 2 * (x * y + w * z);
  R.m[1][1] = 1 - 2 * (x * x + z * z);
  R.m[1][2] = 2 * (y * z - w * x);
  R.m[2][0] = 2 * (x * z - w * y);
  R.m[2][1] = 2 * (y * z + w * x);
  R.m[2][2] = 1 - 2 * (x * x + y * y);
  return R;
}

static Q4 mat_to_quat(const M3& R) {
  // Shepperd-style branch on the largest diagonal component
  float tr = R.m[0][0] + R.m[1][1] + R.m[2][2];
  Q4 q;
  if (tr > 0) {
    float s = std::sqrt(tr + 1.0f) * 2;
    q.w = 0.25f * s;
    q.x = (R.m[2][1] - R.m[1][2]) / s;
    q.y = (R.m[0][2] - R.m[2][0]) / s;
    q.z = (R.m[1][0] - R.m[0][1]) / s;
  } else if (R.m[0][0] > R.m[1][1] && R.m[0][0] > R.m[2][2]) {
    float s = std::sqrt(1.0f + R.m[0][0] - R.m[1][1] - R.m[2][2]) * 2;
    q.w = (R.m[2][1] - R.m[1][2]) / s;
    q.x = 0.25f * s;
    q.y = (R.m[0][1] + R.m[1][0]) / s;
    q.z = (R.m[0][2] + R.m[2][0]) / s;
  } else if (R.m[1][1] > R.m[2][2]) {
    float s = std::sqrt(1.0f + R.m[1][1] - R.m[0][0] - R.m[2][2]) * 2;
    q.w = (R.m[0][2] - R.m[2][0]) / s;
    q.x = (R.m[0][1] + R.m[1][0]) / s;
    q.y = 0.25f * s;
    q.z = (R.m[1][2] + R.m[2][1]) / s;
  } else {
    float s = std::sqrt(1.0f + R.m[2][2] - R.m[0][0] - R.m[1][1]) * 2;
    q.w = (R.m[1][0] - R.m[0][1]) / s;
    q.x = (R.m[0][2] + R.m[2][0]) / s;
    q.y = (R.m[1][2] + R.m[2][1]) / s;
    q.z = 0.25f * s;
  }
  if (q.w < 0) {
    q.w = -q.w; q.x = -q.x; q.y = -q.y; q.z = -q.z;
  }
  return q;
}

// analytic symmetric 3x3 eigendecomposition (ascending eigenvalues,
// eigenvectors as matrix columns)
static void eigh3(const double A[3][3], double evals[3], double evecs[3][3]) {
  const double p1 =
      A[0][1] * A[0][1] + A[0][2] * A[0][2] + A[1][2] * A[1][2];
  if (p1 < 1e-30) {
    int order[3] = {0, 1, 2};
    double d[3] = {A[0][0], A[1][1], A[2][2]};
    std::sort(order, order + 3, [&](int a, int b) { return d[a] < d[b]; });
    for (int i = 0; i < 3; i++) {
      evals[i] = d[order[i]];
      for (int r = 0; r < 3; r++) evecs[r][i] = (r == order[i]) ? 1.0 : 0.0;
    }
    return;
  }
  const double q = (A[0][0] + A[1][1] + A[2][2]) / 3.0;
  double p2 = (A[0][0] - q) * (A[0][0] - q) + (A[1][1] - q) * (A[1][1] - q) +
              (A[2][2] - q) * (A[2][2] - q) + 2.0 * p1;
  const double p = std::sqrt(p2 / 6.0);
  double B[3][3];
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      B[i][j] = (A[i][j] - (i == j ? q : 0.0)) / p;
  double detB =
      B[0][0] * (B[1][1] * B[2][2] - B[1][2] * B[2][1]) -
      B[0][1] * (B[1][0] * B[2][2] - B[1][2] * B[2][0]) +
      B[0][2] * (B[1][0] * B[2][1] - B[1][1] * B[2][0]);
  double r = detB / 2.0;
  r = std::max(-1.0, std::min(1.0, r));
  const double phi = std::acos(r) / 3.0;
  const double e0 = q + 2.0 * p * std::cos(phi);                // largest
  const double e2 = q + 2.0 * p * std::cos(phi + 2.0 * M_PI / 3.0);  // smallest
  const double e1 = 3.0 * q - e0 - e2;
  evals[0] = e2;
  evals[1] = e1;
  evals[2] = e0;

  // eigenvector for lambda: null space of (A - lambda I) via the largest
  // cross product of its rows
  for (int k = 0; k < 3; k++) {
    double M[3][3];
    for (int i = 0; i < 3; i++)
      for (int j = 0; j < 3; j++)
        M[i][j] = A[i][j] - (i == j ? evals[k] : 0.0);
    double best[3] = {1, 0, 0};
    double bestn = -1;
    int rows[3][2] = {{0, 1}, {0, 2}, {1, 2}};
    for (auto& rr : rows) {
      double c[3] = {
          M[rr[0]][1] * M[rr[1]][2] - M[rr[0]][2] * M[rr[1]][1],
          M[rr[0]][2] * M[rr[1]][0] - M[rr[0]][0] * M[rr[1]][2],
          M[rr[0]][0] * M[rr[1]][1] - M[rr[0]][1] * M[rr[1]][0]};
      double n = c[0] * c[0] + c[1] * c[1] + c[2] * c[2];
      if (n > bestn) {
        bestn = n;
        std::copy(c, c + 3, best);
      }
    }
    double n = std::sqrt(std::max(bestn, 1e-60));
    for (int i = 0; i < 3; i++) evecs[i][k] = best[i] / n;
  }
  // orthogonalize the middle vector and rebuild the last as a cross product
  {
    double d01 = 0;
    for (int i = 0; i < 3; i++) d01 += evecs[i][0] * evecs[i][1];
    double n1 = 0;
    for (int i = 0; i < 3; i++) {
      evecs[i][1] -= d01 * evecs[i][0];
      n1 += evecs[i][1] * evecs[i][1];
    }
    n1 = std::sqrt(std::max(n1, 1e-60));
    for (int i = 0; i < 3; i++) evecs[i][1] /= n1;
    evecs[0][2] = evecs[1][0] * evecs[2][1] - evecs[2][0] * evecs[1][1];
    evecs[1][2] = evecs[2][0] * evecs[0][1] - evecs[0][0] * evecs[2][1];
    evecs[2][2] = evecs[0][0] * evecs[1][1] - evecs[1][0] * evecs[0][1];
  }
}

struct Gaussian {
  V3 pos;
  Q4 rot;
  V3 scale;  // linear
  float opacity = 0;
  std::vector<float> sh;  // K*3, channel-minor [k][rgb]
};

struct Node {
  int depth = 0, parent = -1, child_count = 0, first_child = -1,
      next_sibling = 0, aux = 0;
};

float ellipse_surface(const V3& s) {
  return s.x * s.y + s.x * s.z + s.y * s.z;
}

static M3 cov_from(const Gaussian& g) {
  M3 R = quat_to_mat(g.rot);
  M3 RS = R;
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) RS.m[i][j] = R.m[i][j] * g.scale[j];
  M3 C;
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      for (int k = 0; k < 3; k++) C.m[i][j] += RS.m[i][k] * RS.m[j][k];
  return C;
}

Gaussian merge_pair(const Gaussian& a, const Gaussian& b) {
  const int K = a.sh.size();
  float wa = a.opacity * ellipse_surface(a.scale);
  float wb = b.opacity * ellipse_surface(b.scale);
  float ws = wa + wb;
  if (ws <= 0) ws = 1;
  float na = wa / ws, nb = wb / ws;

  Gaussian out;
  out.pos = na * a.pos + nb * b.pos;
  out.sh.resize(K);
  for (int i = 0; i < K; i++) out.sh[i] = na * a.sh[i] + nb * b.sh[i];

  M3 Ca = cov_from(a), Cb = cov_from(b);
  V3 da = a.pos - out.pos, db = b.pos - out.pos;
  double A[3][3];
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++)
      A[i][j] = na * (Ca.m[i][j] + double(da[i]) * da[j]) +
                nb * (Cb.m[i][j] + double(db[i]) * db[j]) +
                (i == j ? 1e-12 : 0.0);
  double evals[3], evecs[3][3];
  eigh3(A, evals, evecs);
  // handedness fix
  double cx = evecs[1][0] * evecs[2][1] - evecs[2][0] * evecs[1][1];
  double cy = evecs[2][0] * evecs[0][1] - evecs[0][0] * evecs[2][1];
  double cz = evecs[0][0] * evecs[1][1] - evecs[1][0] * evecs[0][1];
  double d = cx * evecs[0][2] + cy * evecs[1][2] + cz * evecs[2][2];
  if (d < 0)
    for (int i = 0; i < 3; i++) evecs[i][2] = -evecs[i][2];

  for (int i = 0; i < 3; i++)
    out.scale[i] = std::sqrt(std::max(std::abs(evals[i]), 1e-24));
  M3 R;
  for (int i = 0; i < 3; i++)
    for (int j = 0; j < 3; j++) R.m[i][j] = float(evecs[i][j]);
  out.rot = mat_to_quat(R);
  // opacity = ws / surface must not exceed 1: the reference inflates the
  // covariance until it does (ClusterMerger.cpp:101-116); surface is
  // quadratic in scale, so sqrt(ws/surface) lands opacity exactly at 1
  float surf = std::max(ellipse_surface(out.scale), 1e-20f);
  if (ws > surf) {
    float inflate = std::sqrt(ws / surf);
    for (int i = 0; i < 3; i++) out.scale[i] *= inflate;
    surf = std::max(ellipse_surface(out.scale), 1e-20f);
  }
  out.opacity = ws / surf;
  return out;
}

void align_to_parent(const Gaussian& parent, Gaussian& child) {
  static const int perms[6][3] = {{0, 1, 2}, {0, 2, 1}, {1, 0, 2},
                                  {1, 2, 0}, {2, 0, 1}, {2, 1, 0}};
  M3 Rp = quat_to_mat(parent.rot);
  M3 Rc = quat_to_mat(child.rot);
  float best = -1e30f;
  M3 bestR;
  int bestp[3] = {0, 1, 2};
  for (auto& p : perms) {
    for (int s = 0; s < 8; s++) {
      float sg[3] = {s & 1 ? -1.f : 1.f, s & 2 ? -1.f : 1.f,
                     s & 4 ? -1.f : 1.f};
      M3 T;
      for (int c = 0; c < 3; c++)
        for (int r = 0; r < 3; r++) T.m[r][c] = sg[c] * Rc.m[r][p[c]];
      // proper rotation only
      V3 c0{T.m[0][0], T.m[1][0], T.m[2][0]};
      V3 c1{T.m[0][1], T.m[1][1], T.m[2][1]};
      V3 c2{T.m[0][2], T.m[1][2], T.m[2][2]};
      if (dot(cross(c0, c1), c2) < 0) continue;
      float score = 0;
      for (int i = 0; i < 3; i++)
        for (int j = 0; j < 3; j++) score += T.m[i][j] * Rp.m[i][j];
      if (score > best) {
        best = score;
        bestR = T;
        std::copy(p, p + 3, bestp);
      }
    }
  }
  V3 ns{child.scale[bestp[0]], child.scale[bestp[1]], child.scale[bestp[2]]};
  child.scale = ns;
  child.rot = mat_to_quat(bestR);
}

struct Tree {
  std::vector<Gaussian> g;  // one per node
  std::vector<Node> nodes;
  std::vector<int> leaf_point;
};

int build_rec(Tree& t, std::vector<Gaussian>& leaves, std::vector<int>& idx,
              int start, int num, int depth) {
  int me = t.nodes.size();
  t.nodes.emplace_back();
  t.g.emplace_back();
  t.leaf_point.push_back(-1);
  t.nodes[me].depth = depth;
  if (num == 1) {
    t.g[me] = leaves[idx[start]];
    t.leaf_point[me] = idx[start];
    return me;
  }
  // longest-axis AABB of (mean +- 3 max_scale)
  V3 lo{1e30f, 1e30f, 1e30f}, hi{-1e30f, -1e30f, -1e30f};
  for (int i = 0; i < num; i++) {
    const Gaussian& gg = leaves[idx[start + i]];
    float r =
        3.0f * std::max(gg.scale.x, std::max(gg.scale.y, gg.scale.z));
    for (int a = 0; a < 3; a++) {
      lo[a] = std::min(lo[a], gg.pos[a] - r);
      hi[a] = std::max(hi[a], gg.pos[a] + r);
    }
  }
  int axis = 0;
  float bestd = -1;
  for (int a = 0; a < 3; a++)
    if (hi[a] - lo[a] > bestd) {
      bestd = hi[a] - lo[a];
      axis = a;
    }
  int left = num / 2;
  std::nth_element(idx.begin() + start, idx.begin() + start + left - 1,
                   idx.begin() + start + num, [&](int A, int B) {
                     return leaves[A].pos[axis] < leaves[B].pos[axis];
                   });
  int c0 = build_rec(t, leaves, idx, start, left, depth + 1);
  int c1 = build_rec(t, leaves, idx, start + left, num - left, depth + 1);
  t.nodes[me].child_count = 2;
  t.nodes[me].first_child = c0;
  t.nodes[c0].parent = me;
  t.nodes[c1].parent = me;
  t.nodes[c0].next_sibling = c1;
  t.nodes[c1].next_sibling = 0;
  t.g[me] = merge_pair(t.g[c0], t.g[c1]);
  return me;
}

void align_rec(Tree& t, int node) {
  if (t.nodes[node].child_count == 0) return;
  int c0 = t.nodes[node].first_child;
  int c1 = t.nodes[c0].next_sibling;
  align_to_parent(t.g[node], t.g[c0]);
  align_to_parent(t.g[node], t.g[c1]);
  align_rec(t, c0);
  align_rec(t, c1);
}

// ---- 3DGS binary PLY reader (layout of data/ply.py) ----
bool load_gaussian_ply(const std::string& path, std::vector<Gaussian>& out,
                       int& sh_degree) {
  std::ifstream f(path, std::ios::binary);
  if (!f) return false;
  std::string line;
  int n = 0, n_rest = 0;
  std::vector<std::string> props;
  while (std::getline(f, line)) {
    std::istringstream ss(line);
    std::string tok;
    ss >> tok;
    if (tok == "element") {
      std::string what;
      ss >> what >> n;
    } else if (tok == "property") {
      std::string type, name;
      ss >> type >> name;
      props.push_back(name);
      if (name.rfind("f_rest_", 0) == 0) n_rest++;
    } else if (tok == "end_header") {
      break;
    }
  }
  int K = n_rest / 3 + 1;
  sh_degree = K == 1 ? 0 : K == 4 ? 1 : K == 9 ? 2 : 3;
  const int P = props.size();
  std::vector<float> row(P);
  auto col = [&](const char* name) {
    for (int i = 0; i < P; i++)
      if (props[i] == name) return i;
    return -1;
  };
  int cx = col("x"), cy = col("y"), cz = col("z");
  int cdc0 = col("f_dc_0");
  int crest0 = col("f_rest_0");
  int cop = col("opacity");
  int cs0 = col("scale_0");
  int cr0 = col("rot_0");
  out.resize(n);
  for (int i = 0; i < n; i++) {
    f.read(reinterpret_cast<char*>(row.data()), P * sizeof(float));
    Gaussian& g = out[i];
    g.pos = {row[cx], row[cy], row[cz]};
    g.sh.resize(K * 3);
    for (int c = 0; c < 3; c++) g.sh[c] = row[cdc0 + c];
    // PLY stores f_rest channel-major [3][K-1]; we use [K][3]
    for (int k = 1; k < K; k++)
      for (int c = 0; c < 3; c++)
        g.sh[k * 3 + c] = crest0 < 0 ? 0.f
                                     : row[crest0 + c * (K - 1) + (k - 1)];
    g.opacity = 1.0f / (1.0f + std::exp(-row[cop]));  // stored as logit
    g.scale = {std::exp(row[cs0]), std::exp(row[cs0 + 1]),
               std::exp(row[cs0 + 2])};
    g.rot = {row[cr0], row[cr0 + 1], row[cr0 + 2], row[cr0 + 3]};
  }
  return true;
}

bool write_dhier(const std::string& path, const Tree& t, int sh_degree) {
  std::ofstream f(path, std::ios::binary);
  if (!f) return false;
  int32_t G = t.g.size();
  f.write(reinterpret_cast<const char*>(&G), 4);
  int32_t deg = sh_degree;
  f.write(reinterpret_cast<const char*>(&deg), 4);
  for (auto& g : t.g) f.write(reinterpret_cast<const char*>(&g.pos), 12);
  for (auto& g : t.g) f.write(reinterpret_cast<const char*>(&g.rot), 16);
  for (auto& g : t.g) {
    float ls[3] = {std::log(g.scale.x), std::log(g.scale.y),
                   std::log(g.scale.z)};
    f.write(reinterpret_cast<const char*>(ls), 12);
  }
  for (auto& g : t.g)
    f.write(reinterpret_cast<const char*>(&g.opacity), 4);
  const int K = (sh_degree + 1) * (sh_degree + 1) * 3;
  for (auto& g : t.g)
    f.write(reinterpret_cast<const char*>(g.sh.data()), K * 4);
  int32_t N = t.nodes.size();
  f.write(reinterpret_cast<const char*>(&N), 4);
  for (size_t i = 0; i < t.nodes.size(); i++) {
    const Node& nd = t.nodes[i];
    int32_t fc = nd.child_count == 0 ? -1 : nd.first_child;
    // aux column: original point index for leaves, -1 for merged nodes —
    // the reference fork's semantics (writer.cpp:123/134)
    int32_t row[6] = {nd.depth, nd.parent, nd.child_count, fc,
                      nd.next_sibling, t.leaf_point[i]};
    f.write(reinterpret_cast<const char*>(row), 24);
  }
  return true;
}

}  // namespace

extern "C" int hlod_build_hierarchy_file(const char* in_ply,
                                         const char* out_dhier) {
  std::vector<Gaussian> leaves;
  int sh_degree = 0;
  if (!load_gaussian_ply(in_ply, leaves, sh_degree)) return -1;
  if (leaves.empty()) return -2;
  Tree t;
  std::vector<int> idx(leaves.size());
  std::iota(idx.begin(), idx.end(), 0);
  int root = build_rec(t, leaves, idx, 0, leaves.size(), 0);
  align_rec(t, root);
  if (!write_dhier(out_dhier, t, sh_degree)) return -3;
  return (int)t.nodes.size();
}

#ifdef HLOD_CREATOR_MAIN
int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s in.ply out.dhier\n", argv[0]);
    return 1;
  }
  int n = hlod_build_hierarchy_file(argv[1], argv[2]);
  if (n < 0) {
    std::fprintf(stderr, "failed: %d\n", n);
    return 1;
  }
  std::printf("wrote %d nodes\n", n);
  return 0;
}
#endif
