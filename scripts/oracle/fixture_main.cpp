// Oracle fixture generator — ORIGINAL code that links the REFERENCE's CPU
// hierarchy chain (compiled out-of-tree by build_oracle.sh; nothing from
// /root/reference is vendored into this repo).
//
// Runs the exact reference build pipeline (Loader::loadPly<LessRichPoint> ->
// PointbasedKdTreeGenerator -> ClusterMerger -> RotationAligner, as
// mainHierarchyCreator.cpp:59-170 does), then emits the upstream `.hier`
// byte format through the reference's own HierarchyWriter::write
// (hierarchy_writer.cpp:27-119), both uncompressed and f16-compressed,
// plus a raw dump of the exact arrays handed to the writer so tests can
// check the byte layout independently of any python-side reader.
//
// The flat Node/Box table is built by a plain preorder DFS here because the
// fork's own populateRec (writer.cpp:21-116) sets start_children=-1 for
// interior nodes (leaf_indices is only populated on leaves in this fork)
// and then indexes basenodes[-1..] — it is unusable as-is. The byte-format
// oracle is HierarchyWriter::write itself, which this main drives verbatim.
//
// Usage: fixture_gen <input.ply> <outdir>
// Emits: <outdir>/oracle.hier, <outdir>/oracle_c.hier, <outdir>/oracle_arrays.bin
//
// oracle_arrays.bin layout (little-endian):
//   int32 P | int32 N
//   pos f32[P,3] | rot f32[P,4] | logscale f32[P,3] | opacity f32[P]
//   shs f32[P,48] | nodes i32[N,7] | boxes f32[N,8]

#include "loader.h"
#include "writer.h"
#include "hierarchy_writer.h"
#include "PointbasedKdTreeGenerator.h"
#include "ClusterMerger.h"
#include "rotation_aligner.h"
#include "common.h"

#include <fstream>
#include <iostream>
#include <string>
#include <vector>

static void flatten(const ExplicitTreeNode* t, int id,
                    const std::vector<Gaussian>& gs,
                    std::vector<Eigen::Vector3f>& pos,
                    std::vector<Eigen::Vector4f>& rot,
                    std::vector<Eigen::Vector3f>& logs,
                    std::vector<float>& op,
                    std::vector<SHs>& shs,
                    std::vector<Node>& nodes,
                    std::vector<Box>& boxes)
{
    boxes[id] = t->bounds;
    nodes[id].start = (int)pos.size();
    for (int i : t->leaf_indices) {
        const Gaussian& g = gs[i];
        pos.push_back(g.position);
        rot.push_back(g.rotation);
        logs.push_back(g.scale.array().log());
        op.push_back(g.opacity);
        shs.push_back(g.shs);
    }
    nodes[id].count_leafs = (int)t->leaf_indices.size();
    for (const Gaussian& g : t->merged) {
        pos.push_back(g.position);
        rot.push_back(g.rotation);
        logs.push_back(g.scale.array().log());
        op.push_back(g.opacity);
        shs.push_back(g.shs);
    }
    nodes[id].count_merged = (int)t->merged.size();
    nodes[id].depth = t->depth;
    nodes[id].count_children = (int)t->children.size();
    if (t->children.empty()) {
        nodes[id].start_children = -1;
        return;
    }
    int base = (int)nodes.size();
    nodes[id].start_children = base;
    for (size_t c = 0; c < t->children.size(); c++) {
        nodes.push_back(Node());
        nodes.back().parent = id;
        boxes.push_back(Box());
    }
    for (size_t c = 0; c < t->children.size(); c++)
        flatten(t->children[c], base + (int)c, gs, pos, rot, logs, op, shs,
                nodes, boxes);
}

int main(int argc, char* argv[])
{
    if (argc < 3) {
        std::cerr << "usage: fixture_gen <input.ply> <outdir>\n";
        return 1;
    }
    std::string outdir(argv[2]);

    std::vector<Gaussian> gaussians;
    Loader::loadPly<LessRichPoint>(argv[1], gaussians, 0);
    std::cout << "loaded " << gaussians.size() << " gaussians\n";

    PointbasedKdTreeGenerator generator;
    ExplicitTreeNode* root = generator.generate(gaussians);
    ClusterMerger merger;
    merger.merge(root, gaussians);
    RotationAligner::align(root, gaussians);

    std::vector<Eigen::Vector3f> pos, logs;
    std::vector<Eigen::Vector4f> rot;
    std::vector<float> op;
    std::vector<SHs> shs;
    std::vector<Node> nodes(1);
    std::vector<Box> boxes(1);
    flatten(root, 0, gaussians, pos, rot, logs, op, shs, nodes, boxes);

    int P = (int)pos.size();
    int N = (int)nodes.size();
    std::cout << "flattened P=" << P << " N=" << N << "\n";

    HierarchyWriter writer;
    writer.write((outdir + "/oracle.hier").c_str(), P, N, pos.data(),
                 shs.data(), op.data(), logs.data(), rot.data(),
                 nodes.data(), boxes.data(), /*compressed=*/false);
    writer.write((outdir + "/oracle_c.hier").c_str(), P, N, pos.data(),
                 shs.data(), op.data(), logs.data(), rot.data(),
                 nodes.data(), boxes.data(), /*compressed=*/true);

    std::ofstream raw(outdir + "/oracle_arrays.bin", std::ios_base::binary);
    raw.write((char*)&P, sizeof(int));
    raw.write((char*)&N, sizeof(int));
    raw.write((char*)pos.data(), (size_t)P * sizeof(Eigen::Vector3f));
    raw.write((char*)rot.data(), (size_t)P * sizeof(Eigen::Vector4f));
    raw.write((char*)logs.data(), (size_t)P * sizeof(Eigen::Vector3f));
    raw.write((char*)op.data(), (size_t)P * sizeof(float));
    raw.write((char*)shs.data(), (size_t)P * sizeof(SHs));
    raw.write((char*)nodes.data(), (size_t)N * sizeof(Node));
    raw.write((char*)boxes.data(), (size_t)N * sizeof(Box));
    std::cout << "wrote oracle.hier / oracle_c.hier / oracle_arrays.bin\n";
    return 0;
}
