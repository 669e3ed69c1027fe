// Merger-falloff oracle probe — ORIGINAL code driving the REFERENCE's
// HierarchyExplicitLoader (hierarchy_explicit_loader.cpp: getWeight linear
// falloff around the chunk-equidistance surface, weight-0 drop + child
// promotion, pos[0]-to-chunk-center overwrite) on synthetic chunk .hier
// files. The reference's own merger OUTPUT path (Writer::writeHierarchy ->
// populateRec) indexes basenodes[-1] for interior nodes in this fork and is
// unusable, so the oracle boundary is the LOADER: this main dumps the
// post-falloff in-memory tree per chunk with a correct flatten of our own.
//
// Usage: merger_probe <outdir> <chunkdir1> <chunkdir2> ...
//   each chunkdir holds chunk.hier + center.txt ("x y z")
// Emits per chunk: <outdir>/merged_chunk<K>.bin:
//   int32 P | int32 N
//   pos f32[P,3] | rot f32[P,4] | scale_LINEAR f32[P,3] | opacity f32[P]
//   shs f32[P,48] | nodes i32[N,7] | boxes f32[N,8]
// (opacity already weight-multiplied; gaussians whose weight was 0 are
// absent; spliced tree structure reflected in the node table)

#include "common.h"
#include "hierarchy_explicit_loader.h"

#include <fstream>
#include <iostream>
#include <string>
#include <vector>

static void flatten(const ExplicitTreeNode* t, int id,
                    const std::vector<Gaussian>& gs,
                    std::vector<Eigen::Vector3f>& pos,
                    std::vector<Eigen::Vector4f>& rot,
                    std::vector<Eigen::Vector3f>& scl,
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
        scl.push_back(g.scale);          // LINEAR (loader exp'ed them)
        op.push_back(g.opacity);
        shs.push_back(g.shs);
    }
    nodes[id].count_leafs = (int)t->leaf_indices.size();
    for (const Gaussian& g : t->merged) {
        pos.push_back(g.position);
        rot.push_back(g.rotation);
        scl.push_back(g.scale);
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
        flatten(t->children[c], base + (int)c, gs, pos, rot, scl, op, shs,
                nodes, boxes);
}

int main(int argc, char* argv[])
{
    if (argc < 3) {
        std::cerr << "usage: merger_probe <outdir> <chunkdir>...\n";
        return 1;
    }
    std::string outdir(argv[1]);
    int n_chunks = argc - 2;

    std::vector<Eigen::Vector3f> centers(n_chunks);
    for (int k = 0; k < n_chunks; k++) {
        std::ifstream f(std::string(argv[2 + k]) + "/center.txt");
        f >> centers[k][0] >> centers[k][1] >> centers[k][2];
    }

    for (int k = 0; k < n_chunks; k++) {
        std::vector<Gaussian> gaussians;
        ExplicitTreeNode* root = new ExplicitTreeNode;
        HierarchyExplicitLoader::loadExplicit(
            (std::string(argv[2 + k]) + "/chunk.hier").c_str(),
            gaussians, root, k, centers);

        std::vector<Eigen::Vector3f> pos, scl;
        std::vector<Eigen::Vector4f> rot;
        std::vector<float> op;
        std::vector<SHs> shs;
        std::vector<Node> nodes(1);
        std::vector<Box> boxes(1);
        flatten(root, 0, gaussians, pos, rot, scl, op, shs, nodes, boxes);

        int P = (int)pos.size();
        int N = (int)nodes.size();
        std::ofstream raw(outdir + "/merged_chunk" + std::to_string(k)
                          + ".bin", std::ios_base::binary);
        raw.write((char*)&P, sizeof(int));
        raw.write((char*)&N, sizeof(int));
        raw.write((char*)pos.data(), (size_t)P * 12);
        raw.write((char*)rot.data(), (size_t)P * 16);
        raw.write((char*)scl.data(), (size_t)P * 12);
        raw.write((char*)op.data(), (size_t)P * 4);
        raw.write((char*)shs.data(), (size_t)P * sizeof(SHs));
        raw.write((char*)nodes.data(), (size_t)N * sizeof(Node));
        raw.write((char*)boxes.data(), (size_t)N * sizeof(Box));
        std::cout << "chunk " << k << ": P=" << P << " N=" << N << "\n";
    }
    return 0;
}
