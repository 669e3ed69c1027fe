// expandToTarget oracle probe — ORIGINAL code driving the REFERENCE's CPU
// Traversal::expandToTarget (traversal.cpp:16-44) on the committed
// oracle.hier. Dumps, per target, the selected gaussian-index list.
// Usage: traversal_probe <oracle.hier> <out.bin>
// out.bin: int32 n_targets | per target: int32 target | int32 count |
//          int32 idx[count]
#include "common.h"
#include "hierarchy_loader.h"
#include "traversal.h"

#include <fstream>
#include <iostream>
#include <vector>

int main(int argc, char* argv[])
{
    if (argc < 3) { std::cerr << "usage: traversal_probe <hier> <out>\n"; return 1; }
    std::vector<Eigen::Vector3f> pos, scales;
    std::vector<SHs> shs;
    std::vector<float> alphas;
    std::vector<Eigen::Vector4f> rot;
    std::vector<Node> nodes;
    std::vector<Box> boxes;
    HierarchyLoader::load(argv[1], pos, shs, alphas, scales, rot, nodes, boxes);

    const int targets[] = {0, 1, 2, 3, 5, 8};
    int nt = 6;
    std::ofstream out(argv[2], std::ios_base::binary);
    out.write((char*)&nt, 4);
    for (int t : targets) {
        std::vector<int> idx = Traversal::expandToTarget(nodes.data(), t);
        int n = (int)idx.size();
        out.write((char*)&t, 4);
        out.write((char*)&n, 4);
        out.write((char*)idx.data(), (size_t)n * 4);
        std::cout << "target " << t << ": " << n << " gaussians\n";
    }
    return 0;
}
