// Exact DistributeOctTree as a native C++ component.
//
// Host-side replacement for the greedy quadtree keypoint balancing
// (reference: ORBextractor::DistributeOctTree, src/orb_extractor/
// ORBextractor.cc:544-771 and ExtractorNode::DivideNode :486-542).
// The algorithm is inherently sequential (list mutation, largest-first
// final stage), so the host-exact path runs natively; the TPU pipeline
// uses the shape-static device approximation in frontend/octree.py.
//
// C ABI for ctypes:
//   int distribute_octree(const float* xs, const float* ys,
//                         const float* resp, int n,
//                         int min_x, int max_x, int min_y, int max_y,
//                         int n_target, long long* out_idx, int max_out);
// Returns the number of selected keypoints (indices into the input
// arrays, one per leaf node), or -1 on error.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <list>
#include <vector>

namespace {

struct Node {
  int ulx, uly, brx, bry;
  std::vector<int> idx;
  bool no_more = false;
};

using NodeList = std::list<Node>;

void divide(const Node& n, const float* xs, const float* ys, Node out[4]) {
  const int half_x = static_cast<int>(std::ceil(static_cast<float>(n.brx - n.ulx) / 2));
  const int half_y = static_cast<int>(std::ceil(static_cast<float>(n.bry - n.uly) / 2));
  const int mx = n.ulx + half_x;
  const int my = n.uly + half_y;
  out[0] = {n.ulx, n.uly, mx, my, {}, false};
  out[1] = {mx, n.uly, n.brx, my, {}, false};
  out[2] = {n.ulx, my, mx, n.bry, {}, false};
  out[3] = {mx, my, n.brx, n.bry, {}, false};
  for (int i : n.idx) {
    const bool left = xs[i] < static_cast<float>(mx);
    const bool top = ys[i] < static_cast<float>(my);
    out[left ? (top ? 0 : 2) : (top ? 1 : 3)].idx.push_back(i);
  }
  for (int c = 0; c < 4; ++c)
    if (out[c].idx.size() == 1) out[c].no_more = true;
}

}  // namespace

extern "C" int distribute_octree(
    const float* xs_in, const float* ys_in, const float* resp, int n,
    int min_x, int max_x, int min_y, int max_y, int n_target,
    long long* out_idx, int max_out) {
  if (n <= 0 || n_target <= 0) return 0;

  std::vector<float> xs(n), ys(n);
  for (int i = 0; i < n; ++i) {
    xs[i] = xs_in[i] - static_cast<float>(min_x);
    ys[i] = ys_in[i] - static_cast<float>(min_y);
  }
  const int w = max_x - min_x;
  const int h = max_y - min_y;
  int n_ini = static_cast<int>(std::lround(static_cast<float>(w) / h));
  if (n_ini < 1) n_ini = 1;
  const float h_x = static_cast<float>(w) / static_cast<float>(n_ini);

  NodeList nodes;
  std::vector<NodeList::iterator> ini(n_ini);
  for (int i = 0; i < n_ini; ++i) {
    Node node;
    node.ulx = static_cast<int>(h_x * static_cast<float>(i));
    node.brx = static_cast<int>(h_x * static_cast<float>(i + 1));
    node.uly = 0;
    node.bry = h;
    nodes.push_back(std::move(node));
    ini[i] = std::prev(nodes.end());
  }
  for (int i = 0; i < n; ++i) {
    int col = static_cast<int>(xs[i] / h_x);
    if (col < 0) col = 0;
    if (col >= n_ini) col = n_ini - 1;
    ini[col]->idx.push_back(i);
  }
  for (auto it = nodes.begin(); it != nodes.end();) {
    if (it->idx.size() == 1) {
      it->no_more = true;
      ++it;
    } else if (it->idx.empty()) {
      it = nodes.erase(it);
    } else {
      ++it;
    }
  }

  bool finish = false;
  std::vector<std::pair<int, NodeList::iterator>> to_expand;
  while (!finish) {
    const int prev_size = static_cast<int>(nodes.size());
    to_expand.clear();
    for (auto it = nodes.begin(); it != nodes.end();) {
      if (it->no_more) {
        ++it;
        continue;
      }
      Node children[4];
      divide(*it, xs.data(), ys.data(), children);
      for (int c = 0; c < 4; ++c) {
        if (children[c].idx.empty()) continue;
        nodes.push_front(std::move(children[c]));
        if (nodes.front().idx.size() > 1)
          to_expand.emplace_back(
              static_cast<int>(nodes.front().idx.size()), nodes.begin());
      }
      it = nodes.erase(it);
    }
    if (static_cast<int>(nodes.size()) >= n_target ||
        static_cast<int>(nodes.size()) == prev_size) {
      finish = true;
    } else if (static_cast<int>(nodes.size()) + 3 * static_cast<int>(to_expand.size()) >
               n_target) {
      // final stage: split largest nodes first (stable on ties, unlike
      // the reference's pointer-order tie-break which is unspecified)
      while (!finish) {
        const int prev2 = static_cast<int>(nodes.size());
        auto prev_expand = to_expand;
        to_expand.clear();
        std::stable_sort(
            prev_expand.begin(), prev_expand.end(),
            [](const auto& a, const auto& b) { return a.first < b.first; });
        for (auto it = prev_expand.rbegin(); it != prev_expand.rend(); ++it) {
          Node children[4];
          divide(*(it->second), xs.data(), ys.data(), children);
          for (int c = 0; c < 4; ++c) {
            if (children[c].idx.empty()) continue;
            nodes.push_front(std::move(children[c]));
            if (nodes.front().idx.size() > 1)
              to_expand.emplace_back(
                  static_cast<int>(nodes.front().idx.size()), nodes.begin());
          }
          nodes.erase(it->second);
          if (static_cast<int>(nodes.size()) >= n_target) break;
        }
        if (static_cast<int>(nodes.size()) >= n_target ||
            static_cast<int>(nodes.size()) == prev2)
          finish = true;
      }
    }
  }

  int count = 0;
  for (const auto& node : nodes) {
    if (count >= max_out) break;
    int best = node.idx[0];
    float best_r = resp[best];
    for (size_t k = 1; k < node.idx.size(); ++k) {
      if (resp[node.idx[k]] > best_r) {
        best = node.idx[k];
        best_r = resp[best];
      }
    }
    out_idx[count++] = best;
  }
  return count;
}
