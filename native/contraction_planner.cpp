// Optimal pairwise contraction-order planner for small tensor networks.
//
// The reference framework delegates contraction planning to the
// TensorOperations.jl native layer (SURVEY.md §2.8 / L0); this is the
// TPU-framework counterpart: given the index structure and dimensions of a
// network of up to 16 tensors, find the pairwise contraction order with
// minimal total FLOP count by dynamic programming over subsets
// (Dijkstra-flavoured DP, O(3^n) subset pairs).
//
// Exposed as a C ABI for ctypes:
//   plan_contraction(n_tensors, n_indices, tensor_index_masks (bitmask per
//   tensor over index ids), index_dims, out: order pairs, out: cost)
//
// Build: g++ -O2 -shared -fPIC -o libcontraction_planner.so
//        contraction_planner.cpp

#include <cstdint>
#include <cstring>
#include <limits>
#include <unordered_map>
#include <vector>

namespace {

struct Entry {
  double cost = std::numeric_limits<double>::infinity();
  uint32_t left = 0;   // subset bitmask of the left operand
  uint32_t right = 0;  // subset bitmask of the right operand
  uint64_t indices = 0;  // open indices of the intermediate (bitmask)
};

// product of dimensions selected by an index bitmask
double dim_product(uint64_t mask, const double* dims, int n_indices) {
  double p = 1.0;
  for (int i = 0; i < n_indices; ++i) {
    if (mask >> i & 1ull) p *= dims[i];
  }
  return p;
}

}  // namespace

extern "C" {

// Returns 0 on success. `order_out` receives 2*(n_tensors-1) entries:
// pairs of subset bitmasks contracted at each step, in order. `cost_out`
// receives the total multiply-add count.
int plan_contraction(int n_tensors, int n_indices,
                     const uint64_t* tensor_index_masks,
                     const double* index_dims,
                     uint64_t* order_out, double* cost_out) {
  if (n_tensors < 1 || n_tensors > 16 || n_indices > 63) return 1;
  const uint32_t full = (n_tensors == 32) ? ~0u : ((1u << n_tensors) - 1u);

  // which indices are "open" (appear on exactly one tensor) — they survive
  // to the final result; an index shared by >= 2 tensors is contracted
  // when all its tensors have been merged.
  std::vector<int> index_count(n_indices, 0);
  for (int t = 0; t < n_tensors; ++t)
    for (int i = 0; i < n_indices; ++i)
      if (tensor_index_masks[t] >> i & 1ull) index_count[i]++;

  std::vector<Entry> table(1u << n_tensors);
  for (int t = 0; t < n_tensors; ++t) {
    Entry e;
    e.cost = 0.0;
    e.indices = tensor_index_masks[t];
    e.left = e.right = 0;
    table[1u << t] = e;
  }

  // union of index masks per subset (to know what remains open)
  std::vector<uint64_t> subset_union(1u << n_tensors, 0);
  for (uint32_t s = 1; s <= full; ++s) {
    uint32_t lsb = s & (~s + 1u);
    int t = __builtin_ctz(lsb);
    subset_union[s] = (s == lsb) ? tensor_index_masks[t]
                                 : (subset_union[s ^ lsb] | tensor_index_masks[t]);
  }

  // globally open indices (appear on exactly one tensor = output legs)
  uint64_t global_open = 0;
  for (int i = 0; i < n_indices; ++i)
    if (index_count[i] == 1) global_open |= 1ull << i;

  // open indices of a subset: shared with the outside, or output legs
  auto open_indices = [&](uint32_t s) -> uint64_t {
    uint64_t inside = subset_union[s];
    uint64_t outside = subset_union[full & ~s];
    return (inside & outside) | (inside & global_open);
  };

  // iterate subsets in increasing popcount, split into sub-pairs
  for (uint32_t s = 1; s <= full; ++s) {
    if (__builtin_popcount(s) < 2) continue;
    Entry best;
    // enumerate proper sub-subsets (canonical: left contains lowest bit)
    uint32_t lsb = s & (~s + 1u);
    for (uint32_t l = (s - 1) & s; l > 0; l = (l - 1) & s) {
      if (!(l & lsb)) continue;  // canonical split
      uint32_t r = s ^ l;
      const Entry& el = table[l];
      const Entry& er = table[r];
      if (el.cost == std::numeric_limits<double>::infinity()) continue;
      if (er.cost == std::numeric_limits<double>::infinity()) continue;
      // contraction cost: product over union of (open_l | open_r)
      uint64_t open_l = el.indices, open_r = er.indices;
      double c = el.cost + er.cost +
                 dim_product(open_l | open_r, index_dims, n_indices);
      if (c < best.cost) {
        best.cost = c;
        best.left = l;
        best.right = r;
        best.indices = open_indices(s);
      }
    }
    table[s] = best;
  }

  // reconstruct the order by walking down from the full set
  std::vector<std::pair<uint32_t, uint32_t>> steps;
  std::vector<uint32_t> stack = {full};
  while (!stack.empty()) {
    uint32_t s = stack.back();
    stack.pop_back();
    if (__builtin_popcount(s) < 2) continue;
    const Entry& e = table[s];
    steps.emplace_back(e.left, e.right);
    stack.push_back(e.left);
    stack.push_back(e.right);
  }
  // steps were collected top-down; emit bottom-up
  int n_steps = static_cast<int>(steps.size());
  for (int i = 0; i < n_steps; ++i) {
    order_out[2 * i] = steps[n_steps - 1 - i].first;
    order_out[2 * i + 1] = steps[n_steps - 1 - i].second;
  }
  *cost_out = table[full].cost;
  return 0;
}

}  // extern "C"
