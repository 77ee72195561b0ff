// Native binned-SAH BVH builder (OpenMP-parallel).
//
// C++ implementation of the same algorithm as ../bvh.py (Wald 2007 binned
// SAH, K=16 bins, leaf cutoff <=4 with a median-split fallback so leaves are
// statically bounded) — the role of the reference's createBVHBinned
// (reference: src/bvhBuilder.h:35-274), written fresh. The top of the tree is
// split sequentially until enough independent subtrees exist, then subtrees
// build in parallel: node ids come from a shared atomic counter and each
// subtree owns a disjoint slice of the permutation array, so no locking is
// needed anywhere else.
//
// Exposed via a C ABI for ctypes (see ../native.py). Build: `make` here.
//
// Output layout matches accel.bvh.BVHNodes: vmin/vmax [N,3] float32,
// left/leaf_start/leaf_count int32 (leaf_count > 0 marks a leaf), plus the
// triangle permutation applied by the build.

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>
#include <algorithm>
#include <limits>
#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr int K = 16;
constexpr int LEAF_SIZE = 4;
constexpr float FEPS = 1e-3f;

struct V3 {
    float x, y, z;
    V3 mins(const V3& o) const { return {std::min(x, o.x), std::min(y, o.y), std::min(z, o.z)}; }
    V3 maxs(const V3& o) const { return {std::max(x, o.x), std::max(y, o.y), std::max(z, o.z)}; }
    float operator[](int i) const { return i == 0 ? x : (i == 1 ? y : z); }
};

struct Box {
    V3 lo, hi;
    static Box insideOut() {
        constexpr float inf = std::numeric_limits<float>::infinity();
        return {{inf, inf, inf}, {-inf, -inf, -inf}};
    }
    void grow(const Box& b) { lo = lo.mins(b.lo); hi = hi.maxs(b.hi); }
    float area() const {
        float dx = std::max(hi.x - lo.x, 0.0f);
        float dy = std::max(hi.y - lo.y, 0.0f);
        float dz = std::max(hi.z - lo.z, 0.0f);
        return 2.0f * (dx * dy + dx * dz + dy * dz);
    }
};

struct WorkItem { int64_t node, start, count; };

}  // namespace

extern "C" int64_t build_bvh_binned(
    int64_t n,
    const float* v0, const float* v1, const float* v2,
    float* out_vmin, float* out_vmax,
    int32_t* out_left, int32_t* out_leaf_start, int32_t* out_leaf_count,
    int32_t* out_perm) {
    if (n <= 0) return 0;

    std::vector<Box> tri_box(n);
    std::vector<V3> centroid(n);
    std::vector<int8_t> bin_id(n);

    Box root = Box::insideOut();
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        Box local = Box::insideOut();
#ifdef _OPENMP
#pragma omp for nowait
#endif
        for (int64_t i = 0; i < n; i++) {
            V3 a{v0[3 * i], v0[3 * i + 1], v0[3 * i + 2]};
            V3 b{v1[3 * i], v1[3 * i + 1], v1[3 * i + 2]};
            V3 c{v2[3 * i], v2[3 * i + 1], v2[3 * i + 2]};
            tri_box[i] = {a.mins(b).mins(c), a.maxs(b).maxs(c)};
            centroid[i] = {0.333333f * (a.x + b.x + c.x),
                           0.333333f * (a.y + b.y + c.y),
                           0.333333f * (a.z + b.z + c.z)};
            local.grow(tri_box[i]);
            out_perm[i] = (int32_t)i;
        }
#ifdef _OPENMP
#pragma omp critical
#endif
        root.grow(local);
    }

    auto set_box = [&](int64_t idx, const Box& b) {
        out_vmin[3 * idx] = b.lo.x; out_vmin[3 * idx + 1] = b.lo.y; out_vmin[3 * idx + 2] = b.lo.z;
        out_vmax[3 * idx] = b.hi.x; out_vmax[3 * idx + 1] = b.hi.y; out_vmax[3 * idx + 2] = b.hi.z;
    };
    auto make_leaf = [&](int64_t idx, int64_t start, int64_t count) {
        out_leaf_start[idx] = (int32_t)start;
        out_leaf_count[idx] = (int32_t)count;
        out_left[idx] = 0;
    };

    set_box(0, root);
    std::atomic<int64_t> node_count{1};

    // median-split fallback when SAH bails with count > LEAF_SIZE
    auto median_split = [&](std::vector<WorkItem>& stack, int64_t idx,
                            int64_t start, int64_t count, int axis) {
        int32_t* b = out_perm + start;
        std::nth_element(b, b + count / 2, b + count,
                         [&](int32_t a, int32_t c) {
                             return centroid[a][axis] < centroid[c][axis];
                         });
        const int64_t lcnt = count / 2;
        const int64_t c1 = node_count.fetch_add(2);
        const int64_t c2 = c1 + 1;
        Box lb = Box::insideOut(), rb = Box::insideOut();
        for (int64_t i = start; i < start + lcnt; i++) lb.grow(tri_box[out_perm[i]]);
        for (int64_t i = start + lcnt; i < start + count; i++) rb.grow(tri_box[out_perm[i]]);
        set_box(c1, lb);
        set_box(c2, rb);
        out_left[idx] = (int32_t)c1;
        out_leaf_count[idx] = 0;
        out_leaf_start[idx] = 0;
        stack.push_back({c2, start + lcnt, count - lcnt});
        stack.push_back({c1, start, lcnt});
    };

    // One SAH split step; pushes children onto `stack` (or makes a leaf).
    auto step = [&](std::vector<WorkItem>& stack, const WorkItem& w) {
        const int64_t idx = w.node, start = w.start, count = w.count;

        if (count <= LEAF_SIZE) { make_leaf(idx, start, count); return; }

        Box cen = Box::insideOut();
        for (int64_t i = start; i < start + count; i++) {
            const V3& c = centroid[out_perm[i]];
            cen.lo = cen.lo.mins(c);
            cen.hi = cen.hi.maxs(c);
        }
        V3 ext{cen.hi.x - cen.lo.x, cen.hi.y - cen.lo.y, cen.hi.z - cen.lo.z};
        int axis = 2;
        if (ext.x > ext.y && ext.x > ext.z) axis = 0;
        else if (ext.y > ext.x && ext.y > ext.z) axis = 1;
        const float bmin = cen.lo[axis], bmax = cen.hi[axis];
        if (bmax - bmin < K * FEPS) { median_split(stack, idx, start, count, axis); return; }

        Box bins[K];
        int64_t bin_counts[K] = {0};
        for (int k = 0; k < K; k++) bins[k] = Box::insideOut();
        const float bin_fac = K * (1.0f - FEPS) / (bmax - bmin);
        for (int64_t i = start; i < start + count; i++) {
            const int32_t t = out_perm[i];
            int b = (int)((centroid[t][axis] - bmin) * bin_fac);
            if (b < 0) b = 0; if (b >= K) b = K - 1;
            bin_id[t] = (int8_t)b;
            bin_counts[b]++;
            bins[b].grow(tri_box[t]);
        }

        Box parent_box;
        {
            const float* mn = out_vmin + 3 * idx;
            const float* mx = out_vmax + 3 * idx;
            parent_box = {{mn[0], mn[1], mn[2]}, {mx[0], mx[1], mx[2]}};
        }
        const double inv_parent = 1.0 / std::max((double)parent_box.area(), 1e-30);

        double left_cost[K], right_cost[K];
        Box left_scan[K], right_scan[K];
        Box lb = Box::insideOut(), rb = Box::insideOut();
        int64_t lc = 0, rc = 0;
        for (int k = 0; k < K; k++) {
            left_cost[k] = lc ? lc * lb.area() * inv_parent : 0.0;
            left_scan[k] = lb;
            lb.grow(bins[k]);
            lc += bin_counts[k];
            rb.grow(bins[K - k - 1]);
            rc += bin_counts[K - k - 1];
            right_cost[K - k - 1] = rc * rb.area() * inv_parent;
            right_scan[K - k - 1] = rb;
        }

        double min_sah = (double)count;
        int min_k = -1;
        for (int k = 0; k < K; k++) {
            double sah = left_cost[k] + right_cost[k] + FEPS;
            if (sah < min_sah) { min_sah = sah; min_k = k; }
        }
        if (min_k <= 0) { median_split(stack, idx, start, count, axis); return; }

        int64_t l = start, r = start + count - 1;
        while (l <= r) {
            if (bin_id[out_perm[l]] < min_k) { l++; continue; }
            if (bin_id[out_perm[r]] >= min_k) { r--; continue; }
            std::swap(out_perm[l], out_perm[r]);
        }
        const int64_t lcnt = l - start;
        if (lcnt == 0 || lcnt == count) { median_split(stack, idx, start, count, axis); return; }

        const int64_t c1 = node_count.fetch_add(2);
        const int64_t c2 = c1 + 1;
        set_box(c1, left_scan[min_k]);
        set_box(c2, right_scan[min_k]);
        out_left[idx] = (int32_t)c1;
        out_leaf_count[idx] = 0;
        out_leaf_start[idx] = 0;
        stack.push_back({c2, start + lcnt, count - lcnt});
        stack.push_back({c1, start, lcnt});
    };

    auto build_subtree = [&](WorkItem item) {
        std::vector<WorkItem> stack;
        stack.reserve(128);
        stack.push_back(item);
        while (!stack.empty()) {
            WorkItem w = stack.back();
            stack.pop_back();
            step(stack, w);
        }
    };

#ifdef _OPENMP
    const int threads = omp_get_max_threads();
#else
    const int threads = 1;
#endif
    if (threads <= 1 || n < 1 << 16) {
        build_subtree({0, 0, n});
        return node_count.load();
    }

    // sequential top: split until enough independent subtrees exist
    const int64_t want = (int64_t)threads * 8;
    std::vector<WorkItem> frontier{{0, 0, n}};
    std::vector<WorkItem> ready;
    while (!frontier.empty() &&
           (int64_t)(frontier.size() + ready.size()) < want) {
        // split the largest frontier item
        size_t big = 0;
        for (size_t i = 1; i < frontier.size(); i++)
            if (frontier[i].count > frontier[big].count) big = i;
        WorkItem w = frontier[big];
        frontier.erase(frontier.begin() + big);
        if (w.count <= LEAF_SIZE * 8) { ready.push_back(w); continue; }
        std::vector<WorkItem> children;
        step(children, w);
        for (const auto& c : children) frontier.push_back(c);
        if (children.empty()) { /* became a leaf */ }
    }
    for (const auto& w : frontier) ready.push_back(w);

#ifdef _OPENMP
#pragma omp parallel for schedule(dynamic, 1)
#endif
    for (int64_t i = 0; i < (int64_t)ready.size(); i++) {
        build_subtree(ready[i]);
    }

    return node_count.load();
}
