// Native binned-SAH BVH builder (OpenMP-parallel).
//
// C++ implementation of the same algorithm as ../bvh.py (Wald 2007 binned
// SAH, K=16 bins, leaf cutoff <=4 with a median-split fallback so leaves are
// statically bounded) — the role of the reference's createBVHBinned
// (reference: src/bvhBuilder.h:35-274), written fresh. The top of the tree is
// split sequentially until enough independent subtrees exist, then subtrees
// build in parallel: node ids come from a shared atomic counter and each
// subtree owns a disjoint slice of the permutation array, so no locking is
// needed anywhere else. The resulting TREE (boxes, leaf contents, perm) is
// identical for any thread count — only node numbering differs — because
// every split depends only on its own slice's geometry.
//
// Memory design (the build is gather-bound, measured 27 ns/triangle-touch
// with split arrays): each triangle's box + centroid + bin id live in ONE
// 64-byte cache-line record, fetched once per touch via the permutation with
// software prefetch; box/centroid grows are SSE min/max. Each WorkItem
// carries its exact centroid bounds, computed during the parent's binning as
// the union of per-bin centroid boxes (min/max over the same point set =>
// bit-identical to a rescan), so a node makes two passes over its slice
// (bin + partition), not three.
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
#include <cstdlib>
#include <cstdio>
#include <chrono>
#include <vector>
#include <algorithm>
#include <limits>
#ifdef _OPENMP
#include <omp.h>
#endif
#if defined(__SSE2__) || defined(_M_X64)
#include <immintrin.h>
#define BVH_SSE 1
#endif

namespace {

constexpr int K = 16;
constexpr int LEAF_SIZE = 4;
constexpr float FEPS = 1e-3f;
constexpr float INF = std::numeric_limits<float>::infinity();

// One vector of 4 floats; lane 3 is padding kept inert (+INF for mins,
// -INF for maxes, 0 for points) so SSE min/max over all 4 lanes never
// changes lanes 0-2.
struct alignas(16) F4 {
    float v[4];
#ifdef BVH_SSE
    inline __m128 m() const { return _mm_load_ps(v); }
    inline void set(__m128 x) { _mm_store_ps(v, x); }
#endif
    inline void mins(const F4& o) {
#ifdef BVH_SSE
        set(_mm_min_ps(m(), o.m()));
#else
        for (int j = 0; j < 4; j++) v[j] = std::min(v[j], o.v[j]);
#endif
    }
    inline void maxs(const F4& o) {
#ifdef BVH_SSE
        set(_mm_max_ps(m(), o.m()));
#else
        for (int j = 0; j < 4; j++) v[j] = std::max(v[j], o.v[j]);
#endif
    }
};

struct alignas(16) Box {
    F4 lo, hi;
    static Box insideOut() {
        return {{{INF, INF, INF, INF}}, {{-INF, -INF, -INF, -INF}}};
    }
    inline void grow(const Box& b) { lo.mins(b.lo); hi.maxs(b.hi); }
    inline void grow_pt(const F4& p) { lo.mins(p); hi.maxs(p); }
    float area() const {
        float dx = std::max(hi.v[0] - lo.v[0], 0.0f);
        float dy = std::max(hi.v[1] - lo.v[1], 0.0f);
        float dz = std::max(hi.v[2] - lo.v[2], 0.0f);
        return 2.0f * (dx * dy + dx * dz + dy * dz);
    }
};

// One triangle's entire build payload in a single cache line.
struct alignas(64) TriRec {
    Box box;       // 32 B (lo pad +INF, hi pad -INF)
    F4 cen;        // 16 B (pad 0)
    int32_t _pad[4];
};
static_assert(sizeof(TriRec) == 64, "TriRec must be one cache line");

struct WorkItem {
    int64_t node, start, count;
    Box cen;              // exact centroid bounds of the slice
};

inline void prefetch(const void* p) {
#ifdef BVH_SSE
    _mm_prefetch((const char*)p, _MM_HINT_T0);
#else
    (void)p;
#endif
}

}  // namespace

extern "C" int64_t build_bvh_binned(
    int64_t n,
    const float* v0, const float* v1, const float* v2,
    float* out_vmin, float* out_vmax,
    int32_t* out_left, int32_t* out_leaf_start, int32_t* out_leaf_count,
    int32_t* out_perm) {
    if (n <= 0) return 0;

    const bool prof = std::getenv("BVH_PROF") != nullptr;
    double t_init = 0, t_bin = 0, t_part = 0, t_med = 0;
    int64_t n_bin = 0, n_part = 0, n_med = 0;
    auto now = [] {
        return std::chrono::duration<double>(
            std::chrono::steady_clock::now().time_since_epoch()).count();
    };
    double tstart = now();

    std::vector<TriRec> rec(n);
    // bin id of the triangle at PERM POSITION i for the current split: the
    // bin pass writes it sequentially and the partition reads it
    // sequentially from both ends (swapped alongside out_perm), so the
    // partition does no gathers at all
    std::vector<int8_t> bin_pos(n);

    Box root = Box::insideOut();
    Box root_cen = Box::insideOut();
#ifdef _OPENMP
#pragma omp parallel
#endif
    {
        Box local = Box::insideOut();
        Box local_cen = Box::insideOut();
#ifdef _OPENMP
#pragma omp for nowait
#endif
        for (int64_t i = 0; i < n; i++) {
            F4 a{{v0[3 * i], v0[3 * i + 1], v0[3 * i + 2], 0.0f}};
            F4 b{{v1[3 * i], v1[3 * i + 1], v1[3 * i + 2], 0.0f}};
            F4 c{{v2[3 * i], v2[3 * i + 1], v2[3 * i + 2], 0.0f}};
            TriRec& t = rec[i];
            for (int j = 0; j < 3; j++) {
                t.box.lo.v[j] = std::min(a.v[j], std::min(b.v[j], c.v[j]));
                t.box.hi.v[j] = std::max(a.v[j], std::max(b.v[j], c.v[j]));
                t.cen.v[j] = 0.333333f * (a.v[j] + b.v[j] + c.v[j]);
            }
            t.box.lo.v[3] = INF;
            t.box.hi.v[3] = -INF;
            t.cen.v[3] = 0.0f;
            local.grow(t.box);
            local_cen.grow_pt(t.cen);
            out_perm[i] = (int32_t)i;
        }
#ifdef _OPENMP
#pragma omp critical
#endif
        {
            root.grow(local);
            root_cen.grow(local_cen);
        }
    }
    if (prof) t_init = now() - tstart;

    auto set_box = [&](int64_t idx, const Box& b) {
        out_vmin[3 * idx] = b.lo.v[0];
        out_vmin[3 * idx + 1] = b.lo.v[1];
        out_vmin[3 * idx + 2] = b.lo.v[2];
        out_vmax[3 * idx] = b.hi.v[0];
        out_vmax[3 * idx + 1] = b.hi.v[1];
        out_vmax[3 * idx + 2] = b.hi.v[2];
    };
    auto make_leaf = [&](int64_t idx, int64_t start, int64_t count) {
        out_leaf_start[idx] = (int32_t)start;
        out_leaf_count[idx] = (int32_t)count;
        out_left[idx] = 0;
    };

    set_box(0, root);
    std::atomic<int64_t> node_count{1};

    // median-split fallback when SAH bails with count > LEAF_SIZE; children's
    // centroid bounds need a rescan here (rare path)
    auto median_split = [&](std::vector<WorkItem>& stack, int64_t idx,
                            int64_t start, int64_t count, int axis) {
        double tm0 = prof ? now() : 0;
        int32_t* b = out_perm + start;
        std::nth_element(b, b + count / 2, b + count,
                         [&](int32_t a, int32_t c) {
                             return rec[a].cen.v[axis] < rec[c].cen.v[axis];
                         });
        const int64_t lcnt = count / 2;
        const int64_t c1 = node_count.fetch_add(2);
        const int64_t c2 = c1 + 1;
        Box lb = Box::insideOut(), rb = Box::insideOut();
        Box lcen = Box::insideOut(), rcen = Box::insideOut();
        for (int64_t i = start; i < start + lcnt; i++) {
            lb.grow(rec[out_perm[i]].box);
            lcen.grow_pt(rec[out_perm[i]].cen);
        }
        for (int64_t i = start + lcnt; i < start + count; i++) {
            rb.grow(rec[out_perm[i]].box);
            rcen.grow_pt(rec[out_perm[i]].cen);
        }
        set_box(c1, lb);
        set_box(c2, rb);
        out_left[idx] = (int32_t)c1;
        out_leaf_count[idx] = 0;
        out_leaf_start[idx] = 0;
        if (prof) { t_med += now() - tm0; n_med += count; }
        stack.push_back({c2, start + lcnt, count - lcnt, rcen});
        stack.push_back({c1, start, lcnt, lcen});
    };

    // One SAH split step; pushes children onto `stack` (or makes a leaf).
    // `scratch_perm`/`scratch_bin` are caller-owned slice-sized buffers for
    // the branchless partition (per-thread in the parallel phase).
    auto step = [&](std::vector<WorkItem>& stack, const WorkItem& w,
                    std::vector<int32_t>& scratch_perm,
                    std::vector<int8_t>& scratch_bin) {
        const int64_t idx = w.node, start = w.start, count = w.count;

        if (count <= LEAF_SIZE) { make_leaf(idx, start, count); return; }

        const Box& cen = w.cen;
        float ext[3];
        for (int j = 0; j < 3; j++) ext[j] = cen.hi.v[j] - cen.lo.v[j];
        int axis = 2;
        if (ext[0] > ext[1] && ext[0] > ext[2]) axis = 0;
        else if (ext[1] > ext[0] && ext[1] > ext[2]) axis = 1;
        const float bmin = cen.lo.v[axis], bmax = cen.hi.v[axis];
        if (bmax - bmin < K * FEPS) {
            median_split(stack, idx, start, count, axis);
            return;
        }

        Box bins[K];
        Box cbins[K];           // per-bin centroid bounds -> child bounds
        int64_t bin_counts[K] = {0};
        for (int k = 0; k < K; k++) {
            bins[k] = Box::insideOut();
            cbins[k] = Box::insideOut();
        }
        const float bin_fac = K * (1.0f - FEPS) / (bmax - bmin);
        double tb0 = prof ? now() : 0;
        constexpr int64_t PF = 12;
        for (int64_t i = start; i < start + count; i++) {
            if (i + PF < start + count) prefetch(&rec[out_perm[i + PF]]);
            TriRec& t = rec[out_perm[i]];
            int b = (int)((t.cen.v[axis] - bmin) * bin_fac);
            if (b < 0) b = 0;
            if (b >= K) b = K - 1;
            bin_pos[i] = (int8_t)b;
            bin_counts[b]++;
            bins[b].grow(t.box);
            cbins[b].grow_pt(t.cen);
        }
        if (prof) { t_bin += now() - tb0; n_bin += count; }

        Box parent_box;
        {
            const float* mn = out_vmin + 3 * idx;
            const float* mx = out_vmax + 3 * idx;
            parent_box = {{{mn[0], mn[1], mn[2], INF}},
                          {{mx[0], mx[1], mx[2], -INF}}};
        }
        const double inv_parent =
            1.0 / std::max((double)parent_box.area(), 1e-30);

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
        if (min_k <= 0) {
            median_split(stack, idx, start, count, axis);
            return;
        }
        int64_t bin_lcnt = 0;
        for (int k = 0; k < min_k; k++) bin_lcnt += bin_counts[k];

        // branchless STABLE partition: the classic two-pointer swap loop
        // pays ~one branch misprediction per element (the side predicate is
        // data-random); instead copy the slice out and replay it with a
        // cmov-indexed store — both sides fill forward, so relative order is
        // preserved on each side (stable) and all writes are sequential.
        // NOTE: the resulting perm ORDER differs from a swap partition;
        // leaf/slice SETS and every split are identical, but anything keyed
        // on triangle order (the light-list order feeding NEE's random light
        // pick) draws a statistically-identical, bitwise-different sequence —
        // golden locks were regenerated when this landed.
        double tp0 = prof ? now() : 0;
        {
            int64_t lpos = start, rpos = start + bin_lcnt;
            std::memcpy(scratch_perm.data(), out_perm + start,
                        count * sizeof(int32_t));
            std::memcpy(scratch_bin.data(), bin_pos.data() + start, count);
            for (int64_t i = 0; i < count; i++) {
                const int32_t v = scratch_perm[i];
                const int8_t b = scratch_bin[i];
                const bool goL = b < min_k;
                const int64_t pos = goL ? lpos : rpos;
                out_perm[pos] = v;
                bin_pos[pos] = b;
                lpos += goL;
                rpos += !goL;
            }
        }
        const int64_t lcnt = bin_lcnt;
        if (prof) { t_part += now() - tp0; n_part += count; }
        if (lcnt == 0 || lcnt == count) {
            median_split(stack, idx, start, count, axis);
            return;
        }

        // children's centroid bounds: union of the per-bin centroid boxes on
        // each side of the cut — the same min/max over the same points as a
        // rescan of the child slice, so bit-identical
        Box lcen = Box::insideOut(), rcen = Box::insideOut();
        for (int k = 0; k < min_k; k++) lcen.grow(cbins[k]);
        for (int k = min_k; k < K; k++) rcen.grow(cbins[k]);

        const int64_t c1 = node_count.fetch_add(2);
        const int64_t c2 = c1 + 1;
        set_box(c1, left_scan[min_k]);
        set_box(c2, right_scan[min_k]);
        out_left[idx] = (int32_t)c1;
        out_leaf_count[idx] = 0;
        out_leaf_start[idx] = 0;
        stack.push_back({c2, start + lcnt, count - lcnt, rcen});
        stack.push_back({c1, start, lcnt, lcen});
    };

    auto build_subtree = [&](WorkItem item) {
        std::vector<WorkItem> stack;
        stack.reserve(128);
        std::vector<int32_t> scratch_perm(item.count);
        std::vector<int8_t> scratch_bin(item.count);
        stack.push_back(item);
        while (!stack.empty()) {
            WorkItem w = stack.back();
            stack.pop_back();
            step(stack, w, scratch_perm, scratch_bin);
        }
    };

    auto dump_prof = [&] {
        std::fprintf(stderr,
            "BVH_PROF init=%.3fs bin=%.3fs(%lldM) part=%.3fs(%lldM) "
            "med=%.3fs(%lldM)\n",
            t_init, t_bin, (long long)(n_bin / 1000000),
            t_part, (long long)(n_part / 1000000),
            t_med, (long long)(n_med / 1000000));
    };

#ifdef _OPENMP
    const int threads = omp_get_max_threads();
#else
    const int threads = 1;
#endif
    if (threads <= 1 || n < 1 << 16) {
        build_subtree({0, 0, n, root_cen});
        if (prof) dump_prof();
        return node_count.load();
    }

    // sequential top: split until enough independent subtrees exist
    const int64_t want = (int64_t)threads * 8;
    std::vector<WorkItem> frontier{{0, 0, n, root_cen}};
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
        std::vector<int32_t> top_sp(w.count);
        std::vector<int8_t> top_sb(w.count);
        step(children, w, top_sp, top_sb);
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

    if (prof) dump_prof();
    return node_count.load();
}
