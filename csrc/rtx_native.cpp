// Native host-side runtime for raytracer_tpu.
//
// The reference implements its entire loader/accel-build path in native
// Rust (raytracer_lib/src/scene/loaders/*, accel_intersect/*); this
// module provides the equivalent native hot paths for the TPU framework:
//
//  - whitespace-separated float/int stream parsing (the COLLADA
//    <float_array>/<p> payloads dominate load time for thai2.dae's
//    2.7 MB document; mirrors parseval's array_f32/array_u32 role,
//    colladaloader.rs:571-587),
//  - triangle de-indexing into flat SoA buffers
//    (colladaloader.rs:190-207),
//  - Morton ordering of triangle centroids for the cluster-grid
//    acceleration structure (the octree build's successor,
//    oct_tree_intersector.rs:66-146).
//
// Exposed as a plain C ABI consumed through ctypes
// (raytracer_tpu/native/__init__.py), with pure-numpy fallbacks when the
// shared library is unavailable.

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Parse whitespace-separated floats from s[0..len) into out (capacity
// cap). Returns the number parsed, or -1 on overflow.
long rtx_parse_floats(const char* s, long len, float* out, long cap) {
    const char* p = s;
    const char* end = s + len;
    long n = 0;
    while (p < end) {
        while (p < end && (*p == ' ' || *p == '\n' || *p == '\t' || *p == '\r'))
            ++p;
        if (p >= end) break;
        char* next = nullptr;
        float v = strtof(p, &next);
        if (next == p) break;  // unparsable tail
        if (n >= cap) return -1;
        out[n++] = v;
        p = next;
    }
    return n;
}

// Parse whitespace-separated non-negative integers. Returns count or -1.
long rtx_parse_ints(const char* s, long len, int64_t* out, long cap) {
    const char* p = s;
    const char* end = s + len;
    long n = 0;
    while (p < end) {
        while (p < end && (*p == ' ' || *p == '\n' || *p == '\t' || *p == '\r'))
            ++p;
        if (p >= end) break;
        bool neg = false;
        if (*p == '-') { neg = true; ++p; }
        if (p >= end || *p < '0' || *p > '9') break;
        int64_t v = 0;
        while (p < end && *p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
        if (n >= cap) return -1;
        out[n++] = neg ? -v : v;
    }
    return n;
}

// De-index triangle soup: verts (V,3) + position indices (3T,) ->
// out (3T,3). Mirrors colladaloader.rs:190-207.
void rtx_deindex(const float* verts, long n_verts, const int64_t* idx,
                 long n_idx, float* out) {
    for (long i = 0; i < n_idx; ++i) {
        int64_t vi = idx[i];
        if (vi < 0 || vi >= n_verts) vi = 0;  // defensive clamp
        std::memcpy(out + 3 * i, verts + 3 * vi, 3 * sizeof(float));
    }
}

static inline uint64_t expand_bits(uint64_t x) {
    x = (x | (x << 16)) & 0x030000FFull;
    x = (x | (x << 8)) & 0x0300F00Full;
    x = (x | (x << 4)) & 0x030C30C3ull;
    x = (x | (x << 2)) & 0x09249249ull;
    return x;
}

// Morton-order triangle centroids: tris (N,3,3) row-major -> order (N,)
// int32, a stable argsort of 30-bit Morton codes (ops/cluster.py parity).
void rtx_morton_order(const float* tris, long n, int32_t* order) {
    float lo[3] = {3e38f, 3e38f, 3e38f};
    float hi[3] = {-3e38f, -3e38f, -3e38f};
    for (long i = 0; i < n * 3; ++i) {
        for (int c = 0; c < 3; ++c) {
            float v = tris[3 * i + c];
            lo[c] = std::min(lo[c], v);
            hi[c] = std::max(hi[c], v);
        }
    }
    std::vector<std::pair<uint64_t, int32_t>> keyed(n);
    for (long i = 0; i < n; ++i) {
        uint64_t code = 0;
        for (int c = 0; c < 3; ++c) {
            float centroid = (tris[9 * i + c] + tris[9 * i + 3 + c] +
                              tris[9 * i + 6 + c]) / 3.0f;
            float extent = std::max(hi[c] - lo[c], 1e-30f);
            float q = (centroid - lo[c]) / extent * 1024.0f;
            uint32_t qi = (uint32_t)std::min(std::max(q, 0.0f), 1023.0f);
            code |= expand_bits(qi) << (2 - c);
        }
        keyed[i] = {code, (int32_t)i};
    }
    std::stable_sort(keyed.begin(), keyed.end(),
                     [](const auto& a, const auto& b) { return a.first < b.first; });
    for (long i = 0; i < n; ++i) order[i] = keyed[i].second;
}

}  // extern "C"
