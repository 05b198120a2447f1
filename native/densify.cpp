// Native label-densification engine: exact k-NN on a uniform hash grid with
// OpenMP, plus majority-vote label pooling and label->RGB colorization.
//
// TPU-native replacement for the reference's InterpolateLabelWithColor custom
// op (reference: tf_ops/tf_interpolate.cpp:52-185, Open3D KDTreeFlann +
// OpenMP). The dense cloud can be hundreds of millions of points — far too
// large for brute-force device KNN — so this stays on the host, streaming
// dense points through a spatial grid built once over the sparse cloud.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this toolchain).
//
// Exactness: for each query we expand cubic shells of grid cells outward,
// maintaining the current k-th best squared distance; we stop once every
// cell in the next shell is provably farther than the k-th best. This yields
// exactly the same neighbor set as a KD-tree search (modulo equal-distance
// ordering).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct Grid {
    double min[3];
    double cell;          // cell edge length
    int64_t dims[3];      // number of cells per axis
    std::vector<int64_t> cell_start;  // prefix offsets into point_ids
    std::vector<int64_t> point_ids;   // point indices sorted by cell
    const float* pts;     // (n, 3)
    int64_t n;

    int64_t cell_of(double x, int axis) const {
        int64_t c = (int64_t)std::floor((x - min[axis]) / cell);
        if (c < 0) c = 0;
        if (c >= dims[axis]) c = dims[axis] - 1;
        return c;
    }
    int64_t linear(int64_t cx, int64_t cy, int64_t cz) const {
        return (cx * dims[1] + cy) * dims[2] + cz;
    }
};

Grid build_grid(const float* pts, int64_t n, double cell) {
    Grid g;
    g.pts = pts;
    g.n = n;
    g.cell = cell;
    double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
    for (int64_t i = 0; i < n; ++i) {
        for (int a = 0; a < 3; ++a) {
            double v = pts[i * 3 + a];
            mn[a] = std::min(mn[a], v);
            mx[a] = std::max(mx[a], v);
        }
    }
    for (int a = 0; a < 3; ++a) {
        g.min[a] = mn[a];
        g.dims[a] = std::max<int64_t>(1, (int64_t)std::floor((mx[a] - mn[a]) / cell) + 1);
    }
    int64_t ncells = g.dims[0] * g.dims[1] * g.dims[2];
    std::vector<int64_t> counts(ncells + 1, 0);
    std::vector<int64_t> cell_idx(n);
    for (int64_t i = 0; i < n; ++i) {
        int64_t cx = g.cell_of(pts[i * 3 + 0], 0);
        int64_t cy = g.cell_of(pts[i * 3 + 1], 1);
        int64_t cz = g.cell_of(pts[i * 3 + 2], 2);
        cell_idx[i] = g.linear(cx, cy, cz);
        counts[cell_idx[i] + 1]++;
    }
    for (int64_t c = 0; c < ncells; ++c) counts[c + 1] += counts[c];
    g.cell_start = counts;
    g.point_ids.resize(n);
    std::vector<int64_t> cursor(g.cell_start.begin(), g.cell_start.end() - 1);
    for (int64_t i = 0; i < n; ++i) g.point_ids[cursor[cell_idx[i]]++] = i;
    return g;
}

// k nearest neighbors of (qx,qy,qz); returns count found, fills idx/d2 sorted
// ascending by squared distance.
int knn_query(const Grid& g, double qx, double qy, double qz, int k,
              int64_t* out_idx, double* out_d2) {
    // Small insertion-sorted buffer (k <= 32 in practice).
    int found = 0;
    double worst = std::numeric_limits<double>::infinity();

    auto consider = [&](int64_t pid) {
        double dx = qx - g.pts[pid * 3 + 0];
        double dy = qy - g.pts[pid * 3 + 1];
        double dz = qz - g.pts[pid * 3 + 2];
        double d2 = dx * dx + dy * dy + dz * dz;
        if (found < k) {
            int j = found++;
            while (j > 0 && out_d2[j - 1] > d2) {
                out_d2[j] = out_d2[j - 1];
                out_idx[j] = out_idx[j - 1];
                --j;
            }
            out_d2[j] = d2;
            out_idx[j] = pid;
            if (found == k) worst = out_d2[k - 1];
        } else if (d2 < worst) {
            int j = k - 1;
            while (j > 0 && out_d2[j - 1] > d2) {
                out_d2[j] = out_d2[j - 1];
                out_idx[j] = out_idx[j - 1];
                --j;
            }
            out_d2[j] = d2;
            out_idx[j] = pid;
            worst = out_d2[k - 1];
        }
    };

    int64_t ccx = g.cell_of(qx, 0), ccy = g.cell_of(qy, 1), ccz = g.cell_of(qz, 2);
    int64_t max_shell =
        std::max({g.dims[0], g.dims[1], g.dims[2]});
    for (int64_t shell = 0; shell <= max_shell; ++shell) {
        // Early exit: every cell at this shell is at least (shell-1)*cell
        // away from the query point (conservative bound).
        if (found == k) {
            double bound = (double)(shell - 1) * g.cell;
            if (bound > 0 && bound * bound > worst) break;
        }
        int64_t x0 = ccx - shell, x1 = ccx + shell;
        int64_t y0 = ccy - shell, y1 = ccy + shell;
        int64_t z0 = ccz - shell, z1 = ccz + shell;
        for (int64_t cx = std::max<int64_t>(0, x0);
             cx <= std::min(g.dims[0] - 1, x1); ++cx) {
            bool xedge = (cx == x0 || cx == x1);
            for (int64_t cy = std::max<int64_t>(0, y0);
                 cy <= std::min(g.dims[1] - 1, y1); ++cy) {
                bool yedge = (cy == y0 || cy == y1);
                for (int64_t cz = std::max<int64_t>(0, z0);
                     cz <= std::min(g.dims[2] - 1, z1); ++cz) {
                    bool zedge = (cz == z0 || cz == z1);
                    if (shell > 0 && !xedge && !yedge && !zedge) continue;
                    int64_t c = g.linear(cx, cy, cz);
                    for (int64_t p = g.cell_start[c]; p < g.cell_start[c + 1]; ++p)
                        consider(g.point_ids[p]);
                }
            }
        }
    }
    return found;
}

const uint8_t kLabelColors[9][3] = {
    {255, 255, 255}, {0, 0, 255},   {128, 0, 0}, {255, 0, 255}, {0, 128, 0},
    {255, 0, 0},     {128, 0, 128}, {0, 0, 128}, {128, 128, 0}};

}  // namespace

extern "C" {

// KNN majority-vote densification with colors.
// sparse_points (ns,3) float32, sparse_labels (ns) int32,
// dense_points (nd,3) float32 -> dense_labels (nd) int32,
// dense_colors (nd,3) uint8. cell<=0 -> auto cell size.
// Returns 0 on success.
int densify_labels(const float* sparse_points, const int32_t* sparse_labels,
                   int64_t num_sparse, const float* dense_points,
                   int64_t num_dense, int knn, double cell,
                   int32_t* dense_labels, uint8_t* dense_colors) {
    if (num_sparse <= 0 || knn <= 0 || knn > 64) return 1;
    if (cell <= 0) {
        // Heuristic: ~2 points per cell on average for uniform density.
        double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
        for (int64_t i = 0; i < num_sparse; ++i)
            for (int a = 0; a < 3; ++a) {
                double v = sparse_points[i * 3 + a];
                mn[a] = std::min(mn[a], v);
                mx[a] = std::max(mx[a], v);
            }
        double vol = std::max(1e-12, (mx[0] - mn[0]) * (mx[1] - mn[1]) *
                                         (mx[2] - mn[2]));
        cell = std::cbrt(vol * 2.0 / (double)num_sparse);
        if (!(cell > 0)) cell = 1.0;
    }
    Grid grid = build_grid(sparse_points, num_sparse, cell);

#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t j = 0; j < num_dense; ++j) {
        int64_t nn_idx[64];
        double nn_d2[64];
        int found = knn_query(grid, dense_points[j * 3 + 0],
                              dense_points[j * 3 + 1], dense_points[j * 3 + 2],
                              knn, nn_idx, nn_d2);
        // Majority vote, ties -> first label to reach max count in distance
        // order (tf_interpolate.cpp:100-112 semantics).
        int32_t best_label = -1;
        int best_count = 0;
        int32_t labs[64];
        int counts[64];
        int nuniq = 0;
        for (int t = 0; t < found; ++t) {
            int32_t lab = sparse_labels[nn_idx[t]];
            int u = 0;
            for (; u < nuniq; ++u)
                if (labs[u] == lab) break;
            if (u == nuniq) {
                labs[nuniq] = lab;
                counts[nuniq] = 0;
                ++nuniq;
            }
            if (++counts[u] > best_count) {
                best_count = counts[u];
                best_label = lab;
            }
        }
        dense_labels[j] = best_label;
        if (best_label >= 0 && best_label < 9) {
            dense_colors[j * 3 + 0] = kLabelColors[best_label][0];
            dense_colors[j * 3 + 1] = kLabelColors[best_label][1];
            dense_colors[j * 3 + 2] = kLabelColors[best_label][2];
        } else {
            dense_colors[j * 3 + 0] = 0;
            dense_colors[j * 3 + 1] = 0;
            dense_colors[j * 3 + 2] = 0;
        }
    }
    return 0;
}

// Exact k-NN: indices + squared distances (float64) for each query.
int knn_search(const float* data_points, int64_t num_data,
               const float* query_points, int64_t num_query, int knn,
               double cell, int64_t* out_idx, double* out_d2) {
    if (num_data <= 0 || knn <= 0 || knn > 64) return 1;
    if (cell <= 0) {
        double mn[3] = {1e300, 1e300, 1e300}, mx[3] = {-1e300, -1e300, -1e300};
        for (int64_t i = 0; i < num_data; ++i)
            for (int a = 0; a < 3; ++a) {
                double v = data_points[i * 3 + a];
                mn[a] = std::min(mn[a], v);
                mx[a] = std::max(mx[a], v);
            }
        double vol = std::max(1e-12, (mx[0] - mn[0]) * (mx[1] - mn[1]) *
                                         (mx[2] - mn[2]));
        cell = std::cbrt(vol * 2.0 / (double)num_data);
        if (!(cell > 0)) cell = 1.0;
    }
    Grid grid = build_grid(data_points, num_data, cell);
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t j = 0; j < num_query; ++j) {
        int found =
            knn_query(grid, query_points[j * 3 + 0], query_points[j * 3 + 1],
                      query_points[j * 3 + 2], knn, out_idx + j * knn,
                      out_d2 + j * knn);
        for (int t = found; t < knn; ++t) {
            out_idx[j * knn + t] = found > 0 ? out_idx[j * knn + found - 1] : 0;
            out_d2[j * knn + t] =
                found > 0 ? out_d2[j * knn + found - 1] : 0.0;
        }
    }
    return 0;
}

// Voxel downsample with trace: assigns each point its voxel id (row-major
// over the occupied bounding grid); host Python aggregates. Provided native
// for very large clouds where np.unique sorting dominates.
int voxel_assign(const float* points, int64_t n, double voxel,
                 double min_x, double min_y, double min_z,
                 int64_t dim_y, int64_t dim_z, int64_t* voxel_ids) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
    for (int64_t i = 0; i < n; ++i) {
        int64_t cx = (int64_t)std::floor((points[i * 3 + 0] - min_x) / voxel);
        int64_t cy = (int64_t)std::floor((points[i * 3 + 1] - min_y) / voxel);
        int64_t cz = (int64_t)std::floor((points[i * 3 + 2] - min_z) / voxel);
        voxel_ids[i] = (cx * dim_y + cy) * dim_z + cz;
    }
    return 0;
}

}  // extern "C"
