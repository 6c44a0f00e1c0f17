// Fast confusion-matrix accumulation for Cityscapes-style PNG scoring.
//
// Native-tier parity with the reference's only native component: the optional
// Cython `addToConfusionMatrix` fast path from cityscapesscripts
// (`evaluation/cs_eval.py:15-21`), here as a dependency-free C++ kernel with
// a ctypes binding (`ccdm_tpu/native/__init__.py`) and a NumPy fallback.
//
// Build: make -C ccdm_tpu/native   (produces libccdm_native.so)

#include <cstdint>

extern "C" {

// cm is a [n_ids * n_ids] row-major int64 matrix indexed [gt, pred].
void add_to_confusion_matrix(const uint8_t* gt, const uint8_t* pred,
                             int64_t n_pixels, int64_t n_ids, int64_t* cm) {
    for (int64_t i = 0; i < n_pixels; ++i) {
        ++cm[static_cast<int64_t>(gt[i]) * n_ids + pred[i]];
    }
}

// Same, for int32 class maps (train-id space confusion matrices).
void add_to_confusion_matrix_i32(const int32_t* gt, const int32_t* pred,
                                 int64_t n_pixels, int64_t n_ids, int64_t* cm) {
    for (int64_t i = 0; i < n_pixels; ++i) {
        ++cm[static_cast<int64_t>(gt[i]) * n_ids + pred[i]];
    }
}

// Batched one-hot IoU intersection/union counts for GED-style pairwise
// distances on host (small sample sets), avoiding the O(S*S'*P) bool
// broadcast allocation of a pure-NumPy implementation.
// x: [sx, p] uint8 class maps, y: [sy, p]; out_inter/out_union:
// [sx * sy * n_classes] int64, indexed [ix, iy, c].
void pairwise_intersection_union(const uint8_t* x, const uint8_t* y,
                                 int64_t sx, int64_t sy, int64_t p,
                                 int64_t n_classes,
                                 int64_t* out_inter, int64_t* out_union) {
    // per-sample class counts
    for (int64_t ix = 0; ix < sx; ++ix) {
        for (int64_t iy = 0; iy < sy; ++iy) {
            int64_t* inter = out_inter + (ix * sy + iy) * n_classes;
            int64_t* uni = out_union + (ix * sy + iy) * n_classes;
            const uint8_t* xr = x + ix * p;
            const uint8_t* yr = y + iy * p;
            for (int64_t i = 0; i < p; ++i) {
                const uint8_t a = xr[i];
                const uint8_t b = yr[i];
                if (a == b) {
                    ++inter[a];
                    ++uni[a];
                } else {
                    ++uni[a];
                    ++uni[b];
                }
            }
        }
    }
}

}  // extern "C"
