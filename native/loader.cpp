// Native runtime: threaded image prefetcher + FAST LUT builder.
//
// TPU-native counterpart of the reference's C++ runtime pieces: the dataset
// drivers' image feeding (Examples/Stereo/stereo_euroc.cpp main loop) and the
// host-side precompute in ORB_GPU's constructor (orb_gpu.cpp:366-436 LUT).
// The SLAM hot path is JAX/XLA; this keeps the host data path off the Python
// interpreter: a pthread worker pool decodes frames ahead of the tracker into
// a bounded ring buffer (double buffering, like SyncedMem's async copies).
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this image).
//
// Supported formats: PGM (P5, 8-bit), raw row-major uint8 (.raw with known
// size). PNG decoding stays in Python (PIL) — the prefetcher can still run
// those through a Python callback fallback.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>
#include <thread>
#include <mutex>
#include <condition_variable>
#include <atomic>

namespace {

struct Frame {
    std::vector<uint8_t> data;
    int height = 0;
    int width = 0;
    int index = -1;
    bool ok = false;
};

bool decode_pgm(const char* path, Frame* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    char magic[3] = {0};
    if (fscanf(f, "%2s", magic) != 1 || strcmp(magic, "P5") != 0) {
        fclose(f);
        return false;
    }
    // skip comments/whitespace
    int vals[3];
    int got = 0;
    while (got < 3) {
        int c = fgetc(f);
        if (c == '#') {
            while (c != '\n' && c != EOF) c = fgetc(f);
        } else if (c >= '0' && c <= '9') {
            ungetc(c, f);
            if (fscanf(f, "%d", &vals[got]) != 1) break;
            got++;
        } else if (c == EOF) {
            break;
        }
    }
    if (got < 3 || vals[2] > 255) {
        fclose(f);
        return false;
    }
    fgetc(f);  // single whitespace after maxval
    out->width = vals[0];
    out->height = vals[1];
    out->data.resize((size_t)vals[0] * vals[1]);
    size_t n = fread(out->data.data(), 1, out->data.size(), f);
    fclose(f);
    out->ok = (n == out->data.size());
    return out->ok;
}

bool decode_raw(const char* path, int height, int width, Frame* out) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;
    out->height = height;
    out->width = width;
    out->data.resize((size_t)height * width);
    size_t n = fread(out->data.data(), 1, out->data.size(), f);
    fclose(f);
    out->ok = (n == out->data.size());
    return out->ok;
}

struct Loader {
    std::vector<std::string> paths;
    int height = 0, width = 0;      // for raw mode; 0 = PGM self-describing
    size_t capacity = 8;            // ring depth
    std::vector<Frame> ring;
    size_t next_decode = 0;         // next index handed to a worker
    size_t next_emit = 0;           // next index the consumer wants
    std::mutex mu;
    std::condition_variable cv_space, cv_ready;
    std::vector<std::thread> workers;
    std::atomic<bool> stop{false};
    std::vector<bool> ready;

    void worker() {
        for (;;) {
            size_t idx;
            {
                std::unique_lock<std::mutex> lk(mu);
                cv_space.wait(lk, [&] {
                    return stop || (next_decode < paths.size() &&
                                    next_decode < next_emit + capacity);
                });
                if (stop || next_decode >= paths.size()) return;
                idx = next_decode++;
            }
            Frame fr;
            fr.index = (int)idx;
            const std::string& p = paths[idx];
            if (p.size() > 4 && p.compare(p.size() - 4, 4, ".pgm") == 0) {
                decode_pgm(p.c_str(), &fr);
            } else {
                decode_raw(p.c_str(), height, width, &fr);
            }
            {
                std::unique_lock<std::mutex> lk(mu);
                ring[idx % capacity] = std::move(fr);
                ready[idx % capacity] = true;
                cv_ready.notify_all();
            }
        }
    }
};

}  // namespace

extern "C" {

void* loader_create(const char** paths, int n_paths, int height, int width,
                    int n_threads, int ring_capacity) {
    Loader* L = new Loader();
    L->paths.assign(paths, paths + n_paths);
    L->height = height;
    L->width = width;
    L->capacity = ring_capacity > 0 ? (size_t)ring_capacity : 8;
    L->ring.resize(L->capacity);
    L->ready.assign(L->capacity, false);
    int nt = n_threads > 0 ? n_threads : 2;
    for (int i = 0; i < nt; i++)
        L->workers.emplace_back([L] { L->worker(); });
    return L;
}

// Blocks until frame `index` is decoded; copies into out (h*w bytes).
// Returns 1 on success, 0 on decode failure, -1 on bad index.
int loader_get(void* handle, int index, uint8_t* out, int* height,
               int* width) {
    Loader* L = (Loader*)handle;
    if (index < 0 || (size_t)index >= L->paths.size()) return -1;
    std::unique_lock<std::mutex> lk(L->mu);
    // consumer advances the emit window — wake workers for new space
    if ((size_t)index > L->next_emit) L->next_emit = (size_t)index;
    L->cv_space.notify_all();
    size_t slot = (size_t)index % L->capacity;
    L->cv_ready.wait(lk, [&] {
        return L->ready[slot] && L->ring[slot].index == index;
    });
    Frame& fr = L->ring[slot];
    if (!fr.ok) return 0;
    *height = fr.height;
    *width = fr.width;
    memcpy(out, fr.data.data(), fr.data.size());
    // release the slot
    L->ready[slot] = false;
    L->next_emit = (size_t)index + 1;
    L->cv_space.notify_all();
    return 1;
}

void loader_destroy(void* handle) {
    Loader* L = (Loader*)handle;
    {
        std::unique_lock<std::mutex> lk(L->mu);
        L->stop = true;
        L->cv_space.notify_all();
    }
    for (auto& t : L->workers) t.join();
    delete L;
}

// FAST segment-test LUT (reference orb_gpu.cpp:366-436 semantics; see
// jetson_slam_tpu/ops/tables.py fast_lut for the scan rules).  Fills
// out[65536] with 0/1.  Entry 0xFFFF is left 0 like the reference loop.
void fast_lut_build(int n_min, int n_max, uint8_t* out) {
    memset(out, 0, 1 << 16);
    for (int j = 0; j < 0xFFFF; j++) {
        int n_valid = 0;
        int accepted = -1;  // -1: fell off, else 0/1
        for (int k = 15; k >= 0; k--) {
            if ((j >> k) & 1) {
                n_valid++;
            } else {
                if (n_valid >= n_min && n_valid <= n_max) {
                    accepted = 1;
                    break;
                }
                n_valid = 0;
            }
        }
        if (accepted < 0) {
            for (int k = 15; k >= 0; k--) {
                if ((j >> k) & 1) n_valid++;
                else break;
            }
            accepted = (n_valid >= n_min && n_valid <= n_max) ? 1 : 0;
        }
        out[j] = (uint8_t)accepted;
    }
}

}  // extern "C"
