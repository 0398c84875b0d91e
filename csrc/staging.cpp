// Native host-side audio staging for the streaming server.
//
// The serving hot loop feeds S concurrent sessions; each websocket frame
// appends PCM to a per-session staging buffer and each engine tick pops one
// fixed-size chunk per session. This library provides:
//   - lock-free single-producer/single-consumer float ring buffers
//     (append amortized O(1) vs numpy-concatenate's O(total) per frame),
//   - batched int16 -> float32 conversion with configurable scale
//     (1/32767, the reference's normalization, speechcatcher.py:418-421),
//   - short-term energy for host-side voice-activity heuristics.
//
// Exposed as a plain C ABI for ctypes (no pybind11 dependency).
//
// Build: g++ -O3 -march=native -shared -fPIC staging.cpp -o libstaging.so

#include <atomic>
#include <cstdint>
#include <cstring>
#include <cmath>
#include <new>

namespace {

struct Ring {
    float* data;
    int64_t capacity;
    std::atomic<int64_t> head;  // write position (total floats written)
    std::atomic<int64_t> tail;  // read position (total floats read)
};

}  // namespace

extern "C" {

void* ring_create(int64_t capacity) {
    Ring* r = new (std::nothrow) Ring;
    if (!r) return nullptr;
    r->data = new (std::nothrow) float[capacity];
    if (!r->data) {
        delete r;
        return nullptr;
    }
    r->capacity = capacity;
    r->head.store(0);
    r->tail.store(0);
    return r;
}

void ring_destroy(void* handle) {
    Ring* r = static_cast<Ring*>(handle);
    if (!r) return;
    delete[] r->data;
    delete r;
}

int64_t ring_available(void* handle) {
    Ring* r = static_cast<Ring*>(handle);
    return r->head.load(std::memory_order_acquire) -
           r->tail.load(std::memory_order_acquire);
}

int64_t ring_free_space(void* handle) {
    Ring* r = static_cast<Ring*>(handle);
    return r->capacity - ring_available(handle);
}

// Convert int16 PCM to float32 (scaled) and append. Returns samples written
// (may be < n when the ring is full).
int64_t ring_write_pcm16(void* handle, const int16_t* pcm, int64_t n,
                         float scale) {
    Ring* r = static_cast<Ring*>(handle);
    int64_t head = r->head.load(std::memory_order_relaxed);
    int64_t tail = r->tail.load(std::memory_order_acquire);
    int64_t space = r->capacity - (head - tail);
    if (n > space) n = space;
    for (int64_t i = 0; i < n; ++i) {
        r->data[(head + i) % r->capacity] = pcm[i] * scale;
    }
    r->head.store(head + n, std::memory_order_release);
    return n;
}

// Append float32 samples directly.
int64_t ring_write_f32(void* handle, const float* x, int64_t n) {
    Ring* r = static_cast<Ring*>(handle);
    int64_t head = r->head.load(std::memory_order_relaxed);
    int64_t tail = r->tail.load(std::memory_order_acquire);
    int64_t space = r->capacity - (head - tail);
    if (n > space) n = space;
    for (int64_t i = 0; i < n; ++i) {
        r->data[(head + i) % r->capacity] = x[i];
    }
    r->head.store(head + n, std::memory_order_release);
    return n;
}

// Pop exactly n samples into out; returns n on success, 0 if insufficient.
int64_t ring_read(void* handle, float* out, int64_t n) {
    Ring* r = static_cast<Ring*>(handle);
    int64_t head = r->head.load(std::memory_order_acquire);
    int64_t tail = r->tail.load(std::memory_order_relaxed);
    if (head - tail < n) return 0;
    for (int64_t i = 0; i < n; ++i) {
        out[i] = r->data[(tail + i) % r->capacity];
    }
    r->tail.store(tail + n, std::memory_order_release);
    return n;
}

// Batched int16 -> float32 conversion.
void pcm16_to_f32(const int16_t* in, float* out, int64_t n, float scale) {
    for (int64_t i = 0; i < n; ++i) out[i] = in[i] * scale;
}

// Mean squared energy of int16 PCM (for host-side VAD heuristics).
double pcm16_energy(const int16_t* in, int64_t n) {
    double acc = 0.0;
    for (int64_t i = 0; i < n; ++i) {
        double v = in[i] / 32768.0;
        acc += v * v;
    }
    return n ? acc / n : 0.0;
}

}  // extern "C"
