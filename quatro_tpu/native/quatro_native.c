/* Native host-side data path for quatro-tpu.
 *
 * The reference's IO + cloud plumbing is C++ (KITTI fread loop,
 * examples/run_global_registration.cpp:377-402; PCL cloud copies throughout).
 * The TPU pipeline's host-side analog is this small C library: zero-copy
 * scan loading and multithreaded padded-batch packing, so feeding the chip
 * never bottlenecks on Python loops.
 *
 * Exposed via ctypes (see __init__.py) — no pybind11 dependency.
 */

#define _GNU_SOURCE
#include <fcntl.h>
#include <pthread.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

/* ---------------------------------------------------------------- KITTI IO
 * .bin files are float32 (x, y, z, intensity) quads. Returns the number of
 * points, or -1 on error. `out` must hold at least max_points*4 floats;
 * when out is NULL only the count is returned. */
long quatro_load_kitti_bin(const char *path, float *out, long max_points) {
    int fd = open(path, O_RDONLY);
    if (fd < 0) return -1;
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); return -1; }
    long n_points = (long)(st.st_size / (4 * sizeof(float)));
    if (out == NULL) { close(fd); return n_points; }
    if (n_points > max_points) n_points = max_points;
    size_t bytes = (size_t)n_points * 4 * sizeof(float);

    void *map = mmap(NULL, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (map == MAP_FAILED) { close(fd); return -1; }
    memcpy(out, map, bytes);
    munmap(map, st.st_size);
    close(fd);
    return n_points;
}

/* ------------------------------------------------------- padded batch pack
 * Packs B variable-length clouds into (B, cap, 3) f32 + (B, cap) u8 mask,
 * striding past the intensity channel, parallel over clouds. */
typedef struct {
    const float *const *clouds; /* each (n_i, stride) floats */
    const long *sizes;
    long stride;        /* floats per input point (4 for kitti, 3 for xyz) */
    long cap;
    float *out_points;  /* (B, cap, 3) */
    uint8_t *out_mask;  /* (B, cap) */
    long begin, end;
} pack_job_t;

static void *pack_worker(void *arg) {
    pack_job_t *job = (pack_job_t *)arg;
    for (long b = job->begin; b < job->end; ++b) {
        const float *src = job->clouds[b];
        long n = job->sizes[b];
        if (n > job->cap) n = job->cap;
        float *dst = job->out_points + b * job->cap * 3;
        uint8_t *msk = job->out_mask + b * job->cap;
        for (long i = 0; i < n; ++i) {
            dst[i * 3 + 0] = src[i * job->stride + 0];
            dst[i * 3 + 1] = src[i * job->stride + 1];
            dst[i * 3 + 2] = src[i * job->stride + 2];
            msk[i] = 1;
        }
        memset(dst + n * 3, 0, (size_t)(job->cap - n) * 3 * sizeof(float));
        memset(msk + n, 0, (size_t)(job->cap - n));
    }
    return NULL;
}

int quatro_pack_batch(const float *const *clouds, const long *sizes, long b,
                      long stride, long cap, float *out_points,
                      uint8_t *out_mask, int n_threads) {
    if (n_threads < 1) n_threads = 1;
    if (n_threads > b) n_threads = (int)b;
    pthread_t threads[64];
    pack_job_t jobs[64];
    if (n_threads > 64) n_threads = 64;
    long chunk = (b + n_threads - 1) / n_threads;
    int started = 0;
    for (int t = 0; t < n_threads; ++t) {
        long begin = t * chunk;
        long end = begin + chunk > b ? b : begin + chunk;
        if (begin >= end) break;
        jobs[t] = (pack_job_t){clouds, sizes, stride, cap,
                               out_points, out_mask, begin, end};
        if (pthread_create(&threads[t], NULL, pack_worker, &jobs[t]) != 0)
            return -1;
        started++;
    }
    for (int t = 0; t < started; ++t) pthread_join(threads[t], NULL);
    return 0;
}
