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

/* ------------------------------------------------- async prefetching loader
 * Streaming scan loader for sequence/odometry runs: a pool of worker threads
 * reads KITTI .bin files ahead of the consumer into a bounded ring of padded
 * (cap, 3) + mask slots, delivered strictly in file order. This is the
 * runtime analog of the reference's per-frame fread loop
 * (examples/run_global_registration.cpp:377-402) redesigned so host IO
 * overlaps device compute instead of serializing with it. */

enum { SLOT_EMPTY = 0, SLOT_CLAIMED = 1, SLOT_READY = 2 };

typedef struct {
    float *points;   /* (cap, 3) */
    uint8_t *mask;   /* (cap,) */
    long n_points;   /* valid points, or -1 on load error */
    long seq;        /* which file index occupies this slot */
    int state;       /* SLOT_EMPTY / SLOT_CLAIMED / SLOT_READY */
} loader_slot_t;

typedef struct quatro_loader {
    char **paths;
    long n_files;
    long cap;
    int depth;
    int n_workers;
    loader_slot_t *slots;
    pthread_t *workers;
    pthread_mutex_t mu;
    pthread_cond_t cv_produced;  /* a slot became ready */
    pthread_cond_t cv_consumed;  /* a slot became free */
    long next_to_load;           /* next file index a worker should claim */
    long next_to_emit;           /* next file index the consumer wants */
    int shutdown;
} quatro_loader_t;

static void load_into_slot(quatro_loader_t *ld, loader_slot_t *s,
                           const char *path) {
    long cap = ld->cap;
    /* read directly as (n, 4) quads into a scratch map, then strip
     * intensity while packing into the padded slot */
    int fd = open(path, O_RDONLY);
    if (fd < 0) { s->n_points = -1; return; }
    struct stat st;
    if (fstat(fd, &st) != 0) { close(fd); s->n_points = -1; return; }
    long n = (long)(st.st_size / (4 * sizeof(float)));
    if (n > cap) n = cap;
    const float *map = (const float *)mmap(NULL, st.st_size, PROT_READ,
                                           MAP_PRIVATE, fd, 0);
    if (map == MAP_FAILED) { close(fd); s->n_points = -1; return; }
    for (long i = 0; i < n; ++i) {
        s->points[i * 3 + 0] = map[i * 4 + 0];
        s->points[i * 3 + 1] = map[i * 4 + 1];
        s->points[i * 3 + 2] = map[i * 4 + 2];
        s->mask[i] = 1;
    }
    memset(s->points + n * 3, 0, (size_t)(cap - n) * 3 * sizeof(float));
    memset(s->mask + n, 0, (size_t)(cap - n));
    munmap((void *)map, st.st_size);
    close(fd);
    s->n_points = n;
}

static void *loader_worker(void *arg) {
    quatro_loader_t *ld = (quatro_loader_t *)arg;
    for (;;) {
        pthread_mutex_lock(&ld->mu);
        long idx;
        for (;;) {
            if (ld->shutdown || ld->next_to_load >= ld->n_files) {
                pthread_mutex_unlock(&ld->mu);
                return NULL;
            }
            idx = ld->next_to_load;
            /* claim idx only once its ring slot has been drained */
            loader_slot_t *s = &ld->slots[idx % ld->depth];
            if (s->state == SLOT_EMPTY) {
                ld->next_to_load++;
                s->state = SLOT_CLAIMED;
                s->seq = idx;
                break;
            }
            pthread_cond_wait(&ld->cv_consumed, &ld->mu);
        }
        pthread_mutex_unlock(&ld->mu);

        loader_slot_t *s = &ld->slots[idx % ld->depth];
        load_into_slot(ld, s, ld->paths[idx]);

        pthread_mutex_lock(&ld->mu);
        s->state = SLOT_READY;
        pthread_cond_broadcast(&ld->cv_produced);
        pthread_mutex_unlock(&ld->mu);
    }
}

quatro_loader_t *quatro_loader_create(const char *const *paths, long n_files,
                                      long capacity, int n_workers,
                                      int queue_depth) {
    if (n_files <= 0 || capacity <= 0) return NULL;
    if (n_workers < 1) n_workers = 1;
    if (n_workers > 32) n_workers = 32;
    if (queue_depth < 2) queue_depth = 2;
    if (queue_depth > n_files) queue_depth = (int)n_files;

    quatro_loader_t *ld = calloc(1, sizeof(*ld));
    if (!ld) return NULL;
    ld->paths = calloc((size_t)n_files, sizeof(char *));
    for (long i = 0; i < n_files; ++i) ld->paths[i] = strdup(paths[i]);
    ld->n_files = n_files;
    ld->cap = capacity;
    ld->depth = queue_depth;
    ld->n_workers = n_workers;
    ld->slots = calloc((size_t)queue_depth, sizeof(loader_slot_t));
    for (int i = 0; i < queue_depth; ++i) {
        ld->slots[i].points = malloc((size_t)capacity * 3 * sizeof(float));
        ld->slots[i].mask = malloc((size_t)capacity);
        ld->slots[i].seq = -1;
    }
    pthread_mutex_init(&ld->mu, NULL);
    pthread_cond_init(&ld->cv_produced, NULL);
    pthread_cond_init(&ld->cv_consumed, NULL);
    ld->workers = calloc((size_t)n_workers, sizeof(pthread_t));
    for (int i = 0; i < n_workers; ++i)
        pthread_create(&ld->workers[i], NULL, loader_worker, ld);
    return ld;
}

/* Blocks until scan `next_to_emit` is ready; copies it into out_points
 * (cap*3 floats) and out_mask (cap bytes). Returns the number of valid
 * points, -1 on load error for that file, or -2 when the sequence is
 * exhausted. */
long quatro_loader_next(quatro_loader_t *ld, float *out_points,
                        uint8_t *out_mask) {
    pthread_mutex_lock(&ld->mu);
    if (ld->next_to_emit >= ld->n_files) {
        pthread_mutex_unlock(&ld->mu);
        return -2;
    }
    long idx = ld->next_to_emit;
    loader_slot_t *s = &ld->slots[idx % ld->depth];
    while (!(s->state == SLOT_READY && s->seq == idx)) {
        if (ld->shutdown) { pthread_mutex_unlock(&ld->mu); return -2; }
        pthread_cond_wait(&ld->cv_produced, &ld->mu);
    }
    long n = s->n_points;
    memcpy(out_points, s->points, (size_t)ld->cap * 3 * sizeof(float));
    memcpy(out_mask, s->mask, (size_t)ld->cap);
    s->state = SLOT_EMPTY;  /* drain: slot reusable */
    ld->next_to_emit++;
    pthread_cond_broadcast(&ld->cv_consumed);
    pthread_mutex_unlock(&ld->mu);
    return n;
}

void quatro_loader_destroy(quatro_loader_t *ld) {
    if (!ld) return;
    pthread_mutex_lock(&ld->mu);
    ld->shutdown = 1;
    pthread_cond_broadcast(&ld->cv_consumed);
    pthread_cond_broadcast(&ld->cv_produced);
    pthread_mutex_unlock(&ld->mu);
    for (int i = 0; i < ld->n_workers; ++i)
        pthread_join(ld->workers[i], NULL);
    for (int i = 0; i < ld->depth; ++i) {
        free(ld->slots[i].points);
        free(ld->slots[i].mask);
    }
    for (long i = 0; i < ld->n_files; ++i) free(ld->paths[i]);
    free(ld->paths);
    free(ld->slots);
    free(ld->workers);
    pthread_mutex_destroy(&ld->mu);
    pthread_cond_destroy(&ld->cv_produced);
    pthread_cond_destroy(&ld->cv_consumed);
    free(ld);
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
