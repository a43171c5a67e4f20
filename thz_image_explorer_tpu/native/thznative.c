/* Host-side native runtime kernels.
 *
 * The reference app's host runtime is native Rust throughout; this C library
 * is the TPU rebuild's equivalent for the host-side pieces that are not
 * array math on the device:
 *
 *   - polygon ROI rasterization with the exact semantics of
 *     `point_in_polygon` / `average_polygon_roi`
 *     (/root/reference/src/math_tools.rs:574-661), including the unsigned
 *     wrap-around arithmetic of the Rust release build (usize subtraction
 *     wraps mod 2^64), the x/y swap and the vertical flip;
 *   - a latest-wins bounded(1) command slot mirroring `send_latest_config`
 *     (/root/reference/src/config.rs:41-51) for GUI->pipeline command flow.
 *
 * Exposed via ctypes (no pybind11 in this environment).
 */

#include <stdint.h>
#include <stddef.h>
#include <string.h>
#include <stdlib.h>
#include <time.h>
#include <pthread.h>

/* Absolute CLOCK_MONOTONIC deadline, computed ONCE per wait (recomputing
 * per loop iteration would restart the timeout on every spurious or
 * raced wakeup, letting a timed take block far past timeout_ms).
 * MONOTONIC, not REALTIME: an NTP step / manual clock change must not
 * stretch a 50 ms command-queue poll into an hour-long hang (the
 * condvars are initialized with the matching clock below). */
static void thz_deadline(struct timespec *ts, long timeout_ms) {
    clock_gettime(CLOCK_MONOTONIC, ts);
    ts->tv_sec += timeout_ms / 1000;
    ts->tv_nsec += (timeout_ms % 1000) * 1000000L;
    if (ts->tv_nsec >= 1000000000L) { ts->tv_sec++; ts->tv_nsec -= 1000000000L; }
}

/* Condvar bound to CLOCK_MONOTONIC so timedwait deadlines use the same
 * clock thz_deadline stamps. */
static void thz_cond_init_monotonic(pthread_cond_t *cv) {
    pthread_condattr_t attr;
    pthread_condattr_init(&attr);
    pthread_condattr_setclock(&attr, CLOCK_MONOTONIC);
    pthread_cond_init(cv, &attr);
    pthread_condattr_destroy(&attr);
}

/* ------------------------------------------------------------------ */
/* Polygon rasterization                                               */
/* ------------------------------------------------------------------ */

/* Ray-cast with u64 wrap-around semantics (math_tools.rs:574-591). */
static int point_in_polygon_u64(uint64_t x, uint64_t y,
                                const uint64_t *px, const uint64_t *py,
                                size_t n) {
    int inside = 0;
    size_t j = n - 1;
    for (size_t i = 0; i < n; i++) {
        uint64_t xi = px[i], yi = py[i];
        uint64_t xj = px[j], yj = py[j];
        int cond = (yi > y) != (yj > y);
        if (cond) {
            /* all ops wrap mod 2^64 like Rust release-mode usize */
            uint64_t den = yj - yi;           /* nonzero given cond */
            uint64_t t = (xj - xi) * (y - yi);
            uint64_t val = t / den + xi;
            if (x < val)
                inside = !inside;
        }
        j = i;
    }
    return inside;
}

/* Build the ROI mask over the data grid.
 *
 * data is indexed data[y_size - y - 1, x, z] by the reference
 * (math_tools.rs:640-648) where y_size = shape[0], x_size = shape[1];
 * mask has shape (shape0, shape1) in C order and mask[y_size-1-y, x] = 1
 * for every (x, y) inside the polygon's clamped bounding box that passes
 * the ray cast. Polygon coords are pre-divided by `scaling` (integer div,
 * math_tools.rs:604-609).
 *
 * Returns the number of pixels set.
 */
long long thz_polygon_mask(const uint64_t *poly_x_in, const uint64_t *poly_y_in,
                           size_t n_vertices, size_t shape0, size_t shape1,
                           uint64_t scaling, uint8_t *mask /* shape0*shape1 */) {
    if (n_vertices == 0 || shape0 == 0 || shape1 == 0 || scaling == 0)
        return 0;

    uint64_t *px = (uint64_t *)malloc(n_vertices * sizeof(uint64_t));
    uint64_t *py = (uint64_t *)malloc(n_vertices * sizeof(uint64_t));
    if (!px || !py) { free(px); free(py); return -1; }
    for (size_t i = 0; i < n_vertices; i++) {
        px[i] = poly_x_in[i] / scaling;
        py[i] = poly_y_in[i] / scaling;
    }

    uint64_t x_size = shape1;  /* x/y swapped (math_tools.rs:611-614) */
    uint64_t y_size = shape0;

    uint64_t x_min = UINT64_MAX, y_min = UINT64_MAX, x_max = 0, y_max = 0;
    for (size_t i = 0; i < n_vertices; i++) {
        if (px[i] < x_min) x_min = px[i];
        if (py[i] < y_min) y_min = py[i];
        if (px[i] > x_max) x_max = px[i];
        if (py[i] > y_max) y_max = py[i];
    }
    /* clamp to array bounds (math_tools.rs:633-637) */
    if (x_min > x_size - 1) x_min = x_size - 1;
    if (y_min > y_size - 1) y_min = y_size - 1;
    if (x_max > x_size - 1) x_max = x_size - 1;
    if (y_max > y_size - 1) y_max = y_size - 1;

    memset(mask, 0, shape0 * shape1);
    long long count = 0;
    for (uint64_t y = y_min; y <= y_max; y++) {
        for (uint64_t x = x_min; x <= x_max; x++) {
            if (point_in_polygon_u64(x, y, px, py, n_vertices)) {
                mask[(y_size - y - 1) * shape1 + x] = 1;
                count++;
            }
        }
    }
    free(px);
    free(py);
    return count;
}

/* ------------------------------------------------------------------ */
/* Latest-wins command slot (config.rs:41-51)                          */
/* ------------------------------------------------------------------ */

typedef struct {
    pthread_mutex_t mu;
    pthread_cond_t cv;
    uint64_t seq;        /* id of the command currently in the slot */
    int occupied;
    int closed;
} thz_cmd_slot;

void *thz_cmd_slot_new(void) {
    thz_cmd_slot *s = (thz_cmd_slot *)calloc(1, sizeof(thz_cmd_slot));
    if (!s) return NULL;
    pthread_mutex_init(&s->mu, NULL);
    thz_cond_init_monotonic(&s->cv);
    return s;
}

void thz_cmd_slot_free(void *p) {
    thz_cmd_slot *s = (thz_cmd_slot *)p;
    pthread_mutex_destroy(&s->mu);
    pthread_cond_destroy(&s->cv);
    free(s);
}

/* Put a command id; replaces any pending one (drop-oldest). */
void thz_cmd_slot_put(void *p, uint64_t seq) {
    thz_cmd_slot *s = (thz_cmd_slot *)p;
    pthread_mutex_lock(&s->mu);
    s->seq = seq;
    s->occupied = 1;
    pthread_cond_signal(&s->cv);
    pthread_mutex_unlock(&s->mu);
}

/* Blocking take with timeout in ms; returns 1 and sets *seq on success,
 * 0 on timeout, -1 if closed. timeout_ms < 0 waits forever. */
int thz_cmd_slot_take(void *p, long timeout_ms, uint64_t *seq) {
    thz_cmd_slot *s = (thz_cmd_slot *)p;
    struct timespec ts;
    if (timeout_ms >= 0) thz_deadline(&ts, timeout_ms);
    pthread_mutex_lock(&s->mu);
    while (!s->occupied && !s->closed) {
        if (timeout_ms < 0) {
            pthread_cond_wait(&s->cv, &s->mu);
        } else if (pthread_cond_timedwait(&s->cv, &s->mu, &ts) != 0) {
            /* Deadline passed — but decide from the PREDICATE, under the
             * lock: a put() racing the expiry may have filled the slot,
             * and returning 0 here would misreport a pending command as
             * "none" for a whole poll period. */
            break;
        }
    }
    if (s->occupied) {
        *seq = s->seq;
        s->occupied = 0;
        pthread_mutex_unlock(&s->mu);
        return 1;
    }
    int closed = s->closed; /* read under the lock */
    pthread_mutex_unlock(&s->mu);
    return closed ? -1 : 0;
}

void thz_cmd_slot_close(void *p) {
    thz_cmd_slot *s = (thz_cmd_slot *)p;
    pthread_mutex_lock(&s->mu);
    s->closed = 1;
    pthread_cond_broadcast(&s->cv);
    pthread_mutex_unlock(&s->mu);
}

/* Drain: returns 1 + clears slot if a command was pending (abort drain,
 * data_thread.rs:163-172). */
int thz_cmd_slot_drain(void *p) {
    thz_cmd_slot *s = (thz_cmd_slot *)p;
    pthread_mutex_lock(&s->mu);
    int had = s->occupied;
    s->occupied = 0;
    pthread_mutex_unlock(&s->mu);
    return had;
}

/* ------------------------------------------------------------------ */
/* Unbounded MPSC command FIFO                                         */
/* ------------------------------------------------------------------ */

/* The reference routes ROI operations over a *dedicated unbounded*
 * channel (config.rs:296-299, main.rs:299-302) so that one-shot commands
 * can never be coalesced away; only lossy ConfigCommands ride the
 * bounded(1) slot above. This queue is the unbounded lane: a condvar'd
 * FIFO of u64 sequence numbers (payloads stay on the Python side, keyed
 * by seq). Per-key latest-wins coalescing is implemented above it by
 * replacing the payload of an already-queued seq in place, which keeps
 * losslessness for distinct commands while sliders still coalesce. */

typedef struct thz_q_node {
    uint64_t seq;
    struct thz_q_node *next;
} thz_q_node;

typedef struct {
    pthread_mutex_t mu;
    pthread_cond_t cv;
    thz_q_node *head, *tail;
    size_t size;
    int closed;
} thz_cmd_queue;

void *thz_cmd_queue_new(void) {
    thz_cmd_queue *q = (thz_cmd_queue *)calloc(1, sizeof(thz_cmd_queue));
    if (!q) return NULL;
    pthread_mutex_init(&q->mu, NULL);
    thz_cond_init_monotonic(&q->cv);
    return q;
}

static void thz_cmd_queue_clear_locked(thz_cmd_queue *q) {
    thz_q_node *n = q->head;
    while (n) {
        thz_q_node *next = n->next;
        free(n);
        n = next;
    }
    q->head = q->tail = NULL;
    q->size = 0;
}

void thz_cmd_queue_free(void *p) {
    thz_cmd_queue *q = (thz_cmd_queue *)p;
    pthread_mutex_lock(&q->mu);
    thz_cmd_queue_clear_locked(q);
    pthread_mutex_unlock(&q->mu);
    pthread_mutex_destroy(&q->mu);
    pthread_cond_destroy(&q->cv);
    free(q);
}

/* Append a seq; returns 0 on allocation failure, 1 otherwise. */
int thz_cmd_queue_push(void *p, uint64_t seq) {
    thz_cmd_queue *q = (thz_cmd_queue *)p;
    thz_q_node *n = (thz_q_node *)malloc(sizeof(thz_q_node));
    if (!n) return 0;
    n->seq = seq;
    n->next = NULL;
    pthread_mutex_lock(&q->mu);
    if (q->tail)
        q->tail->next = n;
    else
        q->head = n;
    q->tail = n;
    q->size++;
    pthread_cond_signal(&q->cv);
    pthread_mutex_unlock(&q->mu);
    return 1;
}

/* Blocking pop with timeout in ms; 1 + *seq on success, 0 on timeout,
 * -1 when closed and empty. timeout_ms < 0 waits forever. */
int thz_cmd_queue_pop(void *p, long timeout_ms, uint64_t *seq) {
    thz_cmd_queue *q = (thz_cmd_queue *)p;
    struct timespec ts;
    if (timeout_ms >= 0) thz_deadline(&ts, timeout_ms);
    pthread_mutex_lock(&q->mu);
    while (!q->head && !q->closed) {
        if (timeout_ms < 0) {
            pthread_cond_wait(&q->cv, &q->mu);
        } else if (pthread_cond_timedwait(&q->cv, &q->mu, &ts) != 0) {
            break; /* deadline passed: decide from the predicate below */
        }
    }
    if (!q->head) { /* timed out, or closed and empty */
        int closed = q->closed;
        pthread_mutex_unlock(&q->mu);
        return closed ? -1 : 0;
    }
    thz_q_node *n = q->head;
    *seq = n->seq;
    q->head = n->next;
    if (!q->head) q->tail = NULL;
    q->size--;
    free(n);
    pthread_mutex_unlock(&q->mu);
    return 1;
}

/* Drop every queued seq (abort drain); returns how many were dropped. */
long long thz_cmd_queue_drain(void *p) {
    thz_cmd_queue *q = (thz_cmd_queue *)p;
    pthread_mutex_lock(&q->mu);
    long long had = (long long)q->size;
    thz_cmd_queue_clear_locked(q);
    pthread_mutex_unlock(&q->mu);
    return had;
}

long long thz_cmd_queue_size(void *p) {
    thz_cmd_queue *q = (thz_cmd_queue *)p;
    pthread_mutex_lock(&q->mu);
    long long n = (long long)q->size;
    pthread_mutex_unlock(&q->mu);
    return n;
}

void thz_cmd_queue_close(void *p) {
    thz_cmd_queue *q = (thz_cmd_queue *)p;
    pthread_mutex_lock(&q->mu);
    q->closed = 1;
    pthread_cond_broadcast(&q->cv);
    pthread_mutex_unlock(&q->mu);
}
