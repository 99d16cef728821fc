/* fastloader.c — native data-path kernels for the host-side runtime.
 *
 * The TPU owns the math; the host side of the training loop (tokenizing a
 * corpus, gathering random batch windows) is plain memory movement, which
 * Python does slowly. These are the C equivalents, loaded via ctypes
 * (linalg_tpu/native/loader.py) with a pure-Python fallback when no
 * compiler is available.
 *
 * Capability notes: encode_ascii implements CharTokenizer.encode semantics
 * (lookup-table vocab, drop-unknown) for byte text; gather_windows
 * implements the reference's random-window batching (gpt.py:245-251).
 */

#include <stdint.h>
#include <stddef.h>

/* Map each byte of `text` through `lut` (256 entries, -1 = unknown).
 * drop_unknown != 0: skip unknowns; otherwise emit -1 sentinels.
 * Returns the number of ids written. */
int64_t encode_ascii(const unsigned char *text, int64_t n,
                     const int32_t *lut, int drop_unknown, int32_t *out) {
    int64_t w = 0;
    for (int64_t i = 0; i < n; i++) {
        int32_t id = lut[text[i]];
        if (id < 0) {
            if (drop_unknown) continue;
            out[w++] = -1;
        } else {
            out[w++] = id;
        }
    }
    return w;
}

/* Count vocabulary: set present[b] = 1 for every byte in text. */
void byte_histogram(const unsigned char *text, int64_t n, int64_t *counts) {
    for (int64_t i = 0; i < n; i++) counts[text[i]]++;
}

/* Gather B windows of length T (x) and their shift-by-one targets (y)
 * from ids[L], starting at starts[B]. Caller guarantees
 * starts[i] + T + 1 <= L. */
void gather_windows(const int32_t *ids, int64_t L, const int64_t *starts,
                    int64_t B, int64_t T, int32_t *x, int32_t *y) {
    (void)L;
    for (int64_t b = 0; b < B; b++) {
        const int32_t *src = ids + starts[b];
        int32_t *xb = x + b * T;
        int32_t *yb = y + b * T;
        for (int64_t t = 0; t < T; t++) {
            xb[t] = src[t];
            yb[t] = src[t + 1];
        }
    }
}
