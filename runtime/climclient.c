/* climclient -- C host-side client for the coupling sidecar.
 *
 * Demonstrates, in a compiled language with no Python anywhere, the wire
 * protocol a Fortran/C host model (E3SM's call path into the emulator;
 * reference: online_testing/README.md section 5, which links libtorch
 * into E3SM in-process) needs to speak to the TPU sidecar
 * (climsim_tpu/online/server.py:21-28,43-45):
 *
 *   request :  little-endian u32 header {magic 0x434C4D54, n_rows,
 *              n_features} + n_rows*n_features f32 row-major payload
 *   reply   :  same framing; a 0-row reply is the server's
 *              model-execution-error sentinel.
 *
 * The protocol core really is ~20 lines (send_frame + recv_frame below);
 * the rest is argument handling and latency bookkeeping.
 *
 * Usage:
 *   climclient <host> <port> <in.f32> <n_rows> <n_features> <out.f32>
 *              [repeats]
 *
 * in.f32 holds raw little-endian f32 row-major input (n_rows x
 * n_features); the last reply's payload is written to out.f32.  With
 * repeats > 1 the same frame is sent repeatedly over one persistent
 * connection -- one physics step per round trip, the host-model usage
 * pattern -- and per-step wall latency stats print to stdout.
 */
#define _POSIX_C_SOURCE 200809L
#include <arpa/inet.h>
#include <errno.h>
#include <netdb.h>
#include <stdint.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <sys/socket.h>
#include <time.h>
#include <unistd.h>

#define MAGIC 0x434C4D54u /* "CLMT" */

static int send_all(int fd, const void *buf, size_t n) {
    const char *p = (const char *)buf;
    while (n > 0) {
        ssize_t k = write(fd, p, n);
        if (k <= 0) return -1;
        p += k;
        n -= (size_t)k;
    }
    return 0;
}

static int recv_all(int fd, void *buf, size_t n) {
    char *p = (char *)buf;
    while (n > 0) {
        ssize_t k = read(fd, p, n);
        if (k <= 0) return -1;
        p += k;
        n -= (size_t)k;
    }
    return 0;
}

/* -- the whole protocol ------------------------------------------------ */
static int send_frame(int fd, const float *x, uint32_t rows, uint32_t feats) {
    uint32_t hdr[3] = {MAGIC, rows, feats}; /* little-endian host assumed */
    if (send_all(fd, hdr, sizeof hdr)) return -1;
    return send_all(fd, x, (size_t)rows * feats * sizeof(float));
}

static float *recv_frame(int fd, uint32_t *rows, uint32_t *feats) {
    uint32_t hdr[3];
    if (recv_all(fd, hdr, sizeof hdr) || hdr[0] != MAGIC) return NULL;
    *rows = hdr[1];
    *feats = hdr[2];
    size_t n = (size_t)hdr[1] * hdr[2];
    float *y = (float *)malloc(n ? n * sizeof(float) : 1);
    if (!y || recv_all(fd, y, n * sizeof(float))) {
        free(y);
        return NULL;
    }
    return y;
}
/* ----------------------------------------------------------------------- */

static double now_ms(void) {
    struct timespec ts;
    clock_gettime(CLOCK_MONOTONIC, &ts);
    return ts.tv_sec * 1e3 + ts.tv_nsec / 1e6;
}

static int cmp_double(const void *a, const void *b) {
    double d = *(const double *)a - *(const double *)b;
    return (d > 0) - (d < 0);
}

int main(int argc, char **argv) {
    if (argc < 7) {
        fprintf(stderr,
                "usage: %s <host> <port> <in.f32> <rows> <feats> <out.f32>"
                " [repeats]\n",
                argv[0]);
        return 2;
    }
    const char *host = argv[1];
    char *end_r = NULL, *end_f = NULL;
    /* strtol, not strtoul: strtoul silently wraps "-1" to ULONG_MAX.
     * errno catches ERANGE saturation, which on ILP32 (32-bit long)
     * would otherwise slip past the UINT32_MAX comparison below. */
    errno = 0;
    long rows_l = strtol(argv[4], &end_r, 10);
    long feats_l = strtol(argv[5], &end_f, 10);
    if (errno == ERANGE || !end_r || *end_r || !end_f || *end_f ||
        rows_l <= 0 || feats_l <= 0 ||
        (unsigned long)rows_l > UINT32_MAX ||
        (unsigned long)feats_l > UINT32_MAX) {
        /* rows==0 is the server's error-sentinel shape; never send it */
        fprintf(stderr, "rows and feats must be positive integers "
                        "(got '%s' x '%s')\n", argv[4], argv[5]);
        return 2;
    }
    uint32_t rows = (uint32_t)rows_l, feats = (uint32_t)feats_l;
    long repeats = argc > 7 ? strtol(argv[7], NULL, 10) : 1;
    if (repeats < 1) repeats = 1;

    size_t n_in = (size_t)rows * feats;
    float *x = (float *)malloc(n_in * sizeof(float));
    FILE *fin = fopen(argv[3], "rb");
    if (!x || !fin || fread(x, sizeof(float), n_in, fin) != n_in) {
        fprintf(stderr, "cannot read %zu f32 from %s\n", n_in, argv[3]);
        return 1;
    }
    fclose(fin);

    struct addrinfo hints = {0}, *res;
    hints.ai_family = AF_INET;
    hints.ai_socktype = SOCK_STREAM;
    if (getaddrinfo(host, argv[2], &hints, &res)) {
        fprintf(stderr, "cannot resolve %s\n", host);
        return 1;
    }
    int fd = socket(res->ai_family, res->ai_socktype, res->ai_protocol);
    if (fd < 0 || connect(fd, res->ai_addr, res->ai_addrlen)) {
        fprintf(stderr, "cannot connect to %s:%s\n", host, argv[2]);
        return 1;
    }
    freeaddrinfo(res);

    double *lat = (double *)malloc(repeats * sizeof(double));
    if (!lat) {
        fprintf(stderr, "cannot allocate %ld latency slots\n", repeats);
        return 1;
    }
    float *y = NULL;
    uint32_t out_rows = 0, out_feats = 0;
    for (long i = 0; i < repeats; i++) {
        free(y);
        double t0 = now_ms();
        if (send_frame(fd, x, rows, feats)) {
            fprintf(stderr, "send failed at step %ld\n", i);
            return 1;
        }
        y = recv_frame(fd, &out_rows, &out_feats);
        lat[i] = now_ms() - t0;
        if (!y) {
            fprintf(stderr, "recv failed at step %ld\n", i);
            return 1;
        }
        if (out_rows == 0) { /* server error sentinel */
            fprintf(stderr, "server reported model-execution error\n");
            return 3;
        }
    }
    close(fd);

    FILE *fout = fopen(argv[6], "wb");
    size_t n_out = (size_t)out_rows * out_feats;
    if (!fout || fwrite(y, sizeof(float), n_out, fout) != n_out) {
        fprintf(stderr, "cannot write %s\n", argv[6]);
        return 1;
    }
    fclose(fout);

    qsort(lat, repeats, sizeof(double), cmp_double);
    printf("climclient: %u x %u -> %u x %u, %ld steps, "
           "latency ms p50=%.3f p99=%.3f max=%.3f\n",
           rows, feats, out_rows, out_feats, repeats, lat[repeats / 2],
           lat[(size_t)((repeats - 1) * 99) / 100], lat[repeats - 1]);
    free(lat);
    free(x);
    free(y);
    return 0;
}
