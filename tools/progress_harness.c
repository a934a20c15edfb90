/*
 * progress_harness — drives the reference do_quantsmooth with a progress
 * callback and prints every (cur, max) pair, so the new framework's
 * progress accounting (engine._smooth_percomp) can be differentially
 * tested against the reference semantics (quantsmooth.h:2474-2482,
 * 2652-2663; libjpegqs.h:42-44).
 *
 * Usage: progress_harness in.jpg flags niter progprec [cancel_after [out.jpg]]
 * Prints "P cur max" per callback; with cancel_after > 0 returns 1 from
 * the Nth callback (cancel).  With out.jpg the (possibly partially)
 * smoothed coefficients are written out, so a mid-iteration cancel's
 * exact coefficient state can be compared (PRECISE_PROGRESS builds:
 * quantsmooth.h:2632-2665 row-granular stop).
 *
 * Built against the read-only reference tree (include only, no copies).
 */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>
#include <stdint.h>
#include <jpeglib.h>

/* path injected by tools/build_reference.sh (-DQS_HEADER=...) so the
 * reference's jconfig.h never shadows the system one */
#include QS_HEADER

static int n_calls = 0, cancel_after = 0;

static int progress_cb(void *userdata, int cur, int max) {
    (void)userdata;
    printf("P %d %d\n", cur, max);
    n_calls++;
    return cancel_after && n_calls >= cancel_after;
}

int main(int argc, char **argv) {
    struct jpeg_decompress_struct srcinfo;
    struct jpeg_error_mgr jerr;
    jvirt_barray_ptr *coefs;
    jpegqs_control_t opts;
    FILE *f;

    if (argc < 5) {
        fprintf(stderr, "usage: %s in.jpg flags niter progprec [cancel]\n",
                argv[0]);
        return 1;
    }
    if (argc > 5) cancel_after = atoi(argv[5]);

    srcinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&srcinfo);
    f = fopen(argv[1], "rb");
    if (!f) { fprintf(stderr, "open failed\n"); return 1; }
    jpeg_stdio_src(&srcinfo, f);
    jpeg_read_header(&srcinfo, TRUE);
    coefs = jpeg_read_coefficients(&srcinfo);

    memset(&opts, 0, sizeof(opts));
    opts.flags = atoi(argv[2]);
    opts.niter = atoi(argv[3]);
    opts.progprec = atoi(argv[4]);
    opts.progress = progress_cb;
    do_quantsmooth(&srcinfo, coefs, &opts);

    if (argc > 6) {
        struct jpeg_compress_struct dstinfo;
        struct jpeg_error_mgr jdsterr;
        FILE *fo = fopen(argv[6], "wb");
        if (!fo) { fprintf(stderr, "open out failed\n"); return 1; }
        dstinfo.err = jpeg_std_error(&jdsterr);
        jpeg_create_compress(&dstinfo);
        jpeg_copy_critical_parameters(&srcinfo, &dstinfo);
        jpeg_stdio_dest(&dstinfo, fo);
        jpeg_write_coefficients(&dstinfo, coefs);
        jpeg_finish_compress(&dstinfo);
        jpeg_destroy_compress(&dstinfo);
        fclose(fo);
    }

    jpeg_finish_decompress(&srcinfo);
    jpeg_destroy_decompress(&srcinfo);
    fclose(f);
    return 0;
}
