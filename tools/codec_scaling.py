#!/usr/bin/env python
"""Host entropy-codec throughput: decode / encode MP/s vs thread count.

The device engine sustains ~600 MP/s (q3 gray, BASELINE.md); in a
production pipeline the host-side libjpeg entropy codec is the other
half of the balance (the reference has the same split: entropy codec
around do_quantsmooth, quantsmooth.c:548-579).  This measures how the
ctypes host runtime scales across a thread pool — libjpeg calls release
the GIL, so Python threads are real parallelism here — and therefore
how many host cores one chip's feed requires.

Usage: python tools/codec_scaling.py [height width]
"""
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))

H = int(sys.argv[1]) if len(sys.argv) > 1 else 1440
W = int(sys.argv[2]) if len(sys.argv) > 2 else 1456
N_IMAGES = 24
REPEATS = 3


def main():
    from util import make_jpeg
    from jpegqs_tpu.host.jpegio import JpegCoefFile

    datas = [make_jpeg(H, W, "photo", seed=s, color=True, quality=75)
             for s in range(4)]
    corpus = [datas[i % len(datas)] for i in range(N_IMAGES)]
    mp = H * W / 1e6

    def decode_one(d):
        with JpegCoefFile(d) as f:
            img = f.read()
        return img

    # pre-decode once so encode can be measured separately
    imgs_files = []
    for d in corpus:
        f = JpegCoefFile(d)
        imgs_files.append((f, f.read()))

    def encode_one(pair):
        f, img = pair
        for ci in range(len(img.components)):
            f.write_coefs(ci, img.components[ci].coefs)
        return f.save()

    print(f"{N_IMAGES} x {H}x{W} 4:2:0 color ({mp:.1f} MP each), "
          f"{os.cpu_count()} host cores")
    print(f"{'threads':>7} {'decode MP/s':>12} {'encode MP/s':>12}")
    for nt in (1, 2, 4, 8):
        best_d = best_e = None
        for _ in range(REPEATS):
            with ThreadPoolExecutor(max_workers=nt) as ex:
                t0 = time.perf_counter()
                list(ex.map(decode_one, corpus))
                dt = time.perf_counter() - t0
                t0 = time.perf_counter()
                list(ex.map(encode_one, imgs_files))
                et = time.perf_counter() - t0
            best_d = dt if best_d is None else min(best_d, dt)
            best_e = et if best_e is None else min(best_e, et)
        print(f"{nt:>7} {N_IMAGES * mp / best_d:>12.1f} "
              f"{N_IMAGES * mp / best_e:>12.1f}")
    for f, _ in imgs_files:
        f.close()


if __name__ == "__main__":
    main()
