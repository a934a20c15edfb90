#!/usr/bin/env python
"""Multi-host launcher for jpegqs-tpu.

Coordinator mode (run the same command on every host):

    python tools/run_multihost.py --coordinator host0:9876 \
        --num-processes 4 --process-id $RANK [--devices-per-host 4] \
        in.jpg out.jpg [-q N] [-n N]

Local fan-out mode (development: spawn all processes on this machine,
CPU backend with virtual devices):

    python tools/run_multihost.py --local 2 --devices-per-host 4 \
        in.jpg out.jpg

Every process decodes the input; the image is row-sharded across ALL
devices of the job (halo exchange on ICI/DCN, parallel/multihost.py);
process 0 re-encodes and writes the output.  On TPU pods omit the
coordinator flags — jax.distributed auto-detects them.
"""

import argparse
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--coordinator", default=None,
                   help="host:port of process 0")
    p.add_argument("--num-processes", type=int, default=None)
    p.add_argument("--process-id", type=int, default=None)
    p.add_argument("--devices-per-host", type=int, default=None,
                   help="CPU backend: virtual device count per process")
    p.add_argument("--local", type=int, default=0, metavar="N",
                   help="spawn N local processes (dev mode, CPU)")
    p.add_argument("-q", "--quality", type=int, default=3)
    p.add_argument("-n", "--niter", type=int, default=3)
    p.add_argument("infile")
    p.add_argument("outfile")
    return p.parse_args(argv)


def local_fanout(args):
    import socket
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = f"127.0.0.1:{port}"
    procs = []
    for pid in range(args.local):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        # CPU-only dev workers must not load the TPU plugin: its
        # backend discovery opens the device tunnel and can hang
        # indefinitely right after another process used it heavily
        env["PYTHONPATH"] = os.pathsep.join(
            p for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and ".axon_site" not in p)
        if args.devices_per_host:
            env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                                + " --xla_force_host_platform_device_count="
                                + str(args.devices_per_host)).strip()
        cmd = [sys.executable, os.path.abspath(__file__),
               "--coordinator", coord,
               "--num-processes", str(args.local),
               "--process-id", str(pid),
               "-q", str(args.quality), "-n", str(args.niter),
               args.infile, args.outfile]
        procs.append(subprocess.Popen(cmd, env=env))
    rc = 0
    for pr in procs:
        rc |= pr.wait()
    return rc


def worker(args):
    from jpegqs_tpu.parallel import multihost
    from jpegqs_tpu.options import QsOptions
    from jpegqs_tpu.host.jpegio import JpegCoefFile
    import jax

    from jpegqs_tpu.utils import cache as _qs_cache
    _qs_cache.setup(os.path.join(REPO, ".jax_cache"))

    if args.coordinator is not None:
        multihost.initialize(coordinator_address=args.coordinator,
                             num_processes=args.num_processes,
                             process_id=args.process_id)
    else:
        multihost.initialize()   # TPU pod auto-detection

    opts = QsOptions.from_quality(args.quality, args.niter)
    with open(args.infile, "rb") as f:
        data = f.read()
    res, img = multihost.smooth_jpeg_distributed(data, opts)
    if jax.process_index() == 0:
        with JpegCoefFile(data) as f:
            for ci in range(len(img.components)):
                f.write_coefs(ci, res.coefs[ci])
            if res.upsampled is not None:
                f.set_upsampled(res.upsampled[0], res.upsampled[1])
            out = f.save()
        with open(args.outfile, "wb") as f:
            f.write(out)
        print(f"wrote {args.outfile} "
              f"({jax.process_count()} processes, "
              f"{len(jax.devices())} devices)", file=sys.stderr)
    return 0


def main(argv=None):
    args = parse_args(argv)
    if args.local:
        return local_fanout(args)
    return worker(args)


if __name__ == "__main__":
    sys.exit(main())
