"""CLI surface tests: drive ``cli.main()`` end-to-end against the
reference binary (outputs, exit codes, stdin/stdout mode).

The reference contract: quantsmooth.c:288-393 (parser), 626 (exit code
``num_warnings ? 2 : 0``), 498 (``--verbose`` libjpeg trace).
"""

import io
import os
import subprocess
import sys

import numpy as np
import pytest

from util import REF_BIN, ensure_reference, make_jpeg, coef_arrays

from jpegqs_tpu import cli


def run_cli(args, stdin_bytes=None):
    """Run cli.main() in-process, capturing stdout bytes and exit code."""
    old_stdout, old_stdin = sys.stdout, sys.stdin
    buf = io.BytesIO()

    class _Out:
        buffer = buf

        def write(self, s):
            pass

        def flush(self):
            pass

    try:
        sys.stdout = _Out()
        if stdin_bytes is not None:
            sys.stdin = io.TextIOWrapper(io.BytesIO(stdin_bytes))
        rc = cli.main(args)
    finally:
        sys.stdout, sys.stdin = old_stdout, old_stdin
    return rc, buf.getvalue()


def run_ref(args, stdin_bytes=None):
    ensure_reference()
    r = subprocess.run([REF_BIN, *args], input=stdin_bytes,
                       capture_output=True)
    return r.returncode, r.stdout


def assert_same_coefs(mine: bytes, ref: bytes):
    a = coef_arrays(mine)
    b = coef_arrays(ref)
    assert len(a) == len(b)
    for (ca, qa), (cb, qb) in zip(a, b):
        assert np.array_equal(qa, qb)
        assert np.array_equal(ca, cb)


@pytest.mark.parametrize("quality", [0, 3, 6])
def test_cli_matches_reference(tmp_path, quality):
    data = make_jpeg(120, 136, "photo", seed=7, color=True, quality=70)
    inp = tmp_path / "in.jpg"
    inp.write_bytes(data)
    out_mine = tmp_path / "mine.jpg"
    out_ref = tmp_path / "ref.jpg"
    args = ["-q", str(quality), "-n", "3", "-i", "0"]
    rc_m, _ = run_cli([*args, str(inp), str(out_mine)])
    rc_r, _ = run_ref([*args, str(inp), str(out_ref)])
    assert rc_m == rc_r == 0
    assert_same_coefs(out_mine.read_bytes(), out_ref.read_bytes())


def test_cli_stdin_stdout(tmp_path):
    data = make_jpeg(88, 96, "edges", seed=3, quality=80)
    rc_m, out_m = run_cli(["-q", "3", "-n", "2", "-i", "0", "-", "-"],
                          stdin_bytes=data)
    assert rc_m == 0 and out_m[:2] == b"\xff\xd8"
    inp = tmp_path / "in.jpg"
    out_ref = tmp_path / "ref.jpg"
    inp.write_bytes(data)
    rc_r, _ = run_ref(["-q", "3", "-n", "2", "-i", "0",
                       str(inp), str(out_ref)])
    assert rc_r == 0
    assert_same_coefs(out_m, out_ref.read_bytes())


def test_cli_exit_2_on_damaged_input(tmp_path, capfd):
    """Truncated scan -> libjpeg warning -> exit 2 (quantsmooth.c:626)."""
    data = make_jpeg(96, 96, "photo", seed=1, quality=85)
    damaged = data[: len(data) * 2 // 3]
    inp = tmp_path / "in.jpg"
    inp.write_bytes(damaged)
    out_mine = tmp_path / "mine.jpg"
    out_ref = tmp_path / "ref.jpg"
    rc_m, _ = run_cli(["-q", "3", "-n", "2", "-i", "0",
                       str(inp), str(out_mine)])
    rc_r, _ = run_ref(["-q", "3", "-n", "2", "-i", "0",
                       str(inp), str(out_ref)])
    capfd.readouterr()  # swallow the libjpeg warning lines
    assert rc_r == 2, "reference should warn on truncated input"
    assert rc_m == 2
    # both still produce a valid file
    assert_same_coefs(out_mine.read_bytes(), out_ref.read_bytes())


def test_cli_exit_codes_usage_and_io(tmp_path, capfd):
    rc, _ = run_cli([])                       # usage
    assert rc == 1
    rc, _ = run_cli(["--bogus", "a", "b"])    # unknown option
    assert rc == 1
    rc, _ = run_cli(["-q", "3", str(tmp_path / "missing.jpg"),
                     str(tmp_path / "out.jpg")])
    assert rc == 1
    capfd.readouterr()


def test_cli_flags_override(tmp_path):
    """--flags raw override must track the reference bit semantics."""
    data = make_jpeg(104, 112, "photo", seed=9, color=True, quality=75)
    inp = tmp_path / "in.jpg"
    inp.write_bytes(data)
    for flagval in ("1", "17", "3"):   # DIAGONALS, +NO_REBALANCE, +JOINT
        out_mine = tmp_path / f"mine{flagval}.jpg"
        out_ref = tmp_path / f"ref{flagval}.jpg"
        args = ["-f", flagval, "-n", "2", "-i", "0"]
        rc_m, _ = run_cli([*args, str(inp), str(out_mine)])
        rc_r, _ = run_ref([*args, str(inp), str(out_ref)])
        assert rc_m == rc_r == 0
        assert_same_coefs(out_mine.read_bytes(), out_ref.read_bytes())


def test_cli_verbose_accepted(tmp_path, capfd):
    data = make_jpeg(80, 80, "flat", seed=2, quality=90)
    inp = tmp_path / "in.jpg"
    inp.write_bytes(data)
    rc, _ = run_cli(["-v", "1", "-q", "3", "-n", "1", "-i", "0",
                     str(inp), str(tmp_path / "out.jpg")])
    capfd.readouterr()
    assert rc == 0


def test_cli_batch_mode(tmp_path, capfd):
    """--batch inputs... outdir: every output matches the reference's
    per-file result (the corpus pipeline must not change results)."""
    datas = [
        make_jpeg(48, 48, "photo", seed=41, quality=70),
        make_jpeg(48, 48, "photo", seed=42, quality=70),  # same bucket
        make_jpeg(40, 56, "edges", seed=43, quality=80),  # different
    ]
    names = []
    for i, d in enumerate(datas):
        p = tmp_path / f"in{i}.jpg"
        p.write_bytes(d)
        names.append(p)
    outdir = tmp_path / "out"
    rc, _ = run_cli(["--batch", "-q", "0", "-n", "1", "-i", "0",
                     *map(str, names), str(outdir)])
    capfd.readouterr()
    assert rc == 0
    for i, (p, d) in enumerate(zip(names, datas)):
        ref = tmp_path / f"ref{i}.jpg"
        rc_r, _ = run_ref(["-q", "0", "-n", "1", "-i", "0",
                           str(p), str(ref)])
        assert rc_r == 0
        got = (outdir / p.name).read_bytes()
        assert_same_coefs(got, ref.read_bytes())


def test_cli_batch_duplicate_basenames(tmp_path, capfd):
    """Inputs whose basenames collide would silently overwrite each
    other in outdir — refuse with a diagnostic instead."""
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    d = make_jpeg(32, 32, "flat", seed=44, quality=80)
    (tmp_path / "a" / "img.jpg").write_bytes(d)
    (tmp_path / "b" / "img.jpg").write_bytes(d)
    rc, _ = run_cli(["--batch", "-q", "0", "-n", "1", "-i", "0",
                     str(tmp_path / "a" / "img.jpg"),
                     str(tmp_path / "b" / "img.jpg"),
                     str(tmp_path / "out")])
    err = capfd.readouterr().err
    assert rc == 1 and "duplicate" in err


def test_cli_batch_exit_2_on_damaged_input(tmp_path, capfd):
    """A batch containing a corrupt-but-decodable file exits 2, like
    the single-file path and the reference (quantsmooth.c:626)."""
    good = make_jpeg(48, 48, "photo", seed=45, quality=80)
    damaged = good[: len(good) * 2 // 3]
    (tmp_path / "good.jpg").write_bytes(good)
    (tmp_path / "bad.jpg").write_bytes(damaged)
    rc, _ = run_cli(["--batch", "-q", "0", "-n", "1", "-i", "0",
                     str(tmp_path / "good.jpg"),
                     str(tmp_path / "bad.jpg"),
                     str(tmp_path / "out")])
    capfd.readouterr()
    assert rc == 2
    assert (tmp_path / "out" / "good.jpg").exists()
    assert (tmp_path / "out" / "bad.jpg").exists()


def test_num_warnings_accessor():
    from jpegqs_tpu.host.jpegio import JpegCoefFile
    data = make_jpeg(64, 64, "photo", seed=4, quality=80)
    with JpegCoefFile(data) as f:
        f.read()
        assert f.num_warnings() == 0
    with JpegCoefFile(data[: len(data) * 2 // 3]) as f:
        f.read()
        assert f.num_warnings() > 0
