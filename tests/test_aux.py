"""Auxiliary subsystem tests: profiling stats, multihost helpers, examples."""

import subprocess
import sys
import os

import numpy as np
import pytest

from compeg_tpu import profiling as P


def test_stage_timer_stats():
    P.reset_stats()
    with P.stage_timer("unit_test_stage"):
        pass
    with P.stage_timer("unit_test_stage"):
        pass
    s = P.get_stats()["unit_test_stage"]
    assert s.count == 2
    assert s.total_s >= 0
    assert s.mean_ms >= 0
    P.log_stats()
    P.reset_stats()
    assert "unit_test_stage" not in P.get_stats()


def test_device_trace_noop():
    with P.device_trace(None):
        pass  # no-op path


def test_measure_scaling_shape(test_image):
    """measure_scaling drives the decode fn with proportional batches."""
    import jax
    from compeg_tpu.parallel.multihost import measure_scaling

    calls = []

    def decode_fn(n, x):
        calls.append((n, x.shape))
        return jax.numpy.asarray(x) * 1

    def batch_for(n):
        return (np.zeros((2 * n, 4), np.float32),)

    res = measure_scaling(decode_fn, batch_for, [1, 2], iters=1)
    assert [r[0] for r in res] == [1, 2]
    assert res[0][2] == 1.0  # efficiency baseline


def test_enc_example_cli(tmp_path, test_image):
    """examples/enc.py round-trips an image through the CLI."""
    from PIL import Image

    src = tmp_path / "in.png"
    out = tmp_path / "out.jpg"
    Image.fromarray(test_image(16, 16)).save(src)
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    r = subprocess.run(
        [sys.executable, "examples/enc.py", str(src), str(out),
         "--sampling", "422", "--ri", "1"],
        capture_output=True,
        timeout=120,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=env,
    )
    assert r.returncode == 0, r.stderr
    from compeg_tpu import analyze

    meta = analyze(out.read_bytes())
    assert meta.width == 16 and meta.restart_interval == 1


def test_init_distributed_noop():
    from compeg_tpu.parallel.multihost import init_distributed

    init_distributed()  # single-process: must be a no-op
    init_distributed(num_processes=1)


def test_multiprocess_dryrun():
    """Real 2-process jax.distributed job: global mesh across processes,
    make_array_from_process_local_data, cross-process shard_map decode,
    per-process oracle check (tools/dryrun_multiproc.py)."""
    env = dict(os.environ)
    r = subprocess.run(
        [sys.executable, "tools/dryrun_multiproc.py", "--port", "12391"],
        capture_output=True,
        timeout=570,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=env,
    )
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert b"multiproc dryrun: OK" in r.stdout


def test_viewer_example_stdin_pipe(tmp_path, test_image):
    """examples/viewer.py '-' decodes an MJPEG byte stream from stdin — the
    live-capture integration (a camera daemon / ffmpeg pipes raw MJPG)."""
    from compeg_tpu import encoder

    frame = encoder.encode(test_image(16, 16), sampling="422",
                           restart_interval_mcus=1)
    outdir = tmp_path / "out"
    r = subprocess.run(
        [sys.executable, "examples/viewer.py", "-",
         "--save-dir", str(outdir), "--stats-every", "2",
         "--platform", "cpu"],
        input=frame * 3,
        capture_output=True,
        timeout=300,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=dict(os.environ, COMPEG_PLATFORM="cpu"),
    )
    assert r.returncode == 0, (r.stdout, r.stderr)
    assert len(sorted(outdir.glob("*.png"))) == 3


def test_viewer_example_mjpeg_cli(tmp_path, test_image):
    """examples/viewer.py streams an .mjpeg container end to end (the
    reference viewer's MJPG-source role, examples/viewer.rs:40-89)."""
    from compeg_tpu import encoder

    frame = encoder.encode(test_image(16, 16), sampling="422",
                           restart_interval_mcus=1)
    src = tmp_path / "cap.mjpeg"
    src.write_bytes(frame * 3)
    outdir = tmp_path / "out"
    # --platform cpu goes through jax.config.update, which survives
    # sitecustomize-forced JAX_PLATFORMS (env alone does not — the round-3
    # suite hang: the "CPU" subprocess silently compiled through the TPU
    # tunnel).
    env = dict(os.environ, COMPEG_PLATFORM="cpu")
    r = subprocess.run(
        [sys.executable, "examples/viewer.py", str(src),
         "--save-dir", str(outdir), "--stats-every", "2",
         "--platform", "cpu"],
        capture_output=True,
        timeout=300,
        cwd=os.path.join(os.path.dirname(__file__), ".."),
        env=env,
    )
    assert r.returncode == 0, (r.stdout, r.stderr)
    pngs = sorted(outdir.glob("*.png"))
    assert len(pngs) == 3


def test_decodeop_dlpack_zero_copy(test_image):
    """DecodeOp exports its device result via DLPack — the analogue of the
    reference handing DecodeOp::texture() straight to the caller's render
    pipeline (src/lib.rs:538-574): downstream frameworks consume the packed
    RGBA words without a host round trip."""
    torch = pytest.importorskip("torch")
    from compeg_tpu.pipeline import Decoder

    from compeg_tpu import encoder

    data = encoder.encode(
        test_image(32, 64, "gradient"), sampling="422", quality=90,
        restart_interval_mcus=1,
    )
    dec = Decoder(interpret=True)
    op = dec.start_decode(data).block_until_ready()
    t = torch.from_dlpack(op)
    assert tuple(t.shape) == tuple(op.result.shape)
    assert (t.numpy() == np.asarray(op.result)).all()


def test_viewer_render_ansi_preview():
    """The terminal preview sink: box-filtered downsample + truecolor
    half-block encoding (two pixels per character cell)."""
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "viewer", os.path.join(os.path.dirname(__file__), "..", "examples",
                               "viewer.py"))
    viewer = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(viewer)

    rgb = np.zeros((40, 80, 3), np.uint8)
    rgb[:20] = (255, 0, 0)   # top half red
    rgb[20:] = (0, 0, 255)   # bottom half blue
    s = viewer.render_ansi(rgb, cols=20)
    lines = s.split("\n")
    assert lines[0] == "\x1b[H"
    body = lines[1:]
    assert len(body) == 5 and all(r.count("▀") == 20 for r in body)
    # Top rows render red-on-red, bottom rows blue-on-blue.
    assert "\x1b[38;2;255;0;0m" in body[0] and "\x1b[48;2;255;0;0m" in body[0]
    assert "\x1b[38;2;0;0;255m" in body[-1] and "\x1b[48;2;0;0;255m" in body[-1]
    # A flat frame averages to itself.
    flat = np.full((32, 64, 3), 77, np.uint8)
    assert "\x1b[38;2;77;77;77m" in viewer.render_ansi(flat, cols=16)


def test_viewer_render_ansi_small_frames():
    """Frames at or below the preview width must keep pixel row/col 0 and
    never produce zero-area boxes (ADVICE r4: the old clip(1, ...) dropped
    the first row/column and NaN'd the first column when cols == w)."""
    import importlib.util
    import warnings

    spec = importlib.util.spec_from_file_location(
        "viewer", os.path.join(os.path.dirname(__file__), "..", "examples",
                               "viewer.py"))
    viewer = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(viewer)

    # cols == w: every box is exactly one pixel; output must equal input.
    rgb = np.arange(8 * 8 * 3, dtype=np.uint8).reshape(8, 8, 3)
    rgb[0, 0] = (200, 100, 50)
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # any divide-by-zero fails the test
        s = viewer.render_ansi(rgb, cols=96)
    # Pixel (0,0) is the fg of the first cell of the first body line.
    assert s.split("\n")[1].startswith("\x1b[38;2;200;100;50m")
    # Degenerate 1-pixel-tall and 1-pixel-wide frames render without error.
    for shape in ((1, 16, 3), (16, 1, 3), (1, 1, 3)):
        tiny = np.full(shape, 9, np.uint8)
        with warnings.catch_warnings():
            warnings.simplefilter("error")
            out = viewer.render_ansi(tiny, cols=96)
        assert "\x1b[38;2;9;9;9m" in out


def test_compilation_cache_persists_executables(tmp_path, test_image):
    """enable_compilation_cache: a decode populates the persistent cache
    dir, and a FRESH process decodes the same geometry with a cache hit
    (the webcam-session restart scenario; reference viewer.rs:40-89)."""
    from compeg_tpu import encoder

    src = tmp_path / "f.jpg"
    src.write_bytes(
        encoder.encode(test_image(16, 32, "gradient"), sampling="422",
                       quality=90, restart_interval_mcus=1)
    )
    cache = tmp_path / "cache"
    prog = (
        "import jax; jax.config.update('jax_platforms', 'cpu')\n"
        "import sys, numpy as np\n"
        "from compeg_tpu.pipeline import Decoder, enable_compilation_cache\n"
        f"enable_compilation_cache({str(cache)!r})\n"
        f"out = Decoder(interpret=True).decode(open({str(src)!r}, 'rb').read())\n"
        "assert out.shape == (16, 32, 3)\n"
        "print('DECODED')\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    root = os.path.join(os.path.dirname(__file__), "..")
    r1 = subprocess.run([sys.executable, "-c", prog], capture_output=True,
                        timeout=600, cwd=root, env=env, text=True)
    assert r1.returncode == 0 and "DECODED" in r1.stdout, (r1.stdout, r1.stderr)
    entries = list(cache.iterdir())
    assert entries, "first run must write cache entries"
    # Second, fresh process: same geometry must hit the persistent cache
    # (observable via jax's cache logging) and still decode correctly.
    prog2 = prog.replace("print('DECODED')",
                         "print('DECODED2')")
    env2 = dict(env, JAX_DEBUG_LOG_MODULES="jax._src.compilation_cache")
    r2 = subprocess.run([sys.executable, "-c", prog2], capture_output=True,
                        timeout=600, cwd=root, env=env2, text=True)
    assert r2.returncode == 0 and "DECODED2" in r2.stdout, (r2.stdout, r2.stderr)
    assert "cache" in r2.stderr.lower()  # cache machinery engaged
