#!/usr/bin/env python
"""Streaming decode viewer / throughput monitor.

The analogue of the reference's ``examples/viewer.rs`` (decode an MJPEG
webcam stream frame-by-frame into the render pipeline). Without a display
server this version streams JPEG frames — from files, a directory, or one
file looped — through the pipelined StreamDecoder and reports live fps;
``--save-dir`` writes decoded frames out as PNGs.

    python examples/viewer.py frame.jpg --loop 100
    python examples/viewer.py captures/*.jpg --save-dir decoded/

``--platform cpu|tpu`` (or ``COMPEG_PLATFORM``) selects the JAX backend.
The env var ``JAX_PLATFORMS`` alone is NOT enough on rigs whose
sitecustomize force-sets a platform after the environment is read — the
selection must go through ``jax.config.update("jax_platforms", ...)``
*before* any device query (same contract as tests/conftest.py).
"""

import argparse
import itertools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np


def _force_platform(name: str) -> None:
    """Pin the JAX backend before anything touches devices. jax.config wins
    over both the env var and any sitecustomize override."""
    import jax

    jax.config.update("jax_platforms", name)


def render_ansi(rgb, cols: int) -> str:
    """Render an [H, W, 3] u8 frame as ANSI truecolor half-blocks.

    Each character cell shows two vertically stacked pixels (fg = top via
    '▀', bg = bottom), so a cols-wide preview is cols x (cols*H/W) pixels.
    Box-filter downsample with numpy; one string per frame, drawn with a
    cursor-home so successive frames overdraw in place (flicker-free)."""
    h, w = rgb.shape[:2]
    # Degenerate 1-pixel dimensions: duplicate so every box has area >= 1.
    if h < 2:
        rgb = np.repeat(rgb, 2, axis=0)
        h = rgb.shape[0]
    if w < 2:
        rgb = np.repeat(rgb, 2, axis=1)
        w = rgb.shape[1]
    cols = max(2, min(cols, w))
    # Even row count (2 pixels per cell), capped at h so box edges are
    # strictly increasing (no zero-area boxes, no dropped row/col 0).
    rows = max(2, min(h // 2 * 2, round(cols * h / w / 2) * 2))
    ys = np.arange(rows + 1) * h // rows
    xs = np.arange(cols + 1) * w // cols
    c = np.zeros((h + 1, w + 1, 3), np.float64)
    c[1:, 1:] = rgb.astype(np.float64).cumsum(0).cumsum(1)
    area = (ys[1:] - ys[:-1])[:, None] * (xs[1:] - xs[:-1])[None, :]
    small = (
        c[ys[1:]][:, xs[1:]] - c[ys[:-1]][:, xs[1:]]
        - c[ys[1:]][:, xs[:-1]] + c[ys[:-1]][:, xs[:-1]]
    ) / area[..., None]
    px = small.round().clip(0, 255).astype(np.uint8)
    top, bot = px[0::2], px[1::2]
    lines = ["\x1b[H"]
    for tr, br in zip(top, bot):
        cells = [
            f"\x1b[38;2;{t[0]};{t[1]};{t[2]}m\x1b[48;2;{b[0]};{b[1]};{b[2]}m▀"
            for t, b in zip(tr, br)
        ]
        lines.append("".join(cells) + "\x1b[0m")
    return "\n".join(lines)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "inputs", nargs="+",
        help="JPEG/.mjpeg files, a /dev/video* camera (captured live as "
        "MJPG via compeg_tpu.v4l2, the reference viewer's webcam mode), or "
        "'-' to read an MJPEG byte stream from stdin (e.g. `ffmpeg -f v4l2 "
        "-i /dev/video0 -c copy -f mjpeg - | viewer.py -`)",
    )
    ap.add_argument(
        "--max-frames", type=int, default=None,
        help="with a /dev/video* input: stop after this many frames",
    )
    ap.add_argument(
        "--camera-size", default=None, metavar="WxH",
        help="with a /dev/video* input: request this capture size",
    )
    ap.add_argument("--loop", type=int, default=0, help="loop the input N times")
    ap.add_argument(
        "--follow", action="store_true",
        help="tail a growing .mjpeg file, decoding frames as they are "
        "appended (file-based live feed)",
    )
    ap.add_argument(
        "--idle-timeout", type=float, default=None,
        help="with --follow: stop after this many seconds without growth",
    )
    ap.add_argument("--save-dir", default=None)
    ap.add_argument(
        "--preview", action="store_true",
        help="render each decoded frame to the terminal as ANSI truecolor "
        "half-blocks (the render-pass role of the reference viewer, "
        "display-server-free)",
    )
    ap.add_argument(
        "--preview-width", type=int, default=96,
        help="terminal columns for --preview",
    )
    ap.add_argument(
        "--scale", type=int, default=8, choices=(1, 2, 4, 8),
        help="decode at scale/8 resolution (DCT-domain thumbnail decode; "
        "1 = 1/8-scale DC-only previews, ~2.3x the full-decode rate and "
        "64x less output — ideal for --preview)",
    )
    ap.add_argument("--stats-every", type=int, default=30)
    ap.add_argument(
        "--platform",
        default=os.environ.get("COMPEG_PLATFORM") or None,
        help="JAX platform (cpu/tpu). Default: jax's own selection. "
        "Overrides sitecustomize-forced platforms, unlike JAX_PLATFORMS.",
    )
    args = ap.parse_args()

    if args.platform:
        _force_platform(args.platform)

    from compeg_tpu.batch import StreamDecoder
    from compeg_tpu.profiling import log_stats

    import logging

    logging.basicConfig(level=logging.INFO)

    # .mjpeg/.mjpg containers (the reference viewer's webcam source is an
    # MJPG V4L2 stream, examples/viewer.rs:40-89) stream frame-by-frame;
    # bare .jpg inputs are read whole.
    from compeg_tpu import mjpeg

    def frame_iter():
        for f in args.inputs:
            if f.startswith("/dev/video"):
                from compeg_tpu import v4l2

                size = None
                if args.camera_size:
                    w, h = args.camera_size.lower().split("x")
                    size = (int(w), int(h))
                yield from v4l2.capture_frames(
                    f, size=size, max_frames=args.max_frames
                )
            elif f == "-":
                yield from mjpeg.frames_from_stream(sys.stdin.buffer)
            elif args.follow:
                yield from mjpeg.follow_frames(
                    f, idle_timeout_s=args.idle_timeout
                )
            elif f.lower().endswith((".mjpeg", ".mjpg")):
                yield from mjpeg.frames_from_file(f)
            else:
                yield open(f, "rb").read()

    live = any(f == "-" or f.startswith("/dev/video") for f in args.inputs)
    if live or args.follow:
        frames = frame_iter()  # live sources stream lazily
    else:
        frames = list(frame_iter())
        if args.loop:
            frames = list(itertools.chain.from_iterable([frames] * args.loop))

    dec = StreamDecoder()
    t0 = time.perf_counter()
    n = 0
    last = t0
    if args.preview:
        sys.stdout.write("\x1b[2J")  # clear once; frames overdraw in place

    if args.scale != 8:
        # Scaled decode path: per-frame thumbnail decodes (the preview use
        # case — a 1/8-scale 4K frame is already smaller than the terminal).
        def scaled_iter():
            for data in frames:
                yield dec._dec.decode_scaled(data, args.scale)

        outs = scaled_iter()
    else:
        outs = dec.decode_iter(frames)
    for out in outs:
        if args.scale != 8:
            rgb = out  # decode_scaled returns host RGB directly
        else:
            rgb = None
        if args.preview:
            sys.stdout.write(render_ansi(
                rgb if rgb is not None else dec.to_rgb(out),
                args.preview_width))
            sys.stdout.write("\n")
            sys.stdout.flush()
        if args.save_dir:
            from PIL import Image

            os.makedirs(args.save_dir, exist_ok=True)
            Image.fromarray(
                rgb if rgb is not None else dec.to_rgb(out)
            ).save(os.path.join(args.save_dir, f"frame_{n:05d}.png"))
        n += 1
        if n % args.stats_every == 0:
            now = time.perf_counter()
            print(
                f"{n} frames | {args.stats_every / (now - last):.1f} fps "
                f"(avg {n / (now - t0):.1f})"
            )
            last = now
    dt = time.perf_counter() - t0
    print(f"done: {n} frames in {dt:.2f}s = {n / dt:.1f} fps")
    log_stats()


if __name__ == "__main__":
    main()
