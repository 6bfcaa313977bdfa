#!/usr/bin/env python
"""Capture an XLA device trace of the 4K decode and print per-op times.

DEPRECATED shim: the original version summed only the top-12 ops, which
undercounts the epilogue tail by ~0.15 ms/frame (the r2/r3 "0.88 ms"
numbers). Delegates to tools/trace_ops.py (full XLA-Ops-lane sum).
"""
import runpy
import os
import sys

sys.argv = [sys.argv[0]] + sys.argv[1:]
runpy.run_path(
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "trace_ops.py"),
    run_name="__main__",
)
