"""Standalone 8B bench leg driver (bench.run_8b_leg).  Run alone."""
import os, sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from bench import log, run_8b_leg
from scope_tpu.utils import compile_cache

compile_cache.enable()
scope, full, sb, fb = run_8b_leg()
log(f"==== 8B leg: scope b{sb} {scope and round(scope,1)} tok/s | "
    f"full-cache b{fb} {full and round(full,1)} tok/s | "
    f"ratio {round(scope/full,2) if scope and full else None} ====")
