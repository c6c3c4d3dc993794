"""A/B the full train step: per-tile Pallas kernels vs the flat chunk-stream
kernels (pallas_stream.py), on the real chip.

Usage: python tools/ab_stream.py [variants...]
Variants: "pertile", "stream", with optional ":ch=<pallas_chunk>".
Default: pertile stream
"""

import json
import sys
import time

sys.path.insert(0, ".")


def measure(spec: str):
    name, _, opt = spec.partition(":")
    pallas_chunk = 128
    if opt.startswith("ch="):
        pallas_chunk = int(opt[3:])
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from bench import N_GAUSSIANS, _measure

    its, trunc = _measure(
        N_GAUSSIANS, 16, 48, bin_capacity=1_400_000,
        pallas_chunk=pallas_chunk, pallas_stream=(name == "stream"),
    )
    print(json.dumps({"variant": spec, "iters_per_sec": round(its, 3),
                      "truncation": trunc}), flush=True)


if __name__ == "__main__":
    variants = sys.argv[1:] or ["pertile", "stream"]
    for v in variants:
        measure(v)
