"""Convert a 3DGS .ply or .splat export to a compressed .ksplat.

Counterpart of the reference's webui/util/create-ksplat.js (which wraps
GaussianSplats3D's SplatBufferGenerator): .ksplat stores uint16
bucket-relative centers + float16 scale/rotation at 24 B/splat vs the
.splat's 32 B and the .ply's full-precision layout — the distribution
format the reference viewer streams progressively.

Usage: python tools/create_ksplat.py <model.ply|model.splat> [out.ksplat]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    if len(sys.argv) < 2:
        print(__doc__)
        sys.exit(1)
    src = Path(sys.argv[1])
    dst = Path(sys.argv[2]) if len(sys.argv) > 2 else src.with_suffix(".ksplat")

    import numpy as np

    from dogs_tpu.fields.io import load_gaussian_ply, load_splat, save_ksplat

    if src.suffix == ".ply":
        params = load_gaussian_ply(str(src))
    elif src.suffix == ".splat":
        import jax.numpy as jnp

        from dogs_tpu.core.gaussians import GaussianParams, inverse_sigmoid
        from dogs_tpu.core.sh import C0

        d = load_splat(str(src))
        n = d["xyz"].shape[0]
        # Invert the .splat activations back to parameter space so
        # save_ksplat's own activation pass reproduces the stored values.
        rgb = np.clip(d["rgba"][:, :3], 1e-4, 1 - 1e-4)
        alpha = np.clip(d["rgba"][:, 3:4], 1e-4, 1 - 1e-4)
        params = GaussianParams(
            xyz=jnp.asarray(d["xyz"]),
            feat_dc=jnp.asarray((rgb - 0.5) / C0, jnp.float32)[:, None, :],
            feat_rest=jnp.zeros((n, 0, 3), jnp.float32),
            log_scale=jnp.asarray(np.log(np.maximum(d["scale"], 1e-9))),
            quat=jnp.asarray(d["quat"], jnp.float32),
            logit_opacity=inverse_sigmoid(jnp.asarray(alpha, jnp.float32)),
        )
    else:
        sys.exit(f"unsupported input {src.suffix} (need .ply or .splat)")

    save_ksplat(str(dst), params)
    print(f"{src} -> {dst} ({dst.stat().st_size:,} bytes)")


if __name__ == "__main__":
    main()
