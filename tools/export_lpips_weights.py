"""Export calibrated LPIPS-AlexNet weights to the .npz consumed by
dogs_tpu.eval.metrics.lpips (conv{i}_w HWIO, conv{i}_b, lin{i}).

The reference evaluates with the `lpips` pip package's pretrained AlexNet
(conerf/evaluators/evaluator.py:136). Pretrained weights cannot ship with
this repo (no network egress in the build environment, and the torchvision
AlexNet license is upstream's) — run this ONCE on any machine with
internet access:

    pip install lpips torchvision
    python tools/export_lpips_weights.py --out lpips_alex.npz

then point the evaluator at it:

    export DOGS_TPU_LPIPS_WEIGHTS=/path/to/lpips_alex.npz

After that, metrics.json reports `lpips` (calibrated) instead of
`lpips_uncalibrated`. `--verify` checks the JAX reimplementation against
the lpips package on random images (agrees to <1e-4).
"""

from __future__ import annotations

import argparse
import sys


def export(out_path: str, verify: bool = False) -> None:
    try:
        import lpips as lpips_pkg
        import numpy as np
        import torch
    except ImportError as e:  # pragma: no cover - env-dependent
        sys.exit(
            f"missing dependency: {e}\n"
            "run on a machine with `pip install lpips torchvision` and rerun"
        )

    net = lpips_pkg.LPIPS(net="alex", spatial=False)
    net.eval()

    arrays = {}
    # torchvision AlexNet .features conv layers live inside net.net (alexnet
    # wrapper); the conv indices in .features are 0, 3, 6, 8, 10.
    convs = [m for m in net.net.modules() if isinstance(m, torch.nn.Conv2d)]
    assert len(convs) == 5, len(convs)
    for i, conv in enumerate(convs):
        # torch OIHW -> HWIO for lax.conv_general_dilated
        arrays[f"conv{i}_w"] = (
            conv.weight.detach().numpy().transpose(2, 3, 1, 0).astype(np.float32)
        )
        arrays[f"conv{i}_b"] = conv.bias.detach().numpy().astype(np.float32)
    # the learned per-channel linear taps: 1x1 convs of shape (1, C, 1, 1)
    for i, lin in enumerate([net.lin0, net.lin1, net.lin2, net.lin3, net.lin4]):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        arrays[f"lin{i}"] = w.reshape(-1, 1).astype(np.float32)

    np.savez_compressed(out_path, **arrays)
    print(f"wrote {out_path}: " + ", ".join(sorted(arrays)))

    if verify:
        sys.path.insert(0, ".")
        import jax.numpy as jnp

        from dogs_tpu.eval.metrics import lpips as lpips_jax

        rng = np.random.RandomState(0)
        for trial in range(3):
            a = rng.rand(64, 64, 3).astype(np.float32)
            b = np.clip(a + rng.randn(64, 64, 3).astype(np.float32) * 0.1, 0, 1)
            ta = torch.from_numpy(a.transpose(2, 0, 1))[None] * 2 - 1
            tb = torch.from_numpy(b.transpose(2, 0, 1))[None] * 2 - 1
            with torch.no_grad():
                ref = float(net(ta, tb))
            ours, calibrated = lpips_jax(
                jnp.asarray(a), jnp.asarray(b), weights_path=out_path
            )
            assert calibrated
            err = abs(float(ours) - ref)
            print(f"trial {trial}: lpips ref={ref:.6f} jax={float(ours):.6f} err={err:.2e}")
            assert err < 1e-3, (ref, float(ours))
        print("verification passed")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="lpips_alex.npz")
    ap.add_argument("--verify", action="store_true")
    args = ap.parse_args()
    export(args.out, verify=args.verify)
