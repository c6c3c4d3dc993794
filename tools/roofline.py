"""Roofline accounting for the headline train step (VERDICT r4 item 5).

For each stage of the 500k/1152x864 bench step this measures device time
(chained in-jit, tunnel dispatch amortized away — same protocol as
profile_step.py) and computes the stage's MANDATORY HBM traffic: every
input read once + every output written once, in the stage's actual dtypes.
`pct_hbm_roofline = mandatory_bytes / (measured_time * HBM_BW)` — i.e. how
close the stage runs to the speed a perfectly-fused, bandwidth-bound
implementation could reach. FLOP counts are reported for the stages with
meaningful arithmetic (blend kernels, SSIM) against the VPU/MXU ceilings.

v5e ceilings (public spec / scaling-book numbers, stated as assumptions):
  HBM_BW     819 GB/s
  MXU bf16   197 TFLOP/s   (f32 matmul ~ 1/4 of that)
  VPU f32    ~3.9 TFLOP/s  (8x128 lanes x 4 ALUs x ~0.94 GHz)

Interpretation guide (written into docs/performance.md): a LOW roofline %
does not automatically mean "leaving perf on the table" — sorts make
log-many passes (mandatory bytes count one), gathers pay random-access
latency per 64 B row, and kernels can be compute- not bandwidth-bound.
The % answers "how much headroom a smarter data layout could EVER buy".

Usage: python tools/roofline.py [n_gaussians]
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

HBM_BW = 819e9  # bytes/s
VPU_F32 = 3.9e12  # FLOP/s, stated assumption
MXU_BF16 = 197e12

GB = 1e9


def chain(step_fn, init, reps, label):
    import jax

    f = jax.jit(lambda c: jax.lax.fori_loop(0, reps, lambda i, cc: step_fn(cc), c))
    out = f(init)
    s = jax.tree.leaves(out)[0]
    float(s.sum() if hasattr(s, "ndim") and s.ndim else s)
    t0 = time.perf_counter()
    out = f(init)
    s = jax.tree.leaves(out)[0]
    float(s.sum() if hasattr(s, "ndim") and s.ndim else s)
    return (time.perf_counter() - t0) / reps


def main():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from bench import N_GAUSSIANS, WIDTH, HEIGHT, bench_scene
    from dogs_tpu.core.camera import make_camera
    from dogs_tpu.raster.binning import build_tile_bins
    from dogs_tpu.raster.projection import project_gaussians
    from dogs_tpu.raster.tiled import ENT_WIDTH, TRASH_ROWS, RasterConfig

    n = int(sys.argv[1]) if len(sys.argv) > 1 else N_GAUSSIANS
    w, h = WIDTH, HEIGHT
    params = bench_scene(n)
    cam = make_camera(
        R=np.eye(3), t=np.zeros(3), fx=1000.0, fy=1000.0,
        cx=w / 2, cy=h / 2, width=w, height=h,
    )
    cfg = RasterConfig(
        max_tiles_per_gaussian=12, bin_capacity=1_400_000, use_pallas=True,
        base_tiles=4, overflow_capacity=n, pallas_stream=True,
    )
    ts = cfg.tile_size
    n_ty, n_tx = -(-h // ts), -(-w // ts)
    n_tiles = n_ty * n_tx
    ch = cfg.pallas_chunk
    pool = cfg.overflow_capacity
    k_sort = n * cfg.base_tiles + pool  # sort candidates (tier A + pool)
    k = cfg.bin_capacity  # kept entries
    k_al = -(-k // ch) * ch
    px = n_tiles * ts * ts  # padded pixel count

    rows = []

    def add(label, t_s, bytes_, flops=0.0, peak=VPU_F32, note=""):
        rows.append((label, t_s * 1e3, bytes_ / GB,
                     bytes_ / (t_s * HBM_BW) * 100.0,
                     flops / GB, (flops / t_s / peak * 100.0) if flops else 0.0,
                     note))

    # ---- projection + SH (deg 3) -------------------------------------------
    def s_proj(c):
        p = params.replace(xyz=params.xyz + c * 1e-20)
        pr = project_gaussians(p, cam, active_sh_degree=3)
        return jnp.sum(pr.means2d) * 0.0 + c + 1.0

    t = chain(s_proj, jnp.float32(0), 20, "projection")
    by = (
        n * (3 + 3 + 45 + 3 + 4 + 1) * 4  # params read (feat_rest dominates)
        + n * (2 + 3 + 3 + 1 + 1 + 1) * 4  # proj outputs written
    )
    fl = n * (16 * 3 * 2 + 60)  # SH deg-3 basis + cov/project math
    add("projection+SH", t, by, fl)

    proj = jax.jit(lambda p: project_gaussians(p, cam, active_sh_degree=3))(params)
    bin_kw = dict(
        tile_size=ts, max_tiles_per_gaussian=cfg.max_tiles_per_gaussian,
        bin_capacity=cfg.bin_capacity, base_tiles=cfg.base_tiles,
        overflow_capacity=pool,
    )

    # ---- binning (key build + sort + starts) -------------------------------
    def s_bins(c):
        pr = proj.replace(depth=proj.depth + c * 1e-20)
        b = build_tile_bins(pr, h, w, **bin_kw)
        return jnp.sum(b.sorted_idx) * 0.0 + c + 1.0

    t = chain(s_bins, jnp.float32(0), 20, "binning")
    # Mandatory: read proj fields for key build (~10 N-vectors), write+read
    # the (key, payload) pair once each side of the sort, write kept slices.
    by = n * 10 * 4 + 2 * (k_sort * 8) + k * 8
    # A single merge/bitonic pass moves the pair again; log passes are the
    # sort's real traffic — reported in the note, not the mandatory count.
    import math

    passes = max(1, int(math.ceil(math.log2(k_sort / 65536))))
    add("binning keys+sort+starts", t, by,
        note=f"sort ~{passes}+ extra passes -> x{passes} traffic still <1ms")

    bins = jax.jit(lambda pr: build_tile_bins(pr, h, w, **bin_kw))(proj)

    # ---- entry gather + transpose ------------------------------------------
    filler = n + (jnp.arange(k_al - k, dtype=jnp.int32) % TRASH_ROWS)
    ai = (jnp.concatenate([bins.sorted_idx, filler]) if k_al > k
          else bins.sorted_idx)
    ast = bins.tile_starts
    ent = jnp.zeros((n + TRASH_ROWS, ENT_WIDTH), jnp.float32)

    def s_gather(c):
        e = ent + c * 1e-20
        at = e[ai].T
        return jnp.sum(at[:, :8]) * 0.0 + c + 1.0

    t = chain(s_gather, jnp.float32(0), 20, "gather+T")
    by = (
        k_al * 4  # index read
        + k_al * ENT_WIDTH * 4 * 2  # gathered rows read + written
        + k_al * ENT_WIDTH * 4 * 2  # transpose read + write
    )
    add("entry gather+transpose", t, by,
        note="random 64B-row gather: latency-bound, not streaming")

    # ---- pallas blend fwd / bwd (stream kernels) ---------------------------
    from dogs_tpu.raster import pallas_stream

    rngf = np.random.RandomState(2)
    aligned = jnp.asarray(rngf.rand(ENT_WIDTH, k_al), jnp.float32) * 0.01

    def s_fwdk(c):
        at = aligned + c * 1e-20
        out = pallas_stream.blend_forward_stream(
            at, ast, n_ty, n_tx, ts, ch=ch)
        return jnp.sum(out[0]) * 0.0 + c + 1.0

    t = chain(s_fwdk, jnp.float32(0), 10, "fwd kernel")
    by = (
        ENT_WIDTH * k_al * 4  # entry stream read
        + n_tiles * 8 * ts * ts * 4  # tile outputs written
    )
    # Per-entry x per-pixel alpha math (~12 VPU flops) + the 5-channel
    # accumulate riding the MXU as (ts*ts, ch) @ (ch, 8) per chunk.
    n_chunk = k_al // ch
    fl_vpu = k_al * ts * ts * 12
    fl_mxu = n_chunk * (ts * ts) * ch * 8 * 2
    add("pallas blend forward", t, by, fl_vpu,
        note=f"+{fl_mxu/1e9:.0f} GFLOP MXU accum")

    cot = jnp.asarray(rngf.rand(n_tiles, 8, ts * ts), jnp.float32)

    def s_bwdk(c):
        at = aligned + c * 1e-20
        de = pallas_stream.blend_backward_stream(
            at, ast, cot, n_ty, n_tx, ts, ch=ch)
        return jnp.sum(de[0, :8]) * 0.0 + c + 1.0

    t = chain(s_bwdk, jnp.float32(0), 10, "bwd kernel")
    by = (
        ENT_WIDTH * k_al * 4  # entry stream read (recompute)
        + n_tiles * 8 * ts * ts * 4  # cotangents read
        + ENT_WIDTH * k_al * 4  # d_ent written
    )
    fl_vpu = k_al * ts * ts * 30  # replay + grad chains
    add("pallas blend backward", t, by, fl_vpu)

    # ---- K->N reduce (6-op sort + windowed segment sum) --------------------
    from dogs_tpu.raster.pallas_reduce import pack_bf16_pairs, unpack_bf16_pairs

    d_ent = jnp.asarray(rngf.rand(ENT_WIDTH, k_al), jnp.float32)

    def s_kn(c):
        d = d_ent + c * 1e-20
        ops = (ai,) + tuple(
            pack_bf16_pairs(d[2 * i], d[2 * i + 1]) for i in range(5)
        )
        sorted_ops = jax.lax.sort(ops, num_keys=1)
        sg = sorted_ops[0]
        cols = []
        for v in sorted_ops[1:]:
            hi, lo = unpack_bf16_pairs(v)
            cols += [hi.astype(jnp.float32), lo.astype(jnp.float32)]
        step_ = 1
        while step_ < cfg.max_tiles_per_gaussian:
            same = sg[:-step_] == sg[step_:]
            cols = [
                jnp.concatenate(
                    [cc[: k_al - step_] + jnp.where(same, cc[step_:], 0.0),
                     cc[k_al - step_:]])
                for cc in cols
            ]
            step_ *= 2
        vals = jnp.stack(cols, axis=-1)
        e2 = jnp.arange(k_al, dtype=jnp.int32)
        bpos = jnp.full((n + TRASH_ROWS + 1,), k_al, jnp.int32).at[sg].min(
            e2)[: n + TRASH_ROWS]
        present = bpos < k_al
        d_rows = jnp.where(
            present[:, None], vals[jnp.minimum(bpos, k_al - 1)], 0.0)
        return jnp.sum(d_rows[0]) * 0.0 + c + 1.0

    t = chain(s_kn, jnp.float32(0), 10, "K->N reduce")
    by = (
        6 * k_al * 4 * 2  # 6 sort operands in + out (mandatory single pass)
        + 4 * 10 * k_al * 4  # 4 doubling passes over 10 f32 columns
        + n * ENT_WIDTH * 4  # d_rows written
    )
    add("K->N reduce (sort+segsum)", t, by,
        note="suffix-doubling passes counted; sort extra passes not")

    # ---- SSIM fwd+bwd ------------------------------------------------------
    from dogs_tpu.raster.ssim import ssim as ssim_fn

    gt = jnp.asarray(rngf.rand(h, w, 3), jnp.float32)
    img0 = jnp.asarray(rngf.rand(h, w, 3), jnp.float32)

    def s_ssim(c):
        im = img0 + c * 1e-20
        g = jax.grad(lambda x: 1.0 - ssim_fn(x, gt))(im)
        return jnp.sum(g[0, 0]) * 0.0 + c + 1.0

    t = chain(s_ssim, jnp.float32(0), 20, "ssim")
    npix = h * w * 3
    # 5 blurred maps fwd + 4 bwd, each an 11+11 shift-add separable blur.
    by = npix * 4 * (2 + 5 * 2 + 4 * 2)
    fl = npix * 44 * 9  # 22 adds x 2 dims x ~9 blurred quantities
    add("ssim fwd+bwd", t, by, fl)

    # ---- report ------------------------------------------------------------
    print(f"\nv5e assumptions: HBM {HBM_BW/1e9:.0f} GB/s, "
          f"VPU {VPU_F32/1e12:.1f} Tf32/s, MXU {MXU_BF16/1e12:.0f} Tbf16/s")
    print(f"config: N={n}, {w}x{h}, K_sort={k_sort/1e6:.1f}M, "
          f"K_kept={k/1e6:.2f}M, tiles={n_tiles}")
    hdr = (f"{'stage':28s} {'ms':>7s} {'GB(min)':>8s} {'%HBM':>6s} "
           f"{'GFLOP':>7s} {'%VPU':>6s}  note")
    print(hdr)
    print("-" * len(hdr))
    for label, ms, gb, pct, gf, pv, note in rows:
        print(f"{label:28s} {ms:7.2f} {gb:8.3f} {pct:6.1f} "
              f"{gf:7.1f} {pv:6.1f}  {note}")


if __name__ == "__main__":
    main()
