"""Tile binning: duplicate Gaussians into per-tile depth-sorted lists.

TPU-native equivalent of the CUDA binning stage
(cuda_rasterizer/rasterizer_impl.cu:120-232: InclusiveSum -> duplicateWithKeys
-> RadixSort -> identifyTileRanges). CUDA builds a ragged [tileID|depth] key
list with cub; XLA needs static shapes, so here every Gaussian owns a fixed
budget of MAX_TILES_PER_GAUSSIAN candidate (tile, depth) keys:

  * the tile rect around each projected Gaussian is clamped to the budget
    (large Gaussians keep the tiles nearest their center);
  * per-tile max-alpha culling (the Taming-3DGS trick in
    rasterizer_impl.cu:120-190) drops keys whose best-case alpha inside the
    tile is below 1/255, which removes most of the budget waste;
  * invalid keys get a sentinel tile id and sort to the end;
  * one `jax.lax.sort` over (tile, depth) keys replaces the radix sort;
  * tile ranges come from `searchsorted` instead of identifyTileRanges.

Everything is static-shaped and fuses into a handful of XLA ops.
"""

from __future__ import annotations

import flax.struct
import jax
import jax.numpy as jnp

from dogs_tpu.raster.projection import ALPHA_MIN, ProjectedGaussians


@flax.struct.dataclass
class TileBins:
    """Sorted splat lists per tile. M = N * max_tiles_per_gaussian."""

    sorted_idx: jnp.ndarray  # (M,) gaussian index per entry (depth-sorted per tile)
    sorted_tile: jnp.ndarray  # (M,) tile id per entry (sentinel n_tiles = invalid)
    tile_starts: jnp.ndarray  # (n_tiles + 1,) range offsets into sorted_idx
    num_valid: jnp.ndarray  # () total valid entries (diagnostics)
    num_truncated: jnp.ndarray  # () gaussians whose rect exceeded the budget
    num_pool_truncated: jnp.ndarray  # () gaussians dropped by pool exhaustion
    # () overflow-pool slots DEMANDED (may exceed the pool: utilization
    # telemetry for the trainer's budget shrink reaction).
    num_pool_need: jnp.ndarray


def _tile_rect(
    means2d: jnp.ndarray,
    radius: jnp.ndarray,
    n_tiles_x: int,
    n_tiles_y: int,
    tile_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Per-Gaussian touched tile rectangle (auxiliary.h getRect)."""
    x, y = means2d[:, 0], means2d[:, 1]
    tx0 = jnp.clip(jnp.floor((x - radius) / tile_size), 0, n_tiles_x).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((y - radius) / tile_size), 0, n_tiles_y).astype(jnp.int32)
    tx1 = jnp.clip(
        jnp.floor((x + radius) / tile_size) + 1, 0, n_tiles_x
    ).astype(jnp.int32)
    ty1 = jnp.clip(
        jnp.floor((y + radius) / tile_size) + 1, 0, n_tiles_y
    ).astype(jnp.int32)
    return tx0, ty0, tx1, ty1


def build_tile_bins(
    proj: ProjectedGaussians,
    height: int,
    width: int,
    tile_size: int = 16,
    max_tiles_per_gaussian: int = 25,
    tile_culling: bool = True,
    bin_capacity: int | None = None,
    base_tiles: int | None = None,
    overflow_capacity: int | None = None,
) -> TileBins:
    """Bin projected Gaussians into per-tile depth-ordered index lists.

    With `base_tiles` set (< max_tiles_per_gaussian) the candidate list is
    TWO-TIER: every Gaussian owns `base_tiles` key slots, and Gaussians
    whose clamped rect needs more draw the remainder from a shared overflow
    pool of `overflow_capacity` slots (default 2N). The candidate TILE SET
    is identical to the single-tier layout — only the storage changes — but
    the dominant `lax.sort` shrinks from N*max_tiles to N*base_tiles + pool
    (6M -> 3M keys on the 500k bench: most Gaussians touch <= 4 tiles, so a
    flat 12-per-Gaussian budget is ~70% sentinel padding)."""
    n_tiles_x = -(-width // tile_size)
    n_tiles_y = -(-height // tile_size)
    n_tiles = n_tiles_x * n_tiles_y
    sentinel = jnp.int32(n_tiles)

    n = proj.means2d.shape[0]
    mt = max_tiles_per_gaussian
    visible = proj.radius > 0.0

    tx0, ty0, tx1, ty1 = _tile_rect(
        proj.means2d, proj.radius, n_tiles_x, n_tiles_y, tile_size
    )
    rect_w = tx1 - tx0
    rect_h = ty1 - ty0
    truncated = visible & ((rect_w * rect_h) > mt)

    # Clamp the rect to the key budget, keeping it centered on the Gaussian.
    # Budget split: width first, then height gets the remaining rows.
    bw = jnp.minimum(rect_w, mt)
    bh = jnp.minimum(rect_h, jnp.maximum(mt // jnp.maximum(bw, 1), 1))
    # Re-balance toward square-ish coverage when both axes overflow.
    side = jnp.int32(max(int(mt**0.5), 1))
    both_over = (rect_w > side) & (rect_h > side)
    bw = jnp.where(both_over, jnp.minimum(rect_w, side), bw)
    bh = jnp.where(both_over, jnp.minimum(rect_h, mt // jnp.maximum(bw, 1)), bh)

    ctx = jnp.clip(
        (proj.means2d[:, 0] / tile_size).astype(jnp.int32), 0, n_tiles_x - 1
    )
    cty = jnp.clip(
        (proj.means2d[:, 1] / tile_size).astype(jnp.int32), 0, n_tiles_y - 1
    )
    sx0 = jnp.clip(ctx - bw // 2, tx0, jnp.maximum(tx1 - bw, tx0))
    sy0 = jnp.clip(cty - bh // 2, ty0, jnp.maximum(ty1 - bh, ty0))

    def cull(tix, tiy, mux, muy, a, b, c, opa, valid):
        """Taming-3DGS style per-tile culling (rasterizer_impl.cu:120-190):
        max achievable alpha inside the tile must exceed 1/255 — EXACT here,
        not a clamped-point bound. Alpha is only ever evaluated at pixel
        centers (tiled.py:_tile_pixels puts them at integer + 0.5), and
        q(d) = 0.5(a dx^2 + c dy^2) + b dx dy is convex (det > 0 enforced at
        projection), so its minimum over the tile's pixel-center rect is 0
        when the splat center lies inside, else the min over the four edges
        — each a closed-form 1-D quadratic clamp. Strictly tighter than the
        clamped-point + axis-aligned bound it replaces (which under-counted
        q for rotated splats, b != 0, and used the full-pixel rect instead
        of the half-pixel-inset center rect). Render-neutral by construction:
        the blend masks per-pixel alpha < ALPHA_MIN to zero, so any tile
        whose EXACT max alpha is below the threshold contributes nothing.
        All args broadcast elementwise: per-gaussian (1, N) rows against
        (mta, N) tiles, or flat per-slot (P,) against (P,) tiles."""
        px0 = tix.astype(jnp.float32) * tile_size
        py0 = tiy.astype(jnp.float32) * tile_size
        dxl = px0 + 0.5 - mux
        dxu = px0 + (tile_size - 0.5) - mux
        dyl = py0 + 0.5 - muy
        dyu = py0 + (tile_size - 0.5) - muy
        ae = jnp.maximum(a, 1e-12)
        ce = jnp.maximum(c, 1e-12)

        def q(dx, dy):
            return 0.5 * (a * dx * dx + c * dy * dy) + b * dx * dy

        def edge_x(d):  # dx pinned to an edge, minimize the 1-D quadratic
            return q(d, jnp.clip(-b * d / ce, dyl, dyu))

        def edge_y(d):
            return q(jnp.clip(-b * d / ae, dxl, dxu), d)

        qmin = jnp.minimum(
            jnp.minimum(edge_x(dxl), edge_x(dxu)),
            jnp.minimum(edge_y(dyl), edge_y(dyu)),
        )
        inside = (dxl <= 0.0) & (dxu >= 0.0) & (dyl <= 0.0) & (dyu >= 0.0)
        qmin = jnp.where(inside, 0.0, jnp.maximum(qmin, 0.0))
        return valid & (opa * jnp.exp(-qmin) >= ALPHA_MIN)

    # Pack (tile, depth) into ONE int32 sort key: tile in the top bits, the
    # top `depth_bits` of the positive-float bit pattern below (positive f32
    # bits compare monotonically as ints, so truncating just quantizes the
    # depth ORDER — ~1e-3 relative resolution, far below any visible effect).
    # (A depth-rank permutation scheme that embeds the rank for a 1-operand
    # sort was measured and REJECTED: the 500k permutation gather + its VJP
    # cost ~18 ms against a ~3 ms sort saving.)
    depth_bits = max(30 - max(n_tiles.bit_length(), 1), 8)
    assert (n_tiles << depth_bits) < 2**31, (n_tiles, depth_bits)
    dq = jax.lax.bitcast_convert_type(
        jnp.maximum(proj.depth, 1e-12), jnp.int32
    ) >> (31 - depth_bits)

    two_tier = base_tiles is not None and base_tiles < mt
    mta = base_tiles if two_tier else mt

    # ---- tier A: every gaussian owns `mta` slots ---------------------------
    # Laid out TRANSPOSED (mta, N): the minor dim must be the big one — a
    # (N, mta) array pads mta up to the 128-lane tile, so every fused
    # elementwise pass over it streams 128/mta x the useful bytes (measured
    # ~2.5x faster this way on v5e at N=500k, mta=4).
    j = jnp.arange(mta, dtype=jnp.int32)[:, None]  # (mta, 1)
    bw_ = jnp.maximum(bw, 1)[None, :]
    jy = j // bw_
    jx = j - jy * bw_
    tix = sx0[None, :] + jx
    tiy = sy0[None, :] + jy
    valid = (j < (bw * bh)[None, :]) & visible[None, :]
    if tile_culling:
        valid = cull(
            tix, tiy,
            proj.means2d[None, :, 0], proj.means2d[None, :, 1],
            proj.conic[None, :, 0], proj.conic[None, :, 1],
            proj.conic[None, :, 2], proj.opacity[None, :], valid,
        )
    tile_a = jnp.where(valid, tiy * n_tiles_x + tix, sentinel)
    # Slot-major flatten (all slot-0 candidates, then slot-1, ...): the sort
    # doesn't care about input order, and a (mta, N) reshape is a dense copy.
    key = ((tile_a << depth_bits) | jnp.where(valid, dq[None, :], 0)).reshape(-1)
    # Invalid candidates point their payload at the trash id `n` (NOT their
    # gaussian): downstream the K->N gradient reduction relies on every REAL
    # gaussian's sorted run being <= max_tiles long, and kept-but-invalid
    # sentinel entries sharing real ids would break that bound (notably
    # gaussian 0, which unallocated pool slots used to alias).
    gid = jnp.arange(n, dtype=jnp.int32)
    payload = jnp.where(valid, gid[None, :], n).reshape(-1)
    num_valid = jnp.sum(valid.astype(jnp.int32))
    num_truncated = jnp.sum(truncated.astype(jnp.int32))
    num_pool_truncated = jnp.int32(0)
    num_pool_need = jnp.int32(0)

    if two_tier:
        # ---- tier B: shared overflow pool ---------------------------------
        # Slot -> gaussian mapping is GATHER-form: mark each needy
        # gaussian's pool start (one N-source scatter), integrate with
        # cummax, then ONE packed (N, 12) row gather delivers every
        # per-gaussian value a slot needs. Ten separate 500k gathers
        # measured ~63 ms on v5e; the packed single gather is ~8.5 ms
        # (all packed values are < 2^24, so f32 round-trips exactly).
        pool = overflow_capacity or 2 * n
        need = jnp.where(visible, bw * bh - mta, 0)
        need = jnp.clip(need, 0, mt - mta)
        pstart = jnp.cumsum(need) - need  # (N,)
        total = pstart[-1] + need[-1]
        marks = jnp.zeros((pool,), jnp.int32).at[pstart].max(
            jnp.where(need > 0, gid + 1, 0), mode="drop"
        )
        g = jax.lax.cummax(marks, axis=0) - 1  # slot -> gaussian, -1 = none
        gc = jnp.clip(g, 0, n - 1)
        # The packed carrier must be INT32, with the float fields riding as
        # bitcast int bits — not the other way around. Small ints bitcast to
        # f32 are DENORMALS, and TPU/XLA flushes f32 denormals to zero in
        # some (fusion-dependent!) lowerings of this stack+gather: measured
        # on v5e, the f32-carrier variant silently zeroed sx0/sy0/bw/pstart
        # in the standalone render while surviving inside the fully fused
        # train step — the same model binned 247k entries one way and 564k
        # the other. Integer lanes are never flushed; f32 bits -> i32 ->
        # gather -> f32 is bit-exact.
        f = lambda a: jax.lax.bitcast_convert_type(a, jnp.float32)
        i = lambda a: jax.lax.bitcast_convert_type(a, jnp.int32)
        packed = jnp.stack(
            [
                sx0,
                sy0,
                jnp.maximum(bw, 1),
                bw * bh,
                pstart,
                dq,
                i(proj.means2d[:, 0]),
                i(proj.means2d[:, 1]),
                i(proj.conic[:, 0]),
                i(proj.conic[:, 1]),
                i(proj.conic[:, 2]),
                i(proj.opacity),
            ],
            axis=1,
        )  # (N, 12) int32; float fields ride as bitcast int bits
        rows = packed[gc]  # the one gather
        p = jnp.arange(pool, dtype=jnp.int32)
        l = p - rows[:, 4] + mta
        bwg = rows[:, 2]
        ly = l // bwg
        lx = l - ly * bwg
        tixp = rows[:, 0] + lx
        tiyp = rows[:, 1] + ly
        validp = (g >= 0) & (p < total) & (l < rows[:, 3])
        if tile_culling:
            validp = cull(
                tixp, tiyp, f(rows[:, 6]), f(rows[:, 7]),
                f(rows[:, 8]), f(rows[:, 9]), f(rows[:, 10]), f(rows[:, 11]),
                validp,
            )
        tilep = jnp.where(validp, tiyp * n_tiles_x + tixp, sentinel)
        keyp = (tilep << depth_bits) | jnp.where(validp, rows[:, 5], 0)
        key = jnp.concatenate([key, keyp])
        payload = jnp.concatenate([payload, jnp.where(validp, gc, n)])
        num_valid = num_valid + jnp.sum(validp.astype(jnp.int32))
        # pool exhaustion truncates the tail of late gaussians — tracked
        # separately from the rect-budget clamp so the trainer can react
        # (grow the pool) vs merely report (mt is a perf/quality knob).
        num_pool_truncated = jnp.sum(
            ((pstart + need) > pool) & (need > 0)
        ).astype(jnp.int32)
        num_pool_need = total.astype(jnp.int32)

    # Sort ALL candidates (invalid ones carry the sentinel tile and land at
    # the end), then keep the first bin_capacity. Measured on v5e this beats
    # compact-then-sort: the compaction scatter costs more than the larger
    # sort (scatter time scales with SOURCE size, ~40ms at 8M candidates).
    sorted_key, sorted_idx = jax.lax.sort((key, payload), num_keys=1)
    if bin_capacity is not None and bin_capacity < key.shape[0]:
        sorted_key = sorted_key[:bin_capacity]
        sorted_idx = sorted_idx[:bin_capacity]
    sorted_tile = sorted_key >> depth_bits
    tile_starts = jnp.searchsorted(
        sorted_tile, jnp.arange(n_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)

    return TileBins(
        sorted_idx=sorted_idx,
        sorted_tile=sorted_tile,
        tile_starts=tile_starts,
        num_valid=num_valid,
        num_truncated=num_truncated,
        num_pool_truncated=num_pool_truncated,
        num_pool_need=num_pool_need,
    )


def bins_membership(bins: TileBins, n_gaussians: int) -> jnp.ndarray:
    """(n_tiles, N) bool: which Gaussians were binned to each tile.

    Test-support utility: lets the naive oracle renderer apply exactly the
    same tile-granular support as the production pipeline, so oracle-vs-tiled
    comparisons are exact rather than bounded by the 3-sigma rect cutoff.
    """
    n_tiles = bins.tile_starts.shape[0] - 1
    m = bins.sorted_idx.shape[0]
    entry = jnp.arange(m, dtype=jnp.int32)
    entry_tile = (
        jnp.searchsorted(bins.tile_starts, entry, side="right").astype(jnp.int32) - 1
    )
    entry_tile = jnp.clip(entry_tile, 0, n_tiles)  # invalid tail -> row n_tiles
    member = jnp.zeros((n_tiles + 1, n_gaussians), bool)
    member = member.at[entry_tile, bins.sorted_idx].set(True)
    return member[:n_tiles]
