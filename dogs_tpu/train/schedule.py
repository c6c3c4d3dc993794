"""Step-indexed training schedules shared by the single-device trainer and
the ADMM master (reference: conerf/trainers/gaussian_trainer.py:309-330).

Both trainers chain steps into one jit dispatch, and a chunk must never
span a schedule regime switch (the compiled step is specialized on SH
degree and image resolution) or a host event (densify / opacity reset /
prune mutate state between dispatches). Keeping the schedule math and the
chunk-boundary rule in ONE place is load-bearing: if the two trainers
disagreed, the chained path would silently run steps under a stale
degree/resolution with no crash.
"""

from __future__ import annotations


def active_sh_degree(cfg, step: int) -> int:
    """SH-degree annealing: +1 every `sh_increase_interval` steps
    (gaussian_trainer.py:329-330)."""
    return min(step // cfg.sh_increase_interval, cfg.max_sh_degree)


def c2f_interval(cfg) -> int:
    """Steps per coarse-to-fine stage (gaussian_trainer.py:309-319)."""
    return max(min(20000, cfg.densify_end_iter) // 3, 1)


def training_resolution(cfg, step: int) -> int:
    """Coarse-to-fine downsample factor (8 -> 4 -> 2 -> 1)."""
    if not cfg.coarse_to_fine:
        return 1
    return 2 ** max(3 - step // c2f_interval(cfg) - 1, 0)


def chunk_len(
    cfg,
    s0: int,
    end: int,
    *,
    chain_steps: int,
    extra_intervals: tuple[int, ...] = (),
    extra_boundaries: tuple[int, ...] = (),
) -> int:
    """Longest chain starting at step s0 (1-indexed) that crosses no host
    event and no regime switch.

    Events (densify / opacity reset / prune / white-background kick / the
    caller's log/val/ckpt cadences) fire AFTER a step, so a chunk may END
    at an event step. Regime switches (SH degree, coarse-to-fine
    resolution) happen AT step m, so a chunk must end BEFORE m unless it
    starts there. `extra_boundaries` are steps a chunk must not cross nor
    end past (e.g. profiler start).
    """
    s = s0 - 1
    k = min(chain_steps, end - s)
    nxt = lambda iv: (s // iv + 1) * iv
    for iv in (
        cfg.densification_interval,
        cfg.opacity_reset_interval,
        *extra_intervals,
    ):
        if iv and iv > 0:
            k = min(k, nxt(iv) - s)
    for p in cfg.prune_iterations:
        if p >= s0:
            k = min(k, p - s)
    if cfg.white_background and cfg.densify_start_iter >= s0:
        k = min(k, cfg.densify_start_iter - s)
    regimes = [cfg.sh_increase_interval] if cfg.sh_increase_interval else []
    if cfg.coarse_to_fine:
        regimes.append(c2f_interval(cfg))
    for iv in regimes:
        k = min(k, (s0 // iv + 1) * iv - s0)  # next switch strictly after s0
    for b in extra_boundaries:
        if b > s0:
            k = min(k, b - s0)
    return max(k, 1)
