"""Property tests for the shared step-schedule module (train/schedule.py).

Both the single-device trainer and the ADMM master chain steps into one jit
dispatch; `chunk_len` is the single place that decides where a chain may
end. These tests pin its contract against a brute-force oracle so the two
trainers can never silently disagree again (the bug class the round-3
review flagged: a chunk chaining across an SH/C2F regime switch runs steps
under a stale compiled step with no crash).
"""

import itertools

from dogs_tpu.train import schedule
from dogs_tpu.train.trainer import TrainerConfig


def _is_event(cfg, s, extra_intervals):
    if cfg.densification_interval and s % cfg.densification_interval == 0:
        return True
    if cfg.opacity_reset_interval and s % cfg.opacity_reset_interval == 0:
        return True
    for iv in extra_intervals:
        if iv and s % iv == 0:
            return True
    if s in cfg.prune_iterations:
        return True
    if cfg.white_background and s == cfg.densify_start_iter:
        return True
    return False


def _valid(cfg, s0, k, end, extra_intervals, extra_boundaries):
    if s0 + k - 1 > end:
        return False
    # Events fire AFTER a step: none may fall strictly inside the chunk
    # (the chunk may END at an event step).
    if any(_is_event(cfg, s, extra_intervals) for s in range(s0, s0 + k - 1)):
        return False
    # Regime switches happen AT a step: degree/resolution must be uniform
    # across every step the chunk executes.
    degs = {schedule.active_sh_degree(cfg, s) for s in range(s0, s0 + k)}
    ress = {schedule.training_resolution(cfg, s) for s in range(s0, s0 + k)}
    if len(degs) > 1 or len(ress) > 1:
        return False
    # Boundaries (e.g. profiler start) must not be inside nor at the end+1
    # reachable range: the chunk ends strictly before them.
    if any(s0 < b <= s0 + k - 1 for b in extra_boundaries):
        return False
    return True


def _valid_conservative(cfg, s0, k, end, extra_intervals, extra_boundaries):
    """chunk_len's exact (slightly stronger) rule: chunks also end at SH/C2F
    interval multiples even once those schedules have saturated (degree at
    max, resolution at 1) — used for the maximality check only."""
    if not _valid(cfg, s0, k, end, extra_intervals, extra_boundaries):
        return False
    regimes = [cfg.sh_increase_interval] if cfg.sh_increase_interval else []
    if cfg.coarse_to_fine:
        regimes.append(schedule.c2f_interval(cfg))
    for iv in regimes:
        if any(s0 < m <= s0 + k - 1 for m in range(iv, s0 + k, iv)):
            return False
    return True


CFGS = [
    TrainerConfig(
        densification_interval=40, opacity_reset_interval=90,
        sh_increase_interval=70, max_sh_degree=3, coarse_to_fine=True,
        densify_start_iter=17, densify_end_iter=150,
        prune_iterations=(123,), white_background=True, chain_steps=25,
    ),
    TrainerConfig(
        densification_interval=100, opacity_reset_interval=3000,
        sh_increase_interval=1000, max_sh_degree=3, coarse_to_fine=False,
        densify_start_iter=500, densify_end_iter=15000,
        prune_iterations=(), white_background=False, chain_steps=200,
    ),
]
EXTRAS = [((), ()), ((100, 0, 250), ()), ((), (33,))]


def test_chunk_len_valid_and_maximal():
    for cfg, (ivs, bounds) in itertools.product(CFGS, EXTRAS):
        end = 400
        s0 = 1
        while s0 <= end:
            k = schedule.chunk_len(
                cfg, s0, end,
                chain_steps=cfg.chain_steps,
                extra_intervals=ivs,
                extra_boundaries=bounds,
            )
            assert k >= 1
            assert _valid(cfg, s0, k, end, ivs, bounds), (s0, k)
            # Maximal: one more step would exceed the chain budget, the end,
            # or break a constraint.
            if k < cfg.chain_steps and s0 + k <= end:
                assert not _valid_conservative(
                    cfg, s0, k + 1, end, ivs, bounds
                ), (s0, k)
            s0 += k


def test_c2f_resolution_ladder():
    cfg = TrainerConfig(coarse_to_fine=True, densify_end_iter=15000)
    iv = schedule.c2f_interval(cfg)
    assert iv == 5000
    assert schedule.training_resolution(cfg, 1) == 4
    assert schedule.training_resolution(cfg, iv) == 2
    assert schedule.training_resolution(cfg, 2 * iv) == 1
    assert schedule.training_resolution(cfg, 10 * iv) == 1
    off = TrainerConfig(coarse_to_fine=False)
    assert schedule.training_resolution(off, 1) == 1


def test_sh_annealing():
    cfg = TrainerConfig(sh_increase_interval=1000, max_sh_degree=3)
    assert schedule.active_sh_degree(cfg, 999) == 0
    assert schedule.active_sh_degree(cfg, 1000) == 1
    assert schedule.active_sh_degree(cfg, 30000) == 3
