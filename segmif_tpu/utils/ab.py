"""Trace-time A/B switch registry: ONE env var for every measured variant.

Every layout/kernel variant that LOST an in-context A/B on v5e (verdicts in
OPTIMIZATION.md; summary table in README.md) is kept as a re-measurement
hook behind a single namespaced env var instead of its own flag:

    SEGMIF_AB=token[,token...]         e.g. SEGMIF_AB=conv1_paired
    SEGMIF_AB=phase_max_plane=28800    value tokens override tuning knobs

All tokens are read at TRACE time — flipping SEGMIF_AB after a function is
jitted has no effect; build a fresh jit per variant (every experiment
script does). Unknown tokens raise immediately: a typo'd token silently
measuring the DEFAULT path is the worst possible A/B failure mode.

The registry below is exhaustive; each entry records the measured verdict
so the README table can be generated from one place.
"""
from __future__ import annotations

import os

# token -> one-line measured verdict (OPTIMIZATION.md has the full story)
KNOWN = {
    "conv1_paired": "one paired entry conv+split: LOST e16 (+36 ms core)",
    "conv2_split": "tail conv2 on x1/x2 halves, no concat: LOST e16 (+6.7 ms)",
    "ffm_tokens": "round-1 FFM token flattening: LOST e7 r3 (153.2 vs 146.4)",
    "ffm_barrier": "optimization_barrier around FFM: no effect (r1 add. 6)",
    "ffm_pallas": "two-pass fused CrossPath kernel: LOST add. 13 (+4.6 ms)",
    "strips_trunk": "strip-persistent trunk: LOST e10 (142.1 vs 134.1)",
    "strips_gram_slice": "gram via row-window slice: LOST e10 (+1.1 ms)",
    "halos_concat": "halo refresh via concat, not DUS: LOST e10 (+3.3 ms)",
    "phase_split_reshape": "reshape/transpose phase split: LOST e7 (+9.4 ms)",
    "drdb_phase_nostrip": "whole-plane DRDB, no strips: LOST e7 (+26 ms)",
    "drdb_pallas": "round-1 fused image-space DRDB kernel: LOST e11 (1.5x)",
    "drdb_no_phase": "disable phase decomposition (grouped conv fallback)",
    "drdb_bwd_tg": "target-grouped custom DRDB backward: LOST r5 "
                   "(11.14 vs 11.48 pairs/s train — wide d-src writes)",
    "remat_ffm": "rematerialize the FFM under grad (pre-r5 default): "
                 "LOST r5 (11.48 vs 11.89 pairs/s train); keeps HBM lower "
                 "for memory-constrained shapes",
    "pallas_tail": "fused DRDB-tail kernel: LOST add. 6 (relayout tax)",
    "drdb_int8": "int8 DRDB conv path (round-4 A/B; see OPTIMIZATION.md)",
    "drdb_int8_pallas": "fused int8 whole-DRDB kernel (round-4 attempt)",
    "phase_max_plane": "DRDB phase-strip px cap (default 22400, e19 sweep)",
    "tail_max_plane": "fusion-tail strip px cap (default 42000, e18 sweep)",
}

# knobs that carry a numeric value: a bare token (no '=value') would read as
# True and int(True) == 1 would silently collapse the strip caps to 1 px —
# exactly the silent-mismeasurement failure mode this registry exists to kill
VALUE_KNOBS = {"phase_max_plane", "tail_max_plane"}

_cache: dict | None = None


def _parse() -> dict:
    global _cache
    raw = os.environ.get("SEGMIF_AB", "")
    # no memoization across env changes: tests/experiments mutate SEGMIF_AB
    # between (fresh) jits, so parse per call but validate against KNOWN
    out = {}
    for tok in raw.split(","):
        tok = tok.strip()
        if not tok:
            continue
        name, _, val = tok.partition("=")
        if name not in KNOWN:
            raise ValueError(
                f"unknown SEGMIF_AB token {name!r}; known: {sorted(KNOWN)}")
        if name in VALUE_KNOBS and not val:
            raise ValueError(
                f"SEGMIF_AB token {name!r} requires '=value' "
                f"(bare token would silently read as 1)")
        out[name] = val if val else True
    return out


def ab(name: str, default=None):
    """Value of A/B token `name`: True for bare tokens, the string after
    '=' for value tokens, `default` when absent. Trace-time only."""
    if name not in KNOWN:
        raise KeyError(f"unregistered A/B token {name!r}")
    return _parse().get(name, default)
