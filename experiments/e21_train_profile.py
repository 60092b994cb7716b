"""E21 (round 4): profile + attack the fusion-phase TRAIN step.

VERDICT r3 weak #3: training (8.61 pairs/s/chip, addendum 9) was measured
but never decomposed. This experiment:

 1. times the round>=2 fusion train step (taps + fwd/bwd through the
    fusion net AND the frozen-seg CE + DWA + adamw, the reference's
    train.py:338-390 workload) and captures an hlo_stats profile
    (categories, fwd/bwd split by transpose-name heuristic, top ops);
 2. A/Bs the remat granularity: remat everywhere (round-3 default) vs
    remat fusion-only (the frozen seg branch keeps activations) vs remat
    seg-only vs none — the remat policy was chosen once to stop an OOM,
    never measured for TIME;
 3. A/Bs the int8 DRDB path under training (fwd-only quantization is not
    built for grads — expected to fail or fall back; records which).

Run on v5e:  python experiments/e21_train_profile.py [--profile]
"""
import argparse
import collections
import time

import _cache

import jax
import jax.numpy as jnp
from jax import lax

_cache.enable()

from segmif_tpu.models.network import JointPipeline  # noqa: E402
from segmif_tpu.train.optimizer import adamw_poly  # noqa: E402
from segmif_tpu.train.steps import (FusionTrainState,  # noqa: E402
                                    make_fusion_train_step)


def build(remat: bool, remat_seg, b, h, w, iters):
    model = JointPipeline("mit_b3", num_classes=9, dtype=jnp.bfloat16,
                          remat=remat, remat_seg=remat_seg)
    rng = jax.random.PRNGKey(0)
    ir = jax.random.uniform(rng, (b, h, w, 1), jnp.float32)
    vis = jax.random.uniform(rng, (b, h, w, 3), jnp.float32)
    variables = model.init(rng, ir[:1], vis[:1])
    label = jnp.zeros((b, h, w), jnp.int32)
    batch = {"ir": ir, "vis": vis, "guide": vis, "label": label}
    seg_vars = {"params": {"seg": variables["params"]["seg"]},
                "batch_stats": {"seg": variables.get(
                    "batch_stats", {}).get("seg", {})}}
    tx = adamw_poly(1e-4, 0, 20000)
    state0 = FusionTrainState.create(variables["params"]["fusion"], tx)
    step = make_fusion_train_step(model, tx, round1=False)

    @jax.jit
    def train_many(state, seg_vars, batch_):
        def body(carry, _):
            st, tot = carry
            st, metrics = step(st, seg_vars, batch_, jnp.float32(0.2))
            return (st, tot + metrics["loss"]), ()
        (st, tot), _ = jax.lax.scan(body, (state, jnp.float32(0)), None,
                                    length=iters)
        return tot

    return lambda: float(train_many(state0, seg_vars, batch)), train_many, \
        (state0, seg_vars, batch)


def timed(run, iters, reps=3):
    run()
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        run()
        ts.append(time.perf_counter() - t0)
    return min(ts) / iters * 1000


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--profile", action="store_true")
    ap.add_argument("--iters", type=int, default=4)
    ap.add_argument("--only", default="",
                    help="substring filter on config labels (skip the "
                         "remote-compiler-crashing no-remat configs on "
                         "reruns)")
    args = ap.parse_args()
    b, h, w = 8, 480, 640

    results = {}
    for label, remat, remat_seg in (
            ("remat everywhere (default)", True, None),
            ("remat fusion-only", True, False),
            ("remat seg-only", False, True),
            ("no remat", False, False)):
        if args.only and args.only not in label:
            continue
        try:
            run, many, margs = build(remat, remat_seg, b, h, w, args.iters)
            t = timed(run, args.iters)
            results[label] = (t, many, margs)
            print(f"train step, {label:28s}: {t:7.1f} ms "
                  f"({b / t * 1000:5.2f} pairs/s)", flush=True)
        except Exception as e:
            print(f"train step, {label:28s}: FAILED "
                  f"{type(e).__name__}: {str(e)[:140]}", flush=True)

    if args.profile and results:
        from e8_profile_r3 import TRACE_DIR, hlo_stats

        # profile the round-4+ default (fusion-only remat) when present,
        # else the first measured config
        key = ("remat fusion-only" if "remat fusion-only" in results
               else next(iter(results)))
        print(f"\nprofiling config: {key}", flush=True)
        _, many, (st, sv, bt) = results[key]
        float(many(st, sv, bt))
        jax.profiler.start_trace(TRACE_DIR)
        float(many(st, sv, bt))
        jax.profiler.stop_trace()
        obj = hlo_stats(TRACE_DIR)
        cols = [c["label"] if isinstance(c, dict) else c
                for c in obj["cols"]]
        idx = {c: i for i, c in enumerate(cols)}
        per_cat = collections.Counter()
        per_dir = collections.Counter()
        parsed = []
        for r in obj["rows"]:
            c = [x.get("v") if isinstance(x, dict) else x for x in r["c"]]
            cat = c[idx["HLO op category"]] or "?"
            t_us = float(c[idx["Total self time (us)"]] or 0.0)
            name = str(c[idx["Framework op name"]]
                       or c[idx["HLO op name"]] or "")
            per_cat[cat] += t_us
            lname = name.lower()
            if "transpose(" in lname or "/vjp" in lname or "grad" in lname:
                per_dir["backward-ish"] += t_us
            elif "adamw" in lname or "update" in lname:
                per_dir["optimizer"] += t_us
            else:
                per_dir["forward-ish"] += t_us
            parsed.append((t_us, cat, name,
                           c[idx["Bound by"]],
                           float(c[idx["Normalized GFLOP/s"]] or 0)))
        parsed.sort(reverse=True)
        total = sum(per_cat.values())
        d = args.iters
        print(f"\n== train-step profile ({total/d/1000:.1f} ms/step "
              f"self-time) ==")
        for cat, us in per_cat.most_common():
            print(f"  {cat:30s} {us/d/1000:7.2f} ms/step "
                  f"({us/total*100:4.1f}%)")
        print("\n== fwd/bwd heuristic split ==")
        for p, us in per_dir.most_common():
            print(f"  {p:14s} {us/d/1000:7.2f} ms/step")
        print("\n== top 40 ops (ms/step) ==")
        import re
        for t_us, cat, name, bound, gfs in parsed[:40]:
            short = re.sub(r"jit\(train_many\)/", "", name)
            print(f"  {t_us/d/1000:7.3f} [{str(cat)[:14]:14s}] "
                  f"bound={str(bound):8s} {gfs:8.0f}GF/s {short[:100]}")
        print("\n== top 30 NON-conv ops (ms/step) ==")
        nonconv = [p for p in parsed
                   if "convolution" not in str(p[1]) and "custom" not in
                   str(p[1])]
        for t_us, cat, name, bound, gfs in nonconv[:30]:
            short = re.sub(r"jit\(train_many\)/", "", name)
            print(f"  {t_us/d/1000:7.3f} [{str(cat)[:14]:14s}] "
                  f"bound={str(bound):8s} {gfs:8.0f}GF/s {short[:110]}")


if __name__ == "__main__":
    main()
