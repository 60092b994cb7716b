"""Benchmark: fused+segmented 480x640 IR-VIS pairs/sec/chip.

The north-star metric (BASELINE.json): run the FULL SegMiF inference
pipeline — seg-encoder feature taps on the guide, fusion network with
hierarchical interactive attention, YCrCb recombination, and the
mit_b3 SegFormer segmentation of the fused image — as ONE jitted XLA graph
in bfloat16, and measure steady-state throughput on one chip.

Prints one JSON line: {"metric", "value", "unit", "vs_baseline"} where
vs_baseline is value / 400 (the >=400 pairs/sec/chip target; the reference
publishes no throughput numbers of its own).

Time-to-first-JSON is bounded by design (the round-1 driver run timed out
before printing anything, rc=124):
  * the JAX persistent compilation cache is enabled under ./.jax_cache so
    only the first-ever run pays full compile;
  * a provisional JSON line is printed after the FIRST timed rep — if the
    driver kills the process later, a parseable number already exists
    (the final line, printed after 3 reps, supersedes it);
  * warmup is a single rep and the scan length is modest (16 iters).

Modes (default is the north-star single-chip number):
  --mesh_data N   DP-scaling microbench: shard batch over an N-device data
                  mesh (pairs/sec aggregate + per-chip).
  --serving       serving mode ONLY: guide taps precomputed outside the loop
                  (per-dataset constants at inference; see
                  OPTIMIZATION.md "Next hotspots" #3).

A plain `python bench.py` run emits ALL modes — a fusion-phase TRAIN-step
line first (VERDICT r4 weak #5: per-round train throughput belongs in the
same plain-run artifact as the inference numbers), then int8-serving,
serving (the reference's actual deployment semantics: static per-dataset
guide, test_fusion.py:100), and the default-mode provisional + final lines.
The driver parses the LAST line, which stays the default mode.
"""
from __future__ import annotations

import argparse
import json
import os
import time


def _tpu_reachable(timeout_s: float = 150.0) -> bool:
    """Probe TPU backend init in a SUBPROCESS with a hard timeout.

    Merely initializing the axon TPU plugin (any `jax.devices()` call)
    blocks forever when its tunnel is wedged — in-process watchdogs can't
    recover from that. A killable subprocess probe keeps time-to-first-JSON
    bounded: if the probe can't init within timeout_s, the bench pins the
    CPU platform and still emits a parseable (tiny-shape) number.
    """
    import subprocess
    import sys

    for attempt in range(2):  # one retry: a busy single-core host can
        try:                  # starve the first probe's plugin init
            proc = subprocess.run(
                [sys.executable, "-c",
                 "import jax; d=jax.devices(); "
                 "print(d[0].platform)"],
                capture_output=True, text=True, timeout=timeout_s)
            if "tpu" in proc.stdout:
                return True
        except (subprocess.TimeoutExpired, OSError):
            pass
    return False


def _enable_compile_cache():
    import jax

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass  # older jax without these flags: just run cold


def _emit(h, w, batch, pairs_per_sec, backbone="mit_b3", provisional=False,
          extra=""):
    tag = " PROVISIONAL" if provisional else ""
    result = {
        "metric": f"fused+segmented {h}x{w} IR-VIS pairs/sec/chip "
                  f"({backbone} joint pipeline, bf16, batch {batch}{extra})"
                  + tag,
        "value": round(pairs_per_sec, 2),
        "unit": "pairs/sec/chip",
        "vs_baseline": round(pairs_per_sec / 400.0, 4),
    }
    print(json.dumps(result), flush=True)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mesh_data", type=int, default=0,
                        help="DP scaling: shard batch over N devices")
    parser.add_argument("--mesh_model", type=int, default=0,
                        help="TP cost probe: shard params over N devices "
                             "(PARALLELISM.md TP table; CPU mesh ok)")
    parser.add_argument("--serving", action="store_true",
                        help="precompute guide taps outside the loop")
    parser.add_argument("--int8", action="store_true",
                        help="serving mode with the calibrated int8 DRDB "
                             "path (kernels/int8.py)")
    parser.add_argument("--train", action="store_true",
                        help="fusion-phase TRAIN-step throughput ONLY "
                             "(round>=2 semantics: guide taps + fwd/bwd "
                             "through the fusion net AND the frozen-seg CE, "
                             "DWA, adamw; fusion-only remat). The plain run "
                             "also emits this line (first, so the driver "
                             "still parses the default-inference line last).")
    parser.add_argument("--iters", type=int, default=16)
    parser.add_argument("--batch", type=int, default=0)
    parser.add_argument("--backbone", default="",
                        help="override the backbone (e.g. mit_b3 for a "
                             "flagship-scale TP probe on the CPU mesh)")
    args = parser.parse_args()

    _enable_compile_cache()
    import jax

    from segmif_tpu.utils.platform import honor_platform_env

    # An explicit JAX_PLATFORMS=cpu must win: the axon plugin IGNORES the
    # env var, so the subprocess probe below would report "tpu" and a CPU
    # mesh run (e.g. --mesh_model on a forced 8-device host mesh) would
    # silently land on the one real chip instead.
    honor_platform_env()
    if os.environ.get("JAX_PLATFORMS", "").lower() == "cpu" or os.environ.get(
            "JAX_PLATFORM_NAME", "").lower() == "cpu":
        pass  # pinned in-process above; skip the TPU probe
    elif not _tpu_reachable():
        # wedged/absent TPU tunnel: pin CPU BEFORE backend init (a bare
        # import would block forever inside the plugin's init)
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from segmif_tpu.models.network import JointPipeline

    platform = jax.devices()[0].platform
    on_tpu = platform == "tpu"
    h, w = (480, 640) if on_tpu else (96, 128)  # tiny fallback off-TPU
    batch = args.batch or (8 if on_tpu else 1)
    iters = args.iters if on_tpu else 2

    backbone = args.backbone or ("mit_b3" if on_tpu else "mit_b0")
    model = JointPipeline(backbone, num_classes=9, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ir = jax.random.uniform(rng, (batch, h, w, 1), jnp.float32)
    vis = jax.random.uniform(rng, (batch, h, w, 3), jnp.float32)
    variables = model.init(rng, ir[:1], vis[:1])

    def measure_train():
        # Fusion-phase training throughput (the reference's train.py hot
        # loop, round>=2: taps on the guide + fusion fwd/bwd + CE through
        # the frozen seg net + DWA + adamw). Same param tree as the
        # inference model, so `variables` is reused; the model instance
        # differs only in remat (fusion-only: the frozen-seg branch keeps
        # its activations, e21 round 4: 702.5 vs 722.7 ms).
        from segmif_tpu.train.optimizer import adamw_poly
        from segmif_tpu.train.steps import (FusionTrainState,
                                            make_fusion_train_step)

        tmodel = JointPipeline(backbone, num_classes=9, dtype=jnp.bfloat16,
                               remat=True, remat_seg=False)
        label = jnp.zeros((batch, h, w), jnp.int32)
        train_batch = {"ir": ir, "vis": vis, "guide": vis, "label": label}
        seg_vars = {"params": {"seg": variables["params"]["seg"]},
                    "batch_stats": {"seg": variables.get(
                        "batch_stats", {}).get("seg", {})}}
        tx = adamw_poly(1e-4, 0, 20000)
        state0 = FusionTrainState.create(variables["params"]["fusion"], tx)
        step = make_fusion_train_step(tmodel, tx, round1=False)

        @jax.jit
        def train_many(state, seg_vars, batch_):
            def body(carry, _):
                st, tot = carry
                st, metrics = step(st, seg_vars, batch_, jnp.float32(0.2))
                return (st, tot + metrics["loss"]), ()
            (st, tot), _ = jax.lax.scan(body, (state, jnp.float32(0)), None,
                                        length=iters)
            return tot

        def run():
            return float(train_many(state0, seg_vars, train_batch))

        extra = ", fusion-phase TRAIN step (fwd+bwd+DWA+adamw, remat)"
        if not on_tpu:
            extra += ", OFF-TPU CPU FALLBACK (tiny shapes, not comparable)"
        run()  # compile + warmup
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        _emit(h, w, batch, batch * iters / min(times), backbone, extra=extra)

    if args.train:
        measure_train()
        return

    n_chips = 1
    if args.mesh_model > 1:
        # TP cost probe (PARALLELISM.md "Tensor parallelism"): params
        # sharded over the model axis, batch replicated. Quantifies whether
        # TP HELPS at this model size (expected: no — 45.6 M params fit one
        # chip; the collectives are pure overhead). Throughput is reported
        # per-replica (not divided by N: all N devices serve ONE stream).
        from segmif_tpu.parallel.mesh import (
            make_mesh, param_shardings, put_replicated)

        mesh = make_mesh(data=1, model=args.mesh_model)
        variables = jax.device_put(
            variables, param_shardings(mesh, variables,
                                       tensor_parallel=True))
        ir = put_replicated(mesh, ir)
        vis = put_replicated(mesh, vis)
    elif args.mesh_data > 1:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from segmif_tpu.parallel.mesh import make_mesh

        n_chips = args.mesh_data
        mesh = make_mesh(data=n_chips, model=1)
        bspec = NamedSharding(mesh, P("data"))
        rspec = NamedSharding(mesh, P())
        ir = jax.device_put(jnp.tile(ir, (n_chips, 1, 1, 1)), bspec)
        vis = jax.device_put(jnp.tile(vis, (n_chips, 1, 1, 1)), bspec)
        variables = jax.device_put(variables, rspec)
        batch = batch * n_chips

    # The whole measurement runs IN-GRAPH (lax.scan with a data dependency
    # between iterations): remote-execution tunnels make per-call
    # block_until_ready unreliable, and per-call dispatch would pollute the
    # steady-state number anyway.
    def build_run(serving: bool, int8: bool = False):
        if serving:
            # Serving mode: the guide taps come from a STATIC per-dataset
            # guide image, so at inference they are constants computed once,
            # not per pair (reference recomputes them per image:
            # test_fusion.py:100).
            smodel, svars = model, variables
            if int8:
                from segmif_tpu.serving import quantize_for_serving

                smodel, svars = quantize_for_serving(model, variables,
                                                     (ir, vis))
            taps = jax.jit(lambda v, g: smodel.apply(
                v, g, method=JointPipeline.guide_taps_raw))(svars, vis)

            @jax.jit
            def pipeline_many(svars, taps, ir, vis):
                def body(carry, _):
                    carry_ir, carry_vis = carry
                    fused_rgb, fused_y, logits = smodel.apply(
                        svars, carry_ir, carry_vis, taps=taps)
                    pred = jnp.argmax(logits, axis=-1)
                    eps = jnp.mean(fused_y) * 1e-7
                    return (carry_ir + eps, carry_vis + eps), (
                        jnp.sum(pred), jnp.mean(fused_rgb))
                carry, outs = jax.lax.scan(body, (ir, vis), None,
                                           length=iters)
                return jnp.sum(carry[0], dtype=jnp.float32) + outs[1][-1]

            return lambda: float(pipeline_many(svars, taps, ir, vis))

        @jax.jit
        def pipeline_many(variables, ir, vis):
            def body(carry, _):
                carry_ir, carry_vis = carry
                # EVERY input must depend on the carry, or XLA hoists the
                # loop-invariant parts (e.g. the guide-encoder pass) out of
                # the loop and the number lies
                fused_rgb, fused_y, logits = model.apply(variables, carry_ir,
                                                         carry_vis)
                pred = jnp.argmax(logits, axis=-1)
                eps = jnp.mean(fused_y) * 1e-7
                return (carry_ir + eps, carry_vis + eps), (jnp.sum(pred),
                                                           jnp.mean(fused_rgb))
            carry, outs = jax.lax.scan(body, (ir, vis), None, length=iters)
            return jnp.sum(carry[0], dtype=jnp.float32) + outs[1][-1]

        return lambda: float(pipeline_many(variables, ir, vis))

    base_extra = ""
    if not on_tpu:
        # a wedged tunnel must not masquerade as a chip number
        base_extra += ", OFF-TPU CPU FALLBACK (tiny shapes, not comparable)"
    if n_chips > 1:
        base_extra += f", DP x{n_chips} (per-chip value)"
    if args.mesh_model > 1:
        base_extra += f", TP x{args.mesh_model} (one stream over N devices)"

    def measure(serving: bool, provisional_line: bool, int8: bool = False):
        run = build_run(serving, int8)
        extra = (", serving/precomputed-taps" if serving else "") \
            + (", int8-DRDB" if int8 else "") + base_extra
        run()  # compile + warmup (single rep)
        t0 = time.perf_counter()
        run()  # host fetch = real barrier
        dt_first = time.perf_counter() - t0
        if provisional_line:
            _emit(h, w, batch, batch * iters / dt_first / n_chips, backbone,
                  provisional=True, extra=extra)
        times = [dt_first]
        for _ in range(2):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        dt = min(times)
        _emit(h, w, batch, batch * iters / dt / n_chips, backbone,
              extra=extra)

    if args.int8:
        measure(serving=True, provisional_line=True, int8=True)
    elif args.serving:
        measure(serving=True, provisional_line=True)
    elif n_chips > 1 or args.mesh_model > 1:
        measure(serving=False, provisional_line=True)
    else:
        # official artifact: train + int8-serving + serving lines first,
        # default mode LAST (the driver parses the final line). A train-side
        # failure must never cost the inference artifact its lines; the
        # CPU-fallback path skips train entirely (its fwd+bwd compile takes
        # >15 min on the single-core host, blowing time-to-first-JSON, and
        # the tiny-shape number is meaningless anyway — use --train).
        if on_tpu:
            try:
                measure_train()
            except Exception as e:  # noqa: BLE001 — artifact robustness
                print(f"# train line skipped: {type(e).__name__}: {e}",
                      flush=True)
        measure(serving=True, provisional_line=False, int8=True)
        measure(serving=True, provisional_line=False)
        measure(serving=False, provisional_line=True)


if __name__ == "__main__":
    main()
