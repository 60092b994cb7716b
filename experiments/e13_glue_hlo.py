"""E13 (round 3): name the anonymous glue — map the profile's
constant_dynamic-update-slice_fusion.N / copy.N ops (22 ms 'other/glue' in
e12) to their HLO definitions so the next layout fix targets the right
producer. Dumps the optimized HLO of the served fusion core and prints the
definition line (operands + shapes) of every DUS/copy fusion.
"""
import re

import jax
import jax.numpy as jnp

import _cache

_cache.enable()

from segmif_tpu.models.network import JointPipeline  # noqa: E402


def main():
    b, h, w = 8, 480, 640
    model = JointPipeline("mit_b3", num_classes=9, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    ir = jax.random.uniform(rng, (b, h, w, 1), jnp.float32)
    vis = jax.random.uniform(rng, (b, h, w, 3), jnp.float32)
    variables = model.init(rng, ir[:1], vis[:1])

    @jax.jit
    def full(ir_, vis_):
        fr, fy, logits = model.apply(variables, ir_, vis_)
        return fr, logits

    txt = full.lower(ir, vis).compile().as_text()
    print(f"HLO: {len(txt.splitlines())} lines")
    # find fusion computations whose root is dynamic-update-slice over a
    # constant/broadcast operand, plus big copies
    for m in re.finditer(
            r"^\s*(%?[\w.\-]*(?:dynamic-update-slice|copy)[\w.\-]*) = "
            r"([^\n]+)", txt, re.M):
        print(m.group(0).strip()[:240])
    print("\n== fusion computations containing dynamic-update-slice ==")
    # walk computation blocks
    blocks = re.split(r"\n(?=%?\w[\w.\-]* \{|\w[\w.\-]*\.\d+ \{)", txt)
    for blk in blocks:
        head = blk.splitlines()[0] if blk.splitlines() else ""
        if "dynamic-update-slice" in blk and (
                "fused_computation" in head or "fusion" in head):
            lines = blk.splitlines()
            print("----", head[:160])
            for ln in lines[1:]:
                if ("dynamic-update-slice" in ln or "constant" in ln
                        or "parameter" in ln or "ROOT" in ln):
                    print("   ", ln.strip()[:220])
            if len(lines) > 40:
                print("    ... (%d lines)" % len(lines))


if __name__ == "__main__":
    main()
