"""Cheap (trace-only) shape checks: graft entry, mit_b4/b5 variants, the
1080p stretch config — no compilation, just jax.eval_shape."""
import jax
import jax.numpy as jnp
import pytest

# trace-only but flagship-scale traces take 15-25 s each on this host;
# the driver exercises __graft_entry__ directly every round
pytestmark = pytest.mark.slow

from segmif_tpu.config import load_yaml
from segmif_tpu.models.mit import MIT_VARIANTS, MixVisionTransformer
from segmif_tpu.models.network import JointPipeline


def test_graft_entry_lowers():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    fused_rgb, logits = out
    assert fused_rgb.shape == (1, 480, 640, 3)
    assert logits.shape == (1, 120, 160, 9)


def test_mit_b4_b5_shapes_traced():
    for variant in ("mit_b4", "mit_b5"):
        model = MixVisionTransformer(MIT_VARIANTS[variant])
        x = jnp.zeros((1, 64, 64, 3))
        variables = jax.eval_shape(
            lambda: model.init(jax.random.PRNGKey(0), x))
        feats = jax.eval_shape(
            lambda v: model.apply(v, x), variables)
        assert [f.shape[-1] for f in feats] == [64, 128, 320, 512]


def test_mit_b5_param_count():
    model = MixVisionTransformer(MIT_VARIANTS["mit_b5"])
    variables = jax.eval_shape(
        lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3))))
    import numpy as np

    n = sum(np.prod(p.shape) for p in jax.tree.leaves(variables))
    # published mit_b5 encoder is ~81.4M params
    assert 78e6 < n < 85e6, n


def test_stretch_config_loads_and_traces():
    cfg = load_yaml("configs/stretch_1080p.yaml")
    assert cfg.backbone == "mit_b5"
    model = JointPipeline(cfg.backbone, cfg.data.num_classes,
                          dtype=jnp.bfloat16)
    ir = jnp.zeros((1, 1080, 1920, 1))
    vis = jnp.zeros((1, 1080, 1920, 3))
    variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), ir, vis))
    out = jax.eval_shape(lambda v: model.apply(v, ir, vis), variables)
    fused_rgb, fused_y, logits = out
    assert fused_rgb.shape == (1, 1080, 1920, 3)
    assert logits.shape == (1, 270, 480, cfg.data.num_classes)
