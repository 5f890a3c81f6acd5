"""Hard-coded model family parity (nets/backbone.py, yolo_net.py, layout.py)."""
import numpy as np

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.nn.yolo_body import Backbone, LayoutBody, YoloBody


def _params(model, shape):
    shapes = jax.eval_shape(lambda k, x: model.init(k, x, False),
                            jax.random.PRNGKey(0), jnp.zeros(shape, jnp.float32))
    return sum(int(np.prod(x.shape)) for x in jax.tree.leaves(shapes["params"]))


def test_yolobody_param_parity():
    # torch reference YoloBody(phi, nc=20): l=37,297,025; x=70,940,649
    assert _params(YoloBody(num_classes=20, phi="l"), (1, 64, 64, 3)) == 37_297_025
    assert _params(YoloBody(num_classes=20, phi="x"), (1, 64, 64, 3)) == 70_940_649


def test_layout_param_parity():
    # torch reference layout YoloBody('l') with 416 input: 1,855,812
    assert _params(LayoutBody(phi="l"), (1, 416, 416, 3)) == 1_855_812


def test_backbone_feature_shapes():
    m = Backbone(transition_channels=8, block_channels=8, n=4, phi="l")
    x = jnp.zeros((1, 128, 128, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, False)
    f1, f2, f3 = m.apply(v, x, False)
    # strides 8/16/32; channels t*16, t*32, t*32 (backbone.py:100-116)
    assert f1.shape == (1, 16, 16, 128)
    assert f2.shape == (1, 8, 8, 256)
    assert f3.shape == (1, 4, 4, 256)


def test_yolobody_forward_shapes():
    m = YoloBody(num_classes=2, phi="l")
    x = jnp.zeros((1, 64, 64, 3), jnp.float32)
    v = m.init(jax.random.PRNGKey(0), x, False)
    outs = m.apply(v, x, False)
    # P5-first (yolo_net.py:315-327): 2x2, 4x4, 8x8 @64px
    assert [o.shape for o in outs] == [(1, 2, 2, 3, 7), (1, 4, 4, 3, 7),
                                       (1, 8, 8, 3, 7)]
