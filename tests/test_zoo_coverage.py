"""Every module-zoo block builds through the YAML interpreter and runs.

The two shipped net YAMLs only exercise Conv/MP/SP/Concat/Upsample/
SPPCSPC/RepConv/Detect; this sweeps the long tail of nets/common.py
(SURVEY §2.1 "module zoo") through tiny single-block networks.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from yolo_continuous_tpu.nn.builder import YoloModel, build_model_spec

ANCHORS = [[12, 16, 19, 36, 40, 28], [36, 75, 76, 55, 72, 146],
           [142, 110, 192, 243, 459, 401]]

# rows: (module, args) placed between a stem conv and a 3-level head
SINGLE_INPUT_BLOCKS = [
    ("Conv", [16, 3, 1]),
    ("Conv", [16, 3, 1, None, 1, "nn.LeakyReLU(0.1)"]),
    ("nn.Conv2d", [16, 3, 1]),
    ("dw_conv", [16, 3, 1]),
    ("GhostConv", [16, 3, 1]),
    ("RobustConv", [16, 7, 1]),
    ("RobustConv2", [16, 7, 2]),
    ("RepConv", [16, 3, 1]),
    ("DownC", [16]),
    ("SPP", [16]),
    ("SPPF", [16]),
    ("SPPCSPC", [16]),
    ("GhostSPPCSPC", [16]),
    ("Focus", [16, 3]),
    ("Stem", [16]),
    ("GhostStem", [16]),
    ("Bottleneck", [16]),
    ("BottleneckCSPA", [16]),
    ("BottleneckCSPB", [16]),
    ("BottleneckCSPC", [16]),
    ("RepBottleneck", [16]),
    ("RepBottleneckCSPA", [16]),
    ("RepBottleneckCSPB", [16]),
    ("RepBottleneckCSPC", [16]),
    ("Res", [16]),
    ("ResCSPA", [16]),
    ("ResCSPB", [16]),
    ("ResCSPC", [16]),
    ("RepRes", [16]),
    ("RepResCSPA", [16]),
    ("RepResCSPB", [16]),
    ("RepResCSPC", [16]),
    ("ResX", [64, True, 8]),
    ("ResXCSPA", [64, True, 8]),
    ("ResXCSPB", [64, True, 8]),
    ("ResXCSPC", [64, True, 8]),
    ("RepResX", [64, True, 8]),
    ("RepResXCSPA", [64, True, 8]),
    ("RepResXCSPB", [64, True, 8]),
    ("RepResXCSPC", [64, True, 8]),
    ("Ghost", [16]),
    ("GhostCSPA", [16]),
    ("GhostCSPB", [16]),
    ("GhostCSPC", [16]),
    ("MP", []),
    ("SP", [3]),
    ("ReOrg", []),
    ("Foldcut", []),
    ("Contract", [2]),
    ("Expand", [2]),
    ("nn.BatchNorm2d", []),
]


def _build_and_run(rows, nc=2, size=64):
    cfg = {"depth_multiple": 1.0, "width_multiple": 1.0,
           "backbone": rows,
           "head": [
               [-1, 1, "Conv", [16, 3, 2]],
               [-1, 1, "Conv", [32, 3, 2]],
               [[-3, -2, -1], 1, "Detect", ["nc", "anchors"]],
           ]}
    spec = build_model_spec(cfg, 3, ANCHORS, nc)
    model = YoloModel(spec=spec)
    x = jnp.zeros((1, size, size, 3), jnp.float32)
    v = model.init(jax.random.PRNGKey(0), x, False)
    outs = model.apply(v, x, False)
    for o in outs:
        assert np.isfinite(np.asarray(o)).all()
    return outs


@pytest.mark.parametrize("name,args", SINGLE_INPUT_BLOCKS,
                         ids=[f"{n}-{i}" for i, (n, _) in
                              enumerate(SINGLE_INPUT_BLOCKS)])
def test_block_through_builder(name, args):
    rows = [
        [-1, 1, "Conv", [16, 3, 2]],     # 0: /2, 16ch
        [-1, 1, name, list(args)],       # 1: the block under test
        [-1, 1, "Conv", [16, 3, 2]],     # 2: /4
    ]
    _build_and_run(rows)


def test_multi_input_blocks():
    rows = [
        [-1, 1, "Conv", [16, 3, 2]],        # 0
        [-1, 1, "Conv", [16, 3, 1]],        # 1
        [[-1, -2], 1, "Concat", [1]],       # 2: 32ch
        [[-1, -2], 1, "Chuncat", [1]],      # 3: 48ch? -> chunks of 32+16
        [-1, 1, "Conv", [16, 1, 1]],        # 4
        [[-1, 1], 1, "Shortcut", [0]],      # 5: 16ch
    ]
    _build_and_run(rows)


def test_repeat_blocks():
    rows = [
        [-1, 1, "Conv", [16, 3, 2]],
        [-1, 2, "Bottleneck", [16]],        # n=2 sequential repeats
        [-1, 2, "BottleneckCSPA", [16]],    # n=2 inserted into CSP
    ]
    _build_and_run(rows)
