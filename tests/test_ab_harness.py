"""Unit tests for the A/B report harness (scripts/northstar_ab.py).

The harness turned out to be as correctness-critical as the framework:
round 4's verdict called out a PASS computed over degenerate budgets,
and round 5 found a grouping bug where shared-init fine-tune pairs on
DIFFERENT datasets shared one report group (so an unpaired 0.036 arm
would have polluted the 0.44-mAP discriminating pair's seed-mean).
These tests pin the tagging/grouping semantics without touching a
backend.
"""
import importlib.util
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def ab():
    spec = importlib.util.spec_from_file_location(
        "northstar_ab", os.path.join(REPO, "scripts", "northstar_ab.py"))
    mod = importlib.util.module_from_spec(spec)
    sys.modules["northstar_ab"] = mod
    spec.loader.exec_module(mod)
    return mod


EZ_LABELS = ["rect", "ellipse", "triangle", "ring", "cross", "diamond"]
VOC_LABELS = [f"c{i}" for i in range(20)]


def test_finetune_tag_carries_dataset(ab):
    ez = ab._recipe_tag({"init_weights_from": "/x/donor.msgpack",
                         "labels": EZ_LABELS})
    voc = ab._recipe_tag({"init_weights_from": "/x/donor.msgpack",
                          "labels": VOC_LABELS})
    assert ez != voc, "fine-tune pairs on different sets must not group"
    assert "fine-tune" in ez and "fine-tune" in voc
    assert "easy" in ez and "voc" in voc


def test_resume_counts_as_shared_init(ab):
    # the torch arm enters the donor weights via resume=True
    tag = ab._recipe_tag({"resume": True, "labels": EZ_LABELS})
    assert tag == ab._recipe_tag({"init_weights_from": "d.msgpack",
                                  "labels": EZ_LABELS})


def test_from_scratch_tags(ab):
    assert ab._recipe_tag({"labels": VOC_LABELS, "mosaic": True}) \
        == "voc recipe"
    assert ab._recipe_tag({"labels": VOC_LABELS, "mosaic": False}) \
        == "voc recipe, mosaic off"
    assert ab._recipe_tag({"labels": EZ_LABELS, "mosaic": False}) \
        == "6-class easy set, mosaic off"


def test_stop_after_epoch_annotates_budget(ab):
    tag = ab._recipe_tag({"labels": VOC_LABELS, "mosaic": False,
                          "stop_after_epoch": 9})
    assert tag.endswith("stopped at epoch 9")


def test_stats_mean_and_spread(ab):
    m, sp = ab._stats([0.40, 0.50])
    assert m == pytest.approx(0.45) and sp == pytest.approx(0.10)
    m, sp = ab._stats([0.4412])
    assert m == pytest.approx(0.4412) and sp == 0.0
